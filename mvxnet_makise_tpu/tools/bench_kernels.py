"""Kernel micro-benchmarks on the attached accelerator.

Compares backend choices for the hot data-movement ops so the defaults
can be picked from measurement, not guesswork:

  * dense-grid build: XLA scatter (ops/scatter.py) vs the Pallas
    index-mapped row-writer (ops/pallas_scatter.py)
  * voxelization: the full sort-based pipeline
  * FPN bilinear gather

Usage: python -m mvxnet_makise_tpu.tools.bench_kernels [--iters N]
Prints one JSON line per benchmark.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def _sync(x):
    import jax.numpy as jnp

    return float(jnp.sum(x).astype(jnp.float32))


def timeit(fn, iters: int, warmup: int = 3):
    for _ in range(warmup):
        _sync(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mvxnet_makise_tpu.config import Config
    from mvxnet_makise_tpu.ops.pallas_scatter import pallas_scatter_to_grid
    from mvxnet_makise_tpu.ops.scatter import scatter_voxels_to_grid
    from mvxnet_makise_tpu.ops.voxelize import voxelize

    cfg = Config()
    rng = np.random.default_rng(0)
    dtype = jnp.dtype(args.dtype)
    V, C = cfg.max_voxels, 128
    grid = cfg.voxel_shape
    n_cells = grid[0] * grid[1] * grid[2]

    feats = jnp.asarray(rng.normal(size=(V, C)), dtype)
    flat = rng.choice(n_cells, V, replace=False)
    coords = jnp.asarray(np.stack([
        flat // (grid[1] * grid[2]), (flat // grid[2]) % grid[1],
        flat % grid[2]], axis=1).astype(np.int32))
    mask = jnp.asarray(np.arange(V) < int(V * 0.8))

    bytes_grid = n_cells * C * dtype.itemsize

    f_xla = jax.jit(lambda: scatter_voxels_to_grid(feats, coords, mask, grid))
    dt = timeit(f_xla, args.iters)
    print(json.dumps({"kernel": "scatter_xla", "ms": round(dt * 1e3, 3),
                      "GBps": round(bytes_grid / dt / 1e9, 1)}))

    f_pl = jax.jit(lambda: pallas_scatter_to_grid(feats, coords, mask, grid))
    try:
        dt = timeit(f_pl, args.iters)
        print(json.dumps({"kernel": "scatter_pallas",
                          "ms": round(dt * 1e3, 3),
                          "GBps": round(bytes_grid / dt / 1e9, 1)}))
    except Exception as e:  # pallas path may be unsupported on host
        print(json.dumps({"kernel": "scatter_pallas",
                          "error": str(e)[:120]}))

    pts = jnp.asarray(rng.normal(size=(cfg.max_points, 6)), jnp.float32)
    pts = pts.at[:, 0].set(jnp.abs(pts[:, 0]) * 10)
    n = jnp.asarray(cfg.max_points, jnp.int32)
    f_vox = jax.jit(lambda: voxelize(
        pts, n, velo_range=cfg.velo_range, voxel_size=cfg.voxel_size,
        grid_shape=cfg.voxel_shape, max_voxels=cfg.max_voxels,
        samples_per_voxel=cfg.samples_per_voxel).features)
    dt = timeit(f_vox, args.iters)
    print(json.dumps({"kernel": "voxelize", "ms": round(dt * 1e3, 3),
                      "Mpts_per_s": round(cfg.max_points / dt / 1e6, 1)}))

    from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn

    fmaps = [jnp.asarray(rng.normal(size=(104, 336, 256)), dtype),
             jnp.asarray(rng.normal(size=(52, 168, 256)), dtype),
             jnp.asarray(rng.normal(size=(26, 84, 256)), dtype)]
    rc = jnp.asarray(
        rng.uniform(0, 300, (cfg.max_voxels, cfg.samples_per_voxel, 2)),
        jnp.float32)
    valid = jnp.asarray(
        rng.random((cfg.max_voxels, cfg.samples_per_voxel)) < 0.5)
    f_gather = jax.jit(lambda: bilinear_gather_fpn(
        fmaps, rc, valid, cfg.image_size))
    dt = timeit(f_gather, args.iters)
    n_pts = cfg.max_voxels * cfg.samples_per_voxel
    print(json.dumps({"kernel": "fpn_gather", "ms": round(dt * 1e3, 3),
                      "Mpts_per_s": round(n_pts / dt / 1e6, 1)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
