"""Targeted micro-probes for the column-CML pipeline and epilogue passes.

Answers two round-3 questions the stage profilers can't:
  * where the column conv1's ms go (compaction / tap matmul / Pallas
    merge / normalize), stage by stage;
  * what a standardize epilogue pass and a d-minor->(C,D) relayout cost
    at CML shapes — the upper bound a norm-folding rewrite could win.

Shapes are the KITTI flagship defaults (batch 8, bf16).
"""
import time

from mvxnet_makise_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.pipeline import collate, preprocess_frame
from mvxnet_makise_tpu.data.synthetic import synthetic_frame
from mvxnet_makise_tpu.models.voxelnet import standardize
from mvxnet_makise_tpu.ops.column_conv import (column_taps_matmul_folded,
                                               compact_columns)
from mvxnet_makise_tpu.ops.pallas_column_merge import (column_bounds,
                                                       merge_taps_fused)
from mvxnet_makise_tpu.ops.voxelize import voxelize
from mvxnet_makise_tpu.train.step import frames_to_batch

B = 8
cfg = Config(use_bf16=True, batch_size=B)
GRID = tuple(cfg.voxel_shape)
nx, ny, nz = GRID
V = cfg.max_voxels
rng = np.random.default_rng(0)
frames = [preprocess_frame(*synthetic_frame(rng, cfg), cfg)
          for _ in range(B)]
fb = collate(frames)
batch = frames_to_batch(jnp.asarray(fb.points), jnp.asarray(fb.num_points),
                        jnp.asarray(fb.image), jnp.asarray(fb.gt_boxes),
                        jnp.asarray(fb.gt_mask), cfg)
coords, vmask = batch.coords, batch.vmask
vfeat = jnp.asarray(
    rng.standard_normal((B, V, 128)), jnp.bfloat16) * vmask[..., None]


def _sync(out):
    """Real execution barrier: block_until_ready is not reliable on
    relayed/remote backends (see bench.py), so read a reduced scalar."""
    leaf = jax.tree.leaves(out)[0]
    corner = leaf[(slice(0, 1),) * leaf.ndim]
    return float(jnp.sum(corner.astype(jnp.float32)))


def timeit(name, fn, *args):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    N = 10
    for _ in range(N):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / N
    print(f"{name:44s} {dt*1e3:8.2f} ms/batch", flush=True)
    return out


# --- conv1 sub-stages ------------------------------------------------
kernel = jnp.asarray(rng.standard_normal((3, 3, 3, 128, 64)) * 0.05,
                     jnp.bfloat16)
bias = jnp.zeros((64,), jnp.bfloat16)
d_out = (nz + 2 - 3) // 2 + 1

cols, col_xy, col_mask = timeit(
    "compact_columns", lambda f, c, m: jax.vmap(
        lambda f, c, m: compact_columns(f, c, m, GRID, assume_sorted=True)
    )(f, c, m), vfeat, coords, vmask)

y9 = timeit(
    "taps matmul (folded)", lambda co: jax.vmap(
        lambda co: column_taps_matmul_folded(co, kernel))(co), cols)

cy = col_xy[..., 1]
bounds = jax.jit(jax.vmap(
    lambda xy, m: column_bounds(xy, m, nx)))(col_xy, col_mask)
bounds = jax.block_until_ready(bounds)
bias_packed = jnp.tile(bias, d_out).astype(jnp.float32)


def merge(y, cy_, bo_):
    out, stats = merge_taps_fused(
        y.reshape(B, V, 9, d_out * 64), cy_, bo_, bias_packed,
        GRID, "pallas")
    return out, stats


out, _ = timeit("pallas merge (+bias/relu/stats)", merge, y9, cy, bounds)

# --- epilogue passes --------------------------------------------------
x = out.reshape(B, nx, ny, d_out * 64)
timeit("standardize (batch scope) 320ch", lambda a: standardize(a), x)
timeit("standardize (sample scope) 320ch",
       lambda a: jax.vmap(standardize)(a), x)
x5 = x.reshape(B, nx, ny, d_out, 64)
timeit("(C,D)-fold relayout (transpose+reshape)",
       lambda a: jnp.transpose(a, (0, 1, 2, 4, 3))
       .reshape(B, nx, ny, -1), x5)

# --- voxelize --------------------------------------------------------
pts = jnp.asarray(fb.points)
npts = jnp.asarray(fb.num_points)
timeit("voxelize (pm, batch 8)", lambda p, n: jax.vmap(
    lambda p, n: voxelize(
        p, n, velo_range=cfg.velo_range, voxel_size=cfg.voxel_size,
        grid_shape=cfg.voxel_shape, max_voxels=cfg.max_voxels,
        samples_per_voxel=cfg.samples_per_voxel,
        slot_features=False))(p, n), pts, npts)
