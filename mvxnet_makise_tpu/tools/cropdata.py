"""Offline frustum-crop tool: velodyne -> velodyne_croped.

Counterpart of /root/reference/cropdata.py (SURVEY.md §2 C14): for every
KITTI frame, range-crop then camera-frustum-crop the raw scan and write
the result, so online epochs skip the work.

Modes (the reference offers numpy | torch | torch-cuda; ours):
  native : fused C++ crop (data/native.py) — fastest host path
  numpy  : pure-numpy oracle implementation
  jax    : batched mask-based crop on the accelerator

Boundary semantics are identical across modes (half-open range bounds,
``imsize - 1e-3`` frustum epsilon — reference Preprocessing.py:34-43).

Usage: python -m mvxnet_makise_tpu.tools.cropdata <dataroot> [mode] [workers]
       [--config PATH]
"""

from __future__ import annotations

import concurrent.futures as cf
import os
import sys
import time

import numpy as np

from mvxnet_makise_tpu.config import Config, load_config
from mvxnet_makise_tpu.data import native
from mvxnet_makise_tpu.data.kitti import KittiPaths
from mvxnet_makise_tpu.geometry.calib import read_calib


def crop_frame(points: np.ndarray, calib, cfg: Config,
               mode: str) -> np.ndarray:
    """Returns the cropped (K, 4) cloud (without projection columns)."""
    if mode == "native":
        out = native.crop_project(points, calib, cfg.velo_range,
                                  cfg.image_size)
        return out[:, :4]
    if mode == "numpy":
        out = native.crop_project_numpy(points, calib, cfg.velo_range,
                                        cfg.image_size)
        return out[:, :4]
    if mode == "jax":
        import jax.numpy as jnp

        from mvxnet_makise_tpu.ops.voxelize import (
            crop_to_range_mask, frustum_mask)

        pts = jnp.asarray(points)
        rect = jnp.asarray(calib.R0 @ calib.velo_to_cam)
        proj = jnp.asarray(calib.P2) @ rect
        m = crop_to_range_mask(pts, cfg.velo_range) & frustum_mask(
            pts, proj, rect, cfg.image_size)
        return np.asarray(pts[m])[:, :4]
    raise ValueError(f"unknown mode {mode!r}")


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    config_path = None
    if "--config" in argv:
        i = argv.index("--config")
        config_path = argv[i + 1]
        del argv[i:i + 2]
    if not argv:
        print(__doc__)
        return 1
    root = argv[0]
    mode = argv[1] if len(argv) > 1 and argv[1] != "-" else "native"
    workers = int(argv[2]) if len(argv) > 2 else (os.cpu_count() or 4)
    cfg = load_config(config_path, data_root=root)
    paths = KittiPaths.from_root(root)
    os.makedirs(paths.velodyne_cropped, exist_ok=True)

    ids = sorted(os.path.splitext(f)[0]
                 for f in os.listdir(paths.velodyne) if f.endswith(".bin"))
    t0 = time.perf_counter()
    done = 0

    def one(fid):
        pts = np.fromfile(os.path.join(paths.velodyne, fid + ".bin"),
                          dtype=np.float32).reshape(-1, 4)
        calib = read_calib(os.path.join(paths.calib, fid + ".txt"))
        out = crop_frame(pts, calib, cfg, mode)
        out.astype(np.float32).tofile(
            os.path.join(paths.velodyne_cropped, fid + ".bin"))

    # the jax mode must stay single-threaded (device contention); the
    # native/numpy modes release the GIL in I/O and C++ and scale well
    pool_workers = 1 if mode == "jax" else max(workers, 1)
    with cf.ThreadPoolExecutor(max_workers=pool_workers) as pool:
        for _ in pool.map(one, ids):
            done += 1
            if done % 500 == 0 or done == len(ids):
                dt = time.perf_counter() - t0
                print(f"\r{done}/{len(ids)} ({done / dt:.1f} frames/s)",
                      end="", flush=True)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
