"""Round-4 decision probes: conv2/3 sparsity, FPN-gather dedup physics.

Replaces two unmeasured claims with numbers (VERDICT r3 asks #1/#2):

  1. **BEV column occupancy + dilation** at KITTI-shaped synthetic
     frames: active columns A0, then the footprint after each 3x3 CML
     conv (A1 after conv1, A2 after conv2, A3 after conv3).  This is
     the go/no-go for column-compacting conv2/conv3 — the banded dense
     forms run at a measured ~78 TFLOP/s, so a sparse form must cut
     FLOPs >2x *after* dilation to win.  The sparsity is born at the
     voxelizer (reference cpp/voxelutil.cpp:325-360) and spent dense at
     modules/voxelnet/Pipe.py:31-43.

  2. **Unique FPN tap cells per pyramid level** for real projected
     clouds: the dedup factor (points / unique 2x2 cells).  Dedup
     (VERDICT r2 ask 2b) gathers each unique cell row once and
     redistributes — worthwhile only if (a) the factor is large and
     (b) redistribution is cheaper than the gather it replaces.

  3. **Gather row cost vs source-table row count** (on chip): XLA's TPU
     gather is row-issue-bound at ~19-32 ns/row on large tables
     (DESIGN.md); IF small (VMEM-cacheable) tables gather faster, a
     pure-XLA dedup (small-table redistribute) wins; if the cost is
     flat, dedup dies on arithmetic: it *adds* U row-issues.

  4. **Sort cost for P image-cell keys** — the dedup prologue's price.

Run:  python -m mvxnet_makise_tpu.tools.probe_r4 [--no-chip]
"""

import argparse
import time

from mvxnet_makise_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np
import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.pipeline import collate, preprocess_frame
from mvxnet_makise_tpu.data.synthetic import synthetic_frame
from mvxnet_makise_tpu.models.image_head import transform_output_shape
from mvxnet_makise_tpu.train.step import frames_to_batch

parser = argparse.ArgumentParser()
parser.add_argument("--no-chip", action="store_true",
                    help="skip the on-device gather/sort probes")
parser.add_argument("--frames", type=int, default=8)
args = parser.parse_args()

B = args.frames
cfg = Config(use_bf16=True, batch_size=B)
nx, ny, nz = cfg.voxel_shape
rng = np.random.default_rng(0)
frames = [preprocess_frame(*synthetic_frame(rng, cfg), cfg)
          for _ in range(B)]
fb = collate(frames)
batch = frames_to_batch(jnp.asarray(fb.points), jnp.asarray(fb.num_points),
                        jnp.asarray(fb.image), jnp.asarray(fb.gt_boxes),
                        jnp.asarray(fb.gt_mask), cfg)

# --- probe 1: BEV occupancy + 3x3 dilation ---------------------------
print("== probe 1: BEV column occupancy (KITTI-shaped synthetic) ==")
coords = np.asarray(batch.coords)
vmask = np.asarray(batch.vmask)


def dilate(occ: np.ndarray) -> np.ndarray:
    p = np.pad(occ, 1)
    out = np.zeros_like(occ)
    for dx in range(3):
        for dy in range(3):
            out |= p[dx:dx + nx, dy:dy + ny]
    return out


tot = nx * ny
stats = []
for b in range(B):
    occ = np.zeros((nx, ny), bool)
    c = coords[b][vmask[b]]
    occ[c[:, 0], c[:, 1]] = True
    a0 = occ.sum()
    occ1 = dilate(occ); a1 = occ1.sum()
    occ2 = dilate(occ1); a2 = occ2.sum()
    occ3 = dilate(occ2); a3 = occ3.sum()
    stats.append((vmask[b].sum(), a0, a1, a2, a3))
stats = np.array(stats)
mean = stats.mean(axis=0)
print(f"  voxels/frame          {mean[0]:8.0f}  (cap {cfg.max_voxels})")
for i, name in enumerate(["A0 active cols", "A1 after conv1",
                          "A2 after conv2", "A3 after conv3"]):
    m = mean[i + 1]
    print(f"  {name:20s} {m:8.0f}  = {100 * m / tot:5.1f}% of {tot} "
          f"(max {stats[:, i + 1].max()})")

# --- probe 2: unique FPN tap cells per level --------------------------
print("== probe 2: FPN tap-cell dedup factor ==")
im_h, im_w = cfg.image_size
_, (ph, pw) = transform_output_shape((im_h, im_w))
pts = np.asarray(batch.sorted_points)     # (B, P, 6); ch 4:6 = (row, col)
kept = np.asarray(batch.sorted_kept)
levels = [(ph // s, pw // s) for s in (4, 8, 16)]
print(f"  image {im_h}x{im_w} -> padded {ph}x{pw}; "
      f"levels {levels}; P = {pts.shape[1]}")
for li, (Hf, Wf) in enumerate(levels):
    uniq, npts = [], []
    for b in range(B):
        rc = pts[b][kept[b]][:, 4:6]
        r0 = np.clip(rc[:, 0] / (im_h / Hf) - 1e-6, 0, Hf - 1).astype(int)
        c0 = np.clip(rc[:, 1] / (im_w / Wf) - 1e-6, 0, Wf - 1).astype(int)
        cells = np.unique(r0 * Wf + c0)
        uniq.append(len(cells))
        npts.append(len(rc))
    print(f"  level {li} ({Hf:4d}x{Wf:4d} = {Hf * Wf:6d} cells): "
          f"unique {np.mean(uniq):7.0f} of {np.mean(npts):6.0f} pts "
          f"-> dedup x{np.mean(npts) / np.mean(uniq):4.1f} "
          f"(max uniq {max(uniq)})")

if args.no_chip:
    raise SystemExit(0)

# --- probe 3: gather cost vs source-table rows (on chip) --------------
print(f"== probe 3: gather vs table size (backend={jax.default_backend()}) ==")
P = pts.shape[1]
n_idx = B * P


def timeit(name, fn, *a):
    f = jax.jit(fn)
    out = f(*a)
    out = jax.tree.leaves(out)[0]
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        out = f(*a)
    out = jax.tree.leaves(out)[0]
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / N
    print(f"  {name:52s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


key = jax.random.PRNGKey(0)
for rows in (2184, 8736, 34944, 139776):
    for width in (512, 1024):
        tab = jax.random.normal(key, (rows, width), jnp.bfloat16)
        idx = jax.random.randint(key, (n_idx,), 0, rows, jnp.int32)
        idx_sorted = jnp.sort(idx)
        dt = timeit(f"gather {n_idx} rows from ({rows:6d},{width}) rand",
                    lambda t, i: t[i], tab, idx)
        print(f"    -> {dt / n_idx * 1e9:6.1f} ns/row, "
              f"{n_idx * width * 2 / dt / 1e9:6.1f} GB/s")
        timeit(f"gather {n_idx} rows from ({rows:6d},{width}) sorted",
               lambda t, i: t[i], tab, idx_sorted)

# --- probe 4: dedup-prologue sort cost ---------------------------------
print("== probe 4: dedup prologue (sort P keys + unique scan) ==")
rc = jnp.asarray(pts[..., 4:6], jnp.float32)
Hf, Wf = levels[0]


def dedup_prologue(rc_):
    r0 = jnp.clip(rc_[..., 0] / (im_h / Hf) - 1e-6, 0, Hf - 1).astype(jnp.int32)
    c0 = jnp.clip(rc_[..., 1] / (im_w / Wf) - 1e-6, 0, Wf - 1).astype(jnp.int32)
    cell = r0 * Wf + c0
    order = jnp.argsort(cell, axis=-1)
    s = jnp.take_along_axis(cell, order, axis=-1)
    newc = jnp.concatenate([jnp.ones_like(s[:, :1], bool),
                            s[:, 1:] != s[:, :-1]], axis=1)
    cid = jnp.cumsum(newc, axis=1) - 1
    return order, s, cid


timeit(f"sort+unique-scan {B}x{P} cell keys", dedup_prologue, rc)
