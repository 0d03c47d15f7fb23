"""Round-4 image-head stage split: where do the non-gather ms go?

probe_r4 measured the three FPN patch-row gathers at ~7 ms raw
(pre-built tables, flat indices), yet the in-model gather stage bills
~30 ms (tools/bench_image.py `gather_xla` ~37 ms isolated).  This probe
splits that stage into its physical parts, in-model shapes (batch 8,
vmapped):

  patch_build      _patch_table on all 3 pyramid levels (build + write)
  gather_prebuilt  vmapped row gather from PRE-BUILT patch tables
  bilerp_math      4-tap weights + where + concat from pre-gathered rows
  gather_stage     all of the above fused (== bench_image gather_xla)
  fusion_mlp       768->16 virtual-row MLP from pre-gathered input
  flat_gather      same gather with batch folded into one flat table

Reference hot spot: /root/reference/modules/imhead/Pipe.py:61-76.
Run: python -m mvxnet_makise_tpu.tools.probe_r4_head
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
from mvxnet_makise_tpu.models.image_head import (PointImageFusion,
                                                 detection_transform)
from mvxnet_makise_tpu.models.resnet_fpn import ResNet50FPN
from mvxnet_makise_tpu.ops.gather import _patch_table, bilinear_gather_fpn
from mvxnet_makise_tpu.train.loop import build_model_and_state
from mvxnet_makise_tpu.train.state import cast_for_compute
from mvxnet_makise_tpu.train.step import cast_batch_for_compute, frames_to_batch

B = 8
cfg = Config(use_bf16=True, batch_size=B)
rng = np.random.default_rng(0)
frames = [preprocess_frame(*synthetic_frame(rng, cfg), cfg)
          for _ in range(B)]
fb = collate(frames)

model, state = build_model_and_state(cfg, with_images=True)
params = state.params
del state, model

batch = frames_to_batch(jnp.asarray(fb.points), jnp.asarray(fb.num_points),
                        jnp.asarray(fb.image), jnp.asarray(fb.gt_boxes),
                        jnp.asarray(fb.gt_mask), cfg)
batch = cast_batch_for_compute(batch, True)
bimg = jnp.asarray(fb.image).astype(jnp.bfloat16)
kept = batch.sorted_kept
rc = batch.sorted_points[..., 4:6]
nv = jnp.sum(batch.vmask) * cfg.samples_per_voxel - jnp.sum(kept)

hp = cast_for_compute({"params": params["params"]["head"]}, True)
rp = {"params": hp["params"]["extractor"]}
fp = {"params": hp["params"]["fusion"]}

im_h, im_w = cfg.image_size
eps = 1e-6


def _sync(out):
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
    return dt


pyramid = jax.jit(lambda im: ResNet50FPN().apply(
    rp, jax.vmap(detection_transform)(im)))(bimg)
pyramid = jax.block_until_ready(pyramid)
print(f"pyramid shapes: {[f.shape for f in pyramid]}", flush=True)

# --- stage 1: patch-table build alone ---------------------------------
def build_tables(pyr):
    return [jax.vmap(_patch_table)(f) for f in pyr]

timeit("patch_build (3 levels, vmapped)", build_tables, tuple(pyramid))

tables = jax.jit(build_tables)(tuple(pyramid))
tables = jax.block_until_ready(tables)

# --- per-level cell/weight math (host-side spec, device compute) -------
def cells_for(feat_hw, rcf):
    Hf, Wf = feat_hw
    r = jnp.clip(rcf[..., 0] / (im_h / Hf) - eps, 0.0, Hf - 1.0)
    c = jnp.clip(rcf[..., 1] / (im_w / Wf) - eps, 0.0, Wf - 1.0)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    return r0 * Wf + c0, (r - r0).astype(jnp.bfloat16), \
        (c - c0).astype(jnp.bfloat16)


shapes = [f.shape[1:3] for f in pyramid]

# --- stage 2: vmapped gather from prebuilt tables ----------------------
def gather_prebuilt(tabs, rcf):
    outs = []
    for li, t in enumerate(tabs):
        Hf, Wf = shapes[li]
        idx, _, _ = cells_for((Hf, Wf), rcf)
        t2 = t.reshape(B, Hf * Wf, t.shape[-1])
        outs.append(jnp.take_along_axis(
            t2, idx[..., None], axis=1))
    return outs

timeit("gather_prebuilt (vmapped, 3 levels)", gather_prebuilt,
       tuple(tables), rc)

# --- stage 2b: flat single-table gather --------------------------------
def gather_flat(tabs, rcf):
    outs = []
    for li, t in enumerate(tabs):
        Hf, Wf = shapes[li]
        idx, _, _ = cells_for((Hf, Wf), rcf)
        flat = t.reshape(B * Hf * Wf, t.shape[-1])
        fidx = idx + (jnp.arange(B, dtype=jnp.int32) * Hf * Wf)[:, None]
        outs.append(flat[fidx.reshape(-1)].reshape(B, idx.shape[1], -1))
    return outs

timeit("gather_flat (one table/level)", gather_flat, tuple(tables), rc)

rows = jax.jit(gather_prebuilt)(tuple(tables), rc)
rows = jax.block_until_ready(rows)

# --- stage 3: bilerp math from pre-gathered rows ------------------------
def bilerp_math(rws, rcf, ok):
    outs = []
    for li, rw in enumerate(rws):
        Hf, Wf = shapes[li]
        _, fr, fc = cells_for((Hf, Wf), rcf)
        C = rw.shape[-1] // 4
        f00, f10 = rw[..., :C], rw[..., C:2 * C]
        f01, f11 = rw[..., 2 * C:3 * C], rw[..., 3 * C:]
        fr = fr[..., None]
        fc = fc[..., None]
        outs.append(f00 * (1 - fr) * (1 - fc) + f10 * fr * (1 - fc)
                    + f01 * (1 - fr) * fc + f11 * fr * fc)
    g = jnp.concatenate(outs, axis=-1)
    return jnp.where(ok[..., None], g, 0)

timeit("bilerp_math (+where/concat)", bilerp_math, tuple(rows), rc, kept)

# --- stage 4: whole gather stage (bench_image parity check) -------------
def gather_stage(pyr, rcf, ok):
    return jax.vmap(
        lambda feats, rr, okk: bilinear_gather_fpn(
            feats, rr, okk, cfg.image_size))(pyr, rcf, ok)

timeit("gather_stage (= bench_image gather_xla)", gather_stage,
       tuple(pyramid), rc, kept)

gathered = jax.jit(gather_stage)(tuple(pyramid), rc, kept)
gathered = jax.block_until_ready(gathered)

# --- stage 5: fusion MLP -------------------------------------------------
timeit("fusion_mlp", lambda g, k, n: PointImageFusion().apply(
    fp, g, k, n), gathered, kept, nv)

# --- stage 6: gather + fusion fused (what the model actually runs) ------
def gather_fusion(pyr, rcf, ok, n):
    g = gather_stage(pyr, rcf, ok)
    return PointImageFusion().apply(fp, g, ok, n)

timeit("gather+fusion fused", gather_fusion, tuple(pyramid), rc, kept, nv)
