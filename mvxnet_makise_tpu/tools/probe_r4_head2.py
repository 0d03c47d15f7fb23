"""Round-4 gather-stage formulation shootout (follow-up to probe_r4_head).

probe_r4_head split the ~30 ms in-model "gather" stage into patch-table
build 10.4 / vmapped row-gather 23.0 (flat-batched 13.4) / bilerp+where+
concat 8.4 ms.  This probe races complete gather-stage formulations
(pyramid -> (B, P, 768) fused features, identical outputs):

  vmapped_patch    current default (vmap over batch, patch tables)
  flat_patch       patch tables flattened to one (B*H*W, 4C) table,
                   indices offset by b*H*W
  unroll_patch     python-unrolled per-image gathers (small tables stay
                   in the ~10 ns/row regime)
  unroll_raw4      per-image, NO patch table: 4 tap gathers from the
                   raw (H*W, C) map (zero build cost, 4x rows, 512B)
  flat_raw4        flat-batched 4-tap raw gathers

Each formulation is timed end-to-end (build + gather + bilerp + mask),
plus equivalence-checked against the current default.
Run: python -m mvxnet_makise_tpu.tools.probe_r4_head2
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
from mvxnet_makise_tpu.models.image_head import detection_transform
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

hp = cast_for_compute({"params": params["params"]["head"]}, True)
rp = {"params": hp["params"]["extractor"]}

im_h, im_w = cfg.image_size
eps = 1e-6
P = rc.shape[1]


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
    return f


pyramid = jax.jit(lambda im: ResNet50FPN().apply(
    rp, jax.vmap(detection_transform)(im)))(bimg)
pyramid = jax.block_until_ready(pyramid)
shapes = [f.shape[1:3] for f in pyramid]


def cells_for(feat_hw, rcf, dtype):
    Hf, Wf = feat_hw
    r = jnp.clip(rcf[..., 0] / (im_h / Hf) - eps, 0.0, Hf - 1.0)
    c = jnp.clip(rcf[..., 1] / (im_w / Wf) - eps, 0.0, Wf - 1.0)
    r0 = jnp.floor(r).astype(jnp.int32)
    c0 = jnp.floor(c).astype(jnp.int32)
    return r0, c0, (r - r0).astype(dtype)[..., None], \
        (c - c0).astype(dtype)[..., None]


def bilerp(f00, f10, f01, f11, fr, fc):
    return (f00 * (1 - fr) * (1 - fc) + f10 * fr * (1 - fc)
            + f01 * (1 - fr) * fc + f11 * fr * fc)


def split4(rows, C):
    return (rows[..., :C], rows[..., C:2 * C],
            rows[..., 2 * C:3 * C], rows[..., 3 * C:])


# --- formulation 1: current default (vmapped patch) --------------------
def vmapped_patch(pyr, rcf, ok):
    return jax.vmap(
        lambda feats, rr, okk: bilinear_gather_fpn(
            feats, rr, okk, cfg.image_size))(pyr, rcf, ok)


# --- formulation 2: flat-batched patch tables ---------------------------
def flat_patch(pyr, rcf, ok):
    outs = []
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]
    for li, f in enumerate(pyr):
        Hf, Wf = shapes[li]
        C = f.shape[-1]
        tab = jax.vmap(_patch_table)(f).reshape(B * Hf * Wf, 4 * C)
        r0, c0, fr, fc = cells_for((Hf, Wf), rcf, f.dtype)
        idx = (r0 * Wf + c0 + boff * (Hf * Wf)).reshape(-1)
        rows = tab[idx].reshape(B, P, 4 * C)
        outs.append(bilerp(*split4(rows, C), fr, fc))
    g = jnp.concatenate(outs, axis=-1)
    return jnp.where(ok[..., None], g, 0)


# --- formulation 3: unrolled per-image patch gathers --------------------
def unroll_patch(pyr, rcf, ok):
    outs = []
    for li, f in enumerate(pyr):
        Hf, Wf = shapes[li]
        C = f.shape[-1]
        tab = jax.vmap(_patch_table)(f).reshape(B, Hf * Wf, 4 * C)
        r0, c0, fr, fc = cells_for((Hf, Wf), rcf, f.dtype)
        idx = r0 * Wf + c0
        rows = jnp.stack([tab[b][idx[b]] for b in range(B)])
        outs.append(bilerp(*split4(rows, C), fr, fc))
    g = jnp.concatenate(outs, axis=-1)
    return jnp.where(ok[..., None], g, 0)


# --- formulation 4: unrolled per-image raw 4-tap gathers ----------------
def unroll_raw4(pyr, rcf, ok):
    outs = []
    for li, f in enumerate(pyr):
        Hf, Wf = shapes[li]
        C = f.shape[-1]
        tab = f.reshape(B, Hf * Wf, C)
        r0, c0, fr, fc = cells_for((Hf, Wf), rcf, f.dtype)
        r1 = jnp.minimum(r0 + 1, Hf - 1)
        c1 = jnp.minimum(c0 + 1, Wf - 1)
        i00 = r0 * Wf + c0
        i10 = r1 * Wf + c0
        i01 = r0 * Wf + c1
        i11 = r1 * Wf + c1
        taps = []
        for idx in (i00, i10, i01, i11):
            taps.append(jnp.stack([tab[b][idx[b]] for b in range(B)]))
        outs.append(bilerp(*taps, fr, fc))
    g = jnp.concatenate(outs, axis=-1)
    return jnp.where(ok[..., None], g, 0)


# --- formulation 5: flat-batched raw 4-tap gathers ----------------------
def flat_raw4(pyr, rcf, ok):
    outs = []
    boff = jnp.arange(B, dtype=jnp.int32)[:, None]
    for li, f in enumerate(pyr):
        Hf, Wf = shapes[li]
        C = f.shape[-1]
        tab = f.reshape(B * Hf * Wf, C)
        r0, c0, fr, fc = cells_for((Hf, Wf), rcf, f.dtype)
        r1 = jnp.minimum(r0 + 1, Hf - 1)
        c1 = jnp.minimum(c0 + 1, Wf - 1)
        base = boff * (Hf * Wf)
        taps = [tab[(r * Wf + c + base).reshape(-1)].reshape(B, P, C)
                for r, c in ((r0, c0), (r1, c0), (r0, c1), (r1, c1))]
        outs.append(bilerp(*taps, fr, fc))
    g = jnp.concatenate(outs, axis=-1)
    return jnp.where(ok[..., None], g, 0)


ref = jax.jit(vmapped_patch)(tuple(pyramid), rc, kept)
ref = jax.block_until_ready(ref)

for name, fn in [("vmapped_patch (default)", vmapped_patch),
                 ("flat_patch", flat_patch),
                 ("unroll_patch", unroll_patch),
                 ("unroll_raw4", unroll_raw4),
                 ("flat_raw4", flat_raw4)]:
    f = timeit(name, fn, tuple(pyramid), rc, kept)
    out = f(tuple(pyramid), rc, kept)
    err = float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32))))
    print(f"  max|diff| vs default: {err:.3e}", flush=True)
