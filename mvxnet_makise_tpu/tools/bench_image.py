"""Sub-stage timing of the image branch (PointImageHead) in-model.

Companion to tools/bench_branch.py (LiDAR branch sub-stages): isolates
  transform      torchvision-semantics resize/normalize/pad
  resnet_fpn     transform + frozen ResNet50-FPN pyramid
  gather_xla     per-level patch-row gather (pyramid precomputed)
  gather_fused   coarse levels merged into one wide-row gather
  fusion_mlp     768->16 virtual-row fusion MLP (gathered precomputed)
  head_xla       whole head, gather_backend="xla"
  head_fused     whole head, gather_backend="xla_fused"
so the FPN-gather backend decision stays measured (reference hot spot:
/root/reference/modules/imhead/Pipe.py:61-76).
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
                                                 PointImageHead,
                                                 detection_transform)
from mvxnet_makise_tpu.models.resnet_fpn import ResNet50FPN
from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn
from mvxnet_makise_tpu.train.loop import build_model_and_state
from mvxnet_makise_tpu.train.state import cast_for_compute
from mvxnet_makise_tpu.train.step import (cast_batch_for_compute,
                                          frames_to_batch)

B = 8
cfg = Config(use_bf16=True, batch_size=B)
rng = np.random.default_rng(0)
frames = [preprocess_frame(*synthetic_frame(rng, cfg), cfg)
          for _ in range(B)]
fb = collate(frames)

print("building model...", flush=True)
model, state = build_model_and_state(cfg, with_images=True)
params = state.params
del state, model
print("model built", flush=True)

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


def _sync(out):
    """Real execution barrier: block_until_ready is not reliable on
    relayed/remote backends (see bench.py), so read a reduced scalar."""
    import jax as _jax
    leaf = _jax.tree.leaves(out)[0]
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
    print(f"{name:40s} {dt*1e3:8.2f} ms/batch", flush=True)


timeit("transform", lambda im: jax.vmap(detection_transform)(im), bimg)

timeit("resnet_fpn (incl transform)",
       lambda im: ResNet50FPN().apply(
           rp, jax.vmap(detection_transform)(im)), bimg)

pyramid = jax.jit(lambda im: ResNet50FPN().apply(
    rp, jax.vmap(detection_transform)(im)))(bimg)
pyramid = jax.block_until_ready(pyramid)

for mode, fused in (("gather_xla", False), ("gather_fused", True)):
    timeit(mode, lambda pyr, r, k, fu=fused: jax.vmap(
        lambda feats, rr, ok: bilinear_gather_fpn(
            feats, rr, ok, cfg.image_size, fused_coarse=fu)
    )(pyr, r, k), pyramid, rc, kept)

gathered = jax.jit(lambda pyr, r, k: jax.vmap(
    lambda feats, rr, ok: bilinear_gather_fpn(
        feats, rr, ok, cfg.image_size))(pyr, r, k))(pyramid, rc, kept)
gathered = jax.block_until_ready(gathered)

timeit("fusion_mlp",
       lambda g, k, n: PointImageFusion().apply(fp, g, k, n),
       gathered, kept, nv)

for mode in ("raw4", "xla", "xla_fused"):
    head = PointImageHead(cfg.image_size, gather_backend=mode)
    timeit(f"head_{mode}",
           lambda im, r, k, n, h=head: h.apply(hp, im, r, k, n)[0],
           bimg, rc, kept, nv)
