"""Sub-stage timing of the LiDAR branch (VoxelNetBranchPM) in-model.

Companion to tools/bench_kernels.py (kernel microbenches) and
tools/profile_components.py (whole-model stages): this one isolates the
branch sub-stages per cml_mode so CML backend decisions stay measured.

Times (on the real chip, bf16, batch 8, flagship shapes):
  svfe        = SVFE + fcn + segment-max -> vfeat (B, V, 128)
  +scatter    = svfe + dense scatter (dense3d path only)
  +conv1      = svfe + CML first layer (per mode)
  +cml        = svfe + full CML
  full        = whole branch (adds RPN)
for cml_mode in {dense3d, column}.
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
model, state = build_model_and_state(cfg, with_images=False)
params = state.params

print("model built", flush=True)
batch = frames_to_batch(jnp.asarray(fb.points), jnp.asarray(fb.num_points),
                        jnp.asarray(fb.image), jnp.asarray(fb.gt_boxes),
                        jnp.asarray(fb.gt_mask), cfg)
batch = cast_batch_for_compute(batch, True)

from mvxnet_makise_tpu.models.voxelnet_pm import (
    PointSVFE, VoxelNetBranchPM, point_lidar_features, _segment_max, _NEG)
from mvxnet_makise_tpu.models.blocks import DenseReluNormVirtualWeighted
from mvxnet_makise_tpu.models.voxelnet import (
    MiddleConvLayers, MiddleConvLayersColumn, ColumnConv1ReluNorm,
    ConvReluNorm, _scatter, standardize)

pf7 = jax.vmap(point_lidar_features)(
    batch.sorted_points, batch.sorted_seg, batch.sorted_kept, batch.counts)
x23 = pf7.astype(jnp.bfloat16)          # lidar-only: 7 channels
z0 = jnp.zeros((B, cfg.max_voxels, 7), jnp.bfloat16)
vbp = cast_for_compute(params, True)   # lidar-only model IS the branch
cml_params = {"params": vbp["params"]["cml"]}
GRID = tuple(cfg.voxel_shape)
V = cfg.max_voxels
T = cfg.samples_per_voxel


import flax.linen as nn


class SVFEOnly(VoxelNetBranchPM):
    @nn.compact
    def __call__(self, points, kept, seg, counts, coords, vmask, z0=None):
        B_, P, Cin = points.shape
        nv = jnp.clip(T - counts, 0, T).astype(points.dtype) * vmask
        z = z0 if z0 is not None else jnp.zeros((B_, V, Cin), points.dtype)
        x, z = PointSVFE(self.eps, name="svfe")(points, kept, seg, z, nv,
                                                vmask, V)
        h, hz = DenseReluNormVirtualWeighted(128, self.eps, name="fcn")(
            x, kept, z, nv, vmask)
        segmax = jax.vmap(lambda v, s, k: _segment_max(v, s, k, V))(
            h, seg, kept)
        vfeat = jnp.where((nv > 0)[..., None], jnp.maximum(segmax, hz),
                          segmax)
        return jnp.where(vmask[..., None] & (vfeat > _NEG / 2), vfeat, 0.0)


svfe = SVFEOnly(grid_shape=GRID, samples_per_voxel=T)


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


args8 = (x23, batch.sorted_kept, batch.sorted_seg, batch.counts,
         batch.coords, batch.vmask, z0)

timeit("svfe->vfeat", lambda *a: svfe.apply(vbp, *a), *args8)

vfeat = jax.jit(lambda *a: svfe.apply(vbp, *a))(*args8)
vfeat = jax.block_until_ready(vfeat)
coords, vmask = batch.coords, batch.vmask

timeit("scatter only", lambda f, c, m: jax.vmap(
    lambda f, c, m: _scatter(f, c, m, GRID, "auto"))(f, c, m),
       vfeat, coords, vmask)

dense = jax.jit(lambda f, c, m: jax.vmap(
    lambda f, c, m: _scatter(f, c, m, GRID, "auto"))(f, c, m))(
    vfeat, coords, vmask)
dense = jax.block_until_ready(dense)

crn = ConvReluNorm(64, (3, 3, 3), (2, 1, 1), ((1, 1), (1, 1), (1, 1)),
                   1e-6, xavier=True, name="conv1")
c1p = {"params": cml_params["params"]["conv1"]}
timeit("dense conv1(+relu+norm) only", lambda d: crn.apply(c1p, d), dense)

for form in ("im2col", "folded"):
    col1 = ColumnConv1ReluNorm(64, 128, GRID, 1e-6, taps_form=form,
                               name="conv1")
    timeit(f"column conv1(+relu+norm) only [{form}]",
           lambda v, c, m, c1=col1: c1.apply(c1p, v, c, m),
           vfeat, coords, vmask)

cml_d = MiddleConvLayers(name="cml")
timeit("full cml dense (from dense grid)",
       lambda d: cml_d.apply(cml_params, d), dense)

# conv2/conv3 in the d-minor layout the column path uses, isolated
from mvxnet_makise_tpu.models.voxelnet import RPN, ConvReluNormDLast

col1 = ColumnConv1ReluNorm(64, 128, GRID, 1e-6, d_last=True, name="conv1")
x1 = jax.jit(lambda v, c, m: col1.apply(c1p, v, c, m))(
    vfeat, coords, vmask)
x1 = jax.block_until_ready(x1)   # (B, H, W, 5, 64)

c2 = ConvReluNormDLast(64, (1, 1, 1), ((0, 0), (1, 1), (1, 1)),
                       name="conv2")
c2p = {"params": cml_params["params"]["conv2"]}
timeit("conv2 d-minor only", lambda a: c2.apply(c2p, a), x1)
x2 = jax.block_until_ready(jax.jit(lambda a: c2.apply(c2p, a))(x1))

c3 = ConvReluNormDLast(64, (2, 1, 1), ((1, 1), (1, 1), (1, 1)),
                       name="conv3")
c3p = {"params": cml_params["params"]["conv3"]}
timeit("conv3 d-minor only", lambda a: c3.apply(c3p, a), x2)
x3 = jax.block_until_ready(jax.jit(lambda a: c3.apply(c3p, a))(x2))

rpn = RPN(name="rpn")
rpnp = {"params": vbp["params"]["rpn"]}
xr = jnp.transpose(x3, (0, 1, 2, 4, 3)).reshape(
    x3.shape[0], x3.shape[1], x3.shape[2], -1)
xr = jax.block_until_ready(xr)
timeit("rpn only", lambda a: rpn.apply(rpnp, a)[0], xr)

cml_c = MiddleConvLayersColumn(1e-6, GRID, name="cml")
timeit("full cml column (from vfeat)",
       lambda v, c, m: cml_c.apply(cml_params, v, c, m),
       vfeat, coords, vmask)

vb_d = VoxelNetBranchPM(grid_shape=GRID, samples_per_voxel=T,
                        cml_mode="dense3d")
timeit("full branch dense3d", lambda *a: vb_d.apply(vbp, *a)[0], *args8)

vb_c = VoxelNetBranchPM(grid_shape=GRID, samples_per_voxel=T,
                        cml_mode="column")
timeit("full branch column", lambda *a: vb_c.apply(vbp, *a)[0], *args8)
