"""VoxelNet LiDAR branch in Flax — SVFE point encoder, dense middle 3D
convs, and the RPN detection head.

Reference: /root/reference/modules/voxelnet/{VoxelNet.py, Pipe.py}
(SURVEY.md §2 C9).  Architecture is reproduced faithfully (channel
widths, strides, the stateless-BN blocks); the *implementation* is
TPU-native:

  * all tensors channels-last; the sparse->dense handoff uses
    :func:`mvxnet_makise_tpu.ops.scatter.scatter_voxels_to_grid`;
  * the voxel axis is static (``max_voxels``) with a validity mask —
    masked statistics in the point-encoder norms keep parity with the
    reference's variable-length lists;
  * batch is a real leading axis (the reference is locked to batch 1,
    MVXNet.py:23); per-sample scatter is vmapped.

Shape walk (per sample, defaults):
  (V, T, C_in) --SVFE--> (V, T, 128) --Dense+max_T--> (V, 128)
  --scatter--> (10, 352, 400, 128) --CML--> (2, 352, 400, 64)
  --fold D into C--> (352, 400, 128) --RPN--> score (176, 200, 2),
  reg (176, 200, 14)
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.models.blocks import (
    ConvReluNorm,
    DeconvReluNorm,
    DenseReluNorm,
    standardize,
)
from mvxnet_makise_tpu.ops.scatter import scatter_voxels_to_grid


class VFE(nn.Module):
    """Voxel feature encoder: pointwise Dense-ReLU-norm, then per-voxel
    max broadcast + concat (reference Pipe.py:5-18)."""
    features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # x: (..., V, T, C); mask: (..., V) voxel validity
        T = x.shape[-2]
        x = DenseReluNorm(self.features, self.eps, name="fcn")(
            x, mask[..., None] & jnp.ones((T,), bool))
        agg = jnp.max(x, axis=-2, keepdims=True)
        agg = jnp.broadcast_to(agg, x.shape)
        return jnp.concatenate([x, agg], axis=-1)


class SVFE(nn.Module):
    """Stacked VFE: C_in -> 16(+16) -> 64(+64) = 128 (Pipe.py:20-29)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        x = VFE(16, self.eps, name="vfe1")(x, mask)
        x = VFE(64, self.eps, name="vfe2")(x, mask)
        return x


class _Conv3DParams(nn.Module):
    """Parameter holder with the (kd, kh, kw, in, out) layout of a Flax
    3D conv — kept separate so the depth-folded compute path below shares
    the exact parameter tree (and reference-checkpoint import) of the
    naive 3D formulation."""
    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (3, 3, 3, self.in_features, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class Conv3DFoldedReluNorm(nn.Module):
    """3D conv (k=3, spatial stride 1/pad 1) computed as ONE 2D conv.

    TPU motivation: XLA maps small-depth 3D convolutions onto the MXU
    poorly (measured ~5x off roofline on v5e for the CML stack).  A 3D
    convolution is exactly a 2D convolution over inputs whose depth taps
    are folded into channels: build (B*D_out, H, W, 3C) by stacking the
    three depth taps, reshape the kernel (3,3,3,I,O) -> (3,3,3I,O), run
    one large NHWC conv.  Identical math, same parameter tree.
    """
    features: int
    stride_d: int
    pad_d: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, D, H, W, C = x.shape
        kernel, bias = _Conv3DParams(self.features, C, name="conv")()
        d_out = (D + 2 * self.pad_d - 3) // self.stride_d + 1
        xp = jnp.pad(x, ((0, 0), (self.pad_d, self.pad_d),
                         (0, 0), (0, 0), (0, 0)))
        starts = jnp.arange(d_out) * self.stride_d
        # (B, d_out, H, W, 3C): depth taps folded into channels (kd-major)
        taps = jnp.concatenate(
            [xp[:, starts + kd] for kd in range(3)], axis=-1)
        k2d = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
            3, 3, 3 * C, self.features)
        y = jax.lax.conv_general_dilated(
            taps.reshape(B * d_out, H, W, 3 * C), k2d,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = y + bias
        y = nn.relu(y.reshape(B, d_out, H, W, self.features))
        return standardize(y, self.eps)


class ConvReluNormDLast(nn.Module):
    """ConvReluNorm for depth-minor (B, H, W, D, C) inputs.

    Same parameter tree, init, and math as
    ``ConvReluNorm(features, (3, 3, 3), strides, padding)`` on a
    (B, D, H, W, C) tensor — kernel stays (kd, kh, kw, I, O) so
    reference checkpoints import 1:1; only the compute layout differs
    (the (3, 3) kernel transpose below is 27*I*O elements, free).

    TPU motivation: the column-compacted conv1 merge kernel emits
    d-minor packed rows ((B, nx, ny, d*C), ops/pallas_column_merge) and
    the RPN fold wants (C, D)-flattened channels — running conv2/conv3
    in the d-minor layout removes the two (B, *, H, W, *) relayouts
    (~1.7 GB of HBM traffic per batch-8) the d-leading layout forces.
    ``strides``/``padding`` are given in (d, h, w) order, as everywhere
    else in this file.
    """
    features: int
    strides: Tuple[int, int, int]
    padding: Tuple[Tuple[int, int], ...]
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, D, C)
        kernel, bias = _Conv3DParams(self.features, x.shape[-1],
                                     name="conv")()
        sd, sh, sw = self.strides
        pd, ph, pw = self.padding
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        k = jnp.transpose(kernel, (1, 2, 0, 3, 4))   # (kh, kw, kd, I, O)
        y = jax.lax.conv_general_dilated(
            x.astype(dt), k.astype(dt), window_strides=(sh, sw, sd),
            padding=(tuple(ph), tuple(pw), tuple(pd)),
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))
        y = nn.relu(y + bias.astype(dt))
        return standardize(y, self.eps)


class ConvReluNormBanded(nn.Module):
    """ConvReluNorm for depth-minor inputs via ONE (D, C)-folded 2D conv.

    Views (B, H, W, D, C) as (B, H, W, D*C) and runs a single NHWC
    convolution against a block-banded (3, 3, D*C, D_out*C) kernel whose
    (d_in, d_out) block is the 3D kernel's depth tap ``kd = d_in -
    d_out*stride_d + pad_d`` (zero outside the band).  Identical math and
    parameter tree to ``ConvReluNorm(features, (3, 3, 3), ...)`` — only
    the compute form differs.

    TPU motivation: XLA's NHWDC 3D conv at these shapes runs ~40 TFLOP/s
    (the 64-wide output channel dim strands MXU lanes and the depth
    window sits awkwardly in the minor dims).  The folded form computes
    D/3-ish extra zero-block FLOPs but feeds the MXU a 128+-lane output
    (D_out*C) and a plain 2D window; measured at CML shapes (batch 8,
    352x400, bf16): conv2 18.6 -> 15.9 ms, conv3 12.9 -> ~6.4 ms.  The
    banded kernel build is 3*3*D*C*D_out*C elements — negligible VPU
    work per step.
    """
    features: int
    strides: Tuple[int, int, int]
    padding: Tuple[Tuple[int, int], ...]
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, H, W, D, C)
        B, H, W, D, C = x.shape
        kernel, bias = _Conv3DParams(self.features, C, name="conv")()
        sd, sh, sw = self.strides
        (pd0, pd1), ph, pw = self.padding
        d_out = (D + pd0 + pd1 - 3) // sd + 1
        O = self.features
        dt = jnp.promote_types(x.dtype, kernel.dtype)

        kb = jnp.zeros((3, 3, D * C, d_out * O), dt)
        k = kernel.astype(dt)
        for do in range(d_out):
            for kd in range(3):
                din = do * sd + kd - pd0
                if 0 <= din < D:
                    kb = kb.at[:, :, din * C:(din + 1) * C,
                               do * O:(do + 1) * O].set(k[kd])

        y = jax.lax.conv_general_dilated(
            x.reshape(B, H, W, D * C).astype(dt), kb,
            window_strides=(sh, sw), padding=(tuple(ph), tuple(pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.relu(y.reshape(B, y.shape[1], y.shape[2], d_out, O)
                    + bias.astype(dt))
        return standardize(y, self.eps)


class MiddleConvLayers(nn.Module):
    """Dense 3D conv stack compressing depth 10 -> 2
    (reference CML, Pipe.py:31-43).

    ``fold_depth`` computes each 3D conv as a depth-folded 2D conv
    (see Conv3DFoldedReluNorm) — same parameters and math.  Measured on
    v5e it is *slower* (XLA materializes the 2.2 GB tap tensor instead
    of fusing it into the conv), so the naive 3D form stays the default;
    the folded path is kept for future Mosaic-fused revisions.
    (A third, shifted-accumulation form was measured at 138 ms vs
    dense-3D's 82 and removed in round 4 — see DESIGN.md's table.)
    """
    eps: float = 1e-6
    fold_depth: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (..., D, H, W, C) = (..., 10, 352, 400, 128)
        if self.fold_depth:
            x = Conv3DFoldedReluNorm(64, 2, 1, self.eps,
                                     name="conv1")(x)            # D 10->5
            x = Conv3DFoldedReluNorm(64, 1, 0, self.eps,
                                     name="conv2")(x)            # D 5->3
            x = Conv3DFoldedReluNorm(64, 2, 1, self.eps,
                                     name="conv3")(x)            # D 3->2
            return x
        p1 = ((1, 1), (1, 1), (1, 1))
        x = ConvReluNorm(64, (3, 3, 3), (2, 1, 1), p1, self.eps,
                         xavier=False, name="conv1")(x)          # D 10->5
        x = ConvReluNorm(64, (3, 3, 3), (1, 1, 1),
                         ((0, 0), (1, 1), (1, 1)), self.eps,
                         xavier=False, name="conv2")(x)          # D 5->3
        x = ConvReluNorm(64, (3, 3, 3), (2, 1, 1), p1, self.eps,
                         xavier=False, name="conv3")(x)          # D 3->2
        return x


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_scatter_diff(features, coords, mask, grid_shape):
    from mvxnet_makise_tpu.ops.pallas_scatter import pallas_scatter_to_grid

    # interpret mode off-TPU so the CPU test suite exercises this path
    return pallas_scatter_to_grid(features, coords, mask, grid_shape,
                                  interpret=jax.default_backend() != "tpu")


def _pallas_scatter_fwd(features, coords, mask, grid_shape):
    return _pallas_scatter_diff(features, coords, mask, grid_shape), (
        coords, mask)


def _pallas_scatter_bwd(grid_shape, res, g):
    # scatter's transpose is a gather: each voxel row's cotangent is the
    # grid cotangent at its cell (padded rows get zero)
    coords, mask = res
    nx, ny, nz = grid_shape
    flat = coords[:, 2] * (nx * ny) + coords[:, 0] * ny + coords[:, 1]
    flat = jnp.where(mask, flat, 0)
    rows = g.reshape(nx * ny * nz, g.shape[-1])[flat]
    rows = jnp.where(mask[:, None], rows, 0)
    return rows.astype(g.dtype), None, None


_pallas_scatter_diff.defvjp(_pallas_scatter_fwd, _pallas_scatter_bwd)


def _scatter(features, coords, mask, grid_shape, backend: str):
    """Dense-grid scatter with a selectable backend.  The Pallas
    row-writer wins in isolation on v5e (24 vs 33 ms/batch-8, real
    coords) but *loses in model context* (full LiDAR branch 96 vs
    87 ms): the pallas_call is a scheduling barrier, while XLA overlaps
    its scatter with neighbouring ops.  ``auto`` therefore resolves to
    xla; the kernel stays selectable for future fused revisions.  The
    Pallas path carries a custom VJP (transpose = row gather) so both
    backends train."""
    if backend == "auto":
        backend = "xla"
    if backend == "pallas":
        return _pallas_scatter_diff(features, coords, mask,
                                    tuple(grid_shape))
    return scatter_voxels_to_grid(features, coords, mask, grid_shape)


class Conv1ScatterBandedReluNorm(nn.Module):
    """CML conv1 consuming the depth-banded scatter layout
    (ops/scatter.scatter_voxels_to_conv1_bands): ONE NHWC 2D conv of
    kernel (3, 3, 3*C_in) replaces the strided-depth 3D conv at
    identical math.  Measured on v5e it does NOT beat the 3D form
    in-model (conv1 is output-channel bound at N=64 either way, and the
    banded input costs 1.5x the reads) — kept as a tested variant.
    Parameter tree identical to ConvReluNorm(name='conv1');
    checkpoints interchange."""
    features: int
    in_features: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, banded: jnp.ndarray) -> jnp.ndarray:
        """banded: (B, d_out, H, W, 3*C_in) kd-major channel blocks.
        Returns (B, d_out, H, W, features)."""
        kernel, bias = _Conv3DParams(
            self.features, self.in_features, name="conv")()
        B, d_out, H, W, C3 = banded.shape
        # (kd, kh, kw, I, O) -> (kh, kw, kd*I, O): kd-major channel
        # blocks match the scatter's slot layout
        k2d = jnp.transpose(kernel, (1, 2, 0, 3, 4)).reshape(
            3, 3, C3, self.features)
        y = jax.lax.conv_general_dilated(
            banded.reshape(B * d_out, H, W, C3), k2d,
            window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = nn.relu((y + bias).reshape(B, d_out, H, W, self.features))
        return standardize(y, self.eps)


class MiddleConvLayersBanded(nn.Module):
    """CML with the banded-scatter first layer: consumes the voxel rows
    directly, the 10-slice dense grid never materializes, and conv1 is
    a single fast 2D conv (Conv1ScatterBandedReluNorm).  conv2/conv3
    stay 3D (their shapes already run near the MXU ceiling).  Same
    parameter tree as MiddleConvLayers."""
    eps: float = 1e-6
    grid_shape: Sequence[int] = (352, 400, 10)

    @nn.compact
    def __call__(self, vfeat: jnp.ndarray, coords: jnp.ndarray,
                 vmask: jnp.ndarray) -> jnp.ndarray:
        from mvxnet_makise_tpu.ops.scatter import (
            scatter_voxels_to_conv1_bands)

        banded = jax.vmap(lambda f, c, m: scatter_voxels_to_conv1_bands(
            f, c, m, self.grid_shape))(vfeat, coords, vmask)
        x = Conv1ScatterBandedReluNorm(
            64, vfeat.shape[-1], self.eps, name="conv1")(banded)
        x = ConvReluNorm(64, (3, 3, 3), (1, 1, 1),
                         ((0, 0), (1, 1), (1, 1)), self.eps,
                         xavier=False, name="conv2")(x)      # D 5->3
        x = ConvReluNorm(64, (3, 3, 3), (2, 1, 1),
                         ((1, 1), (1, 1), (1, 1)), self.eps,
                         xavier=False, name="conv3")(x)      # D 3->2
        return x


class ColumnConv1ReluNorm(nn.Module):
    """CML conv1 via BEV-column compaction (ops/column_conv.py): pack
    the active columns dense, fold all 27 taps x 5 output depths into
    ONE MXU matmul, then merge the 9 spatial taps into the dense output.
    Neither the 128-channel dense grid (360 MB/frame bf16) nor its
    scatter ever exists.  Parameter tree identical to
    ConvReluNorm(name='conv1') — checkpoints interchange with the dense
    path.

    ``merge_backend``: "auto" resolves to the fused Pallas merge kernel
    (ops/pallas_column_merge.merge_taps_fused — one-hot positioning
    matmuls on the MXU with the bias/relu/standardize-statistics
    epilogue fused in; XLA's scatter-add is row-issue-bound at
    ~40-65 ns/row on TPU, slower than the dense conv it replaces);
    "xla" runs the same fused semantics as an XLA scatter-add
    composition (the oracle, and the automatic choice under float64
    test runs, which Mosaic does not support); any other value selects
    the per-frame column_conv1_d2 oracle with an unfused epilogue."""
    features: int
    in_features: int
    grid_shape: Sequence[int] = (352, 400, 10)
    eps: float = 1e-6
    merge_backend: str = "auto"    # "auto" | "pallas" | "xla"
    d_last: bool = False           # emit (B, nx, ny, d, C) instead of
    #                                (B, d, nx, ny, C): the merge kernel
    #                                packs d-minor, so this skips a
    #                                1.4 GB/batch-8 relayout
    # tap-matmul form: "folded" = one depth-unrolled matmul emitting the
    # merge layout directly (3.3x FLOPs, zero relayouts — measured
    # faster, docs/DESIGN.md); "im2col" = minimal-FLOPs form (kept as
    # the oracle; pays an f32 materialize + cast + (d, 9) transpose)
    taps_form: str = "auto"        # "auto" | "folded" | "im2col"

    @nn.compact
    def __call__(self, vfeat: jnp.ndarray, coords: jnp.ndarray,
                 vmask: jnp.ndarray) -> jnp.ndarray:
        from mvxnet_makise_tpu.ops.column_conv import (
            column_conv1_d2, column_taps_matmul,
            column_taps_matmul_folded, compact_columns)
        from mvxnet_makise_tpu.ops.pallas_column_merge import (
            column_bounds, merge_taps_fused)

        kernel, bias = _Conv3DParams(
            self.features, self.in_features, name="conv")()
        nx, ny, nz = self.grid_shape
        d_out = (nz + 2 - 3) // 2 + 1

        backend = self.merge_backend
        if backend == "auto":
            backend = "xla" if vfeat.dtype == jnp.float64 else "pallas"

        if backend in ("pallas", "xla"):
            # the voxelizer emits voxels ascending in the linear cell id
            # with dead slots trailing (ops/voxelize.py), so the
            # compaction's internal sort is skippable
            taps_form = self.taps_form
            if taps_form == "auto":
                taps_form = "folded"

            def prep(f, c, m):
                cols, col_xy, col_mask = compact_columns(
                    f, c, m, self.grid_shape, assume_sorted=True)
                if taps_form == "folded":
                    # one depth-unrolled matmul, already (V, 9, d*Co)
                    y = column_taps_matmul_folded(cols, kernel,
                                                  out_dtype=f.dtype)
                else:
                    y = column_taps_matmul(cols, kernel)  # (V, d, 9, Co)
                    # drop to the compute dtype BEFORE the (d, 9)
                    # transpose: halves the biggest relayout
                    y = jnp.transpose(y.astype(f.dtype), (0, 2, 1, 3))
                return (y, col_xy[:, 1],
                        column_bounds(col_xy, col_mask, nx))

            y, cy, bounds = jax.vmap(prep)(vfeat, coords, vmask)
            B, V = y.shape[:2]
            # bias lands on every cell (incl. inactive ones), tiled to
            # the packed d-major lane layout; the kernel also emits
            # per-row [sum, sum_sq] so the standardize statistics never
            # re-read the (B, nx, ny, d*C) tensor (dense ConvReluNorm
            # epilogue semantics, one pass)
            bias_packed = jnp.tile(bias, d_out)
            out, stats = merge_taps_fused(
                y.reshape(B, V, 9, d_out * self.features)
                .astype(vfeat.dtype), cy, bounds, bias_packed,
                tuple(self.grid_shape), backend)
            s = jnp.sum(stats, axis=(0, 1))                    # (2, R)
            s = s.reshape(2, d_out, self.features).sum(axis=1)  # (2, C)
            n = B * nx * ny * d_out
            mean = s[0] / n
            var = s[1] / n - mean * mean
            x = out.reshape(B, nx, ny, d_out, self.features)
            if not self.d_last:
                x = jnp.transpose(x, (0, 3, 1, 2, 4))
            inv = jax.lax.rsqrt(var + self.eps)
            return ((x.astype(mean.dtype) - mean) * inv).astype(x.dtype)

        # per-frame XLA oracle path (column_conv1_d2)
        def one(f, c, m):
            cols, col_xy, col_mask = compact_columns(
                f, c, m, self.grid_shape, assume_sorted=True)
            return column_conv1_d2(cols, col_xy, col_mask, kernel,
                                   self.grid_shape)

        x = jax.vmap(one)(vfeat, coords, vmask)    # (B,5,H,W,Co) f32
        if self.d_last:
            x = jnp.transpose(x, (0, 2, 3, 1, 4))  # (B,H,W,5,Co)
        # bias lands on every cell (incl. inactive ones) and the epilogue
        # reduces over the whole batch — dense ConvReluNorm semantics
        x = nn.relu((x + bias).astype(vfeat.dtype))
        return standardize(x, self.eps)


class MiddleConvLayersColumn(nn.Module):
    """CML with the column-compacted first layer
    (:class:`ColumnConv1ReluNorm`); conv2/conv3 stay dense 3D (their
    input is 4x smaller and BEV occupancy dilates past useful sparsity:
    measured on KITTI-shaped frames — tools/probe.py occupancy — conv1's 3x3
    dilation takes the 7.5% active-column footprint to 37.6%, conv2's
    to 52.3%, so compacting ~53k columns would pay ~5x conv1's merge
    cost for <2.7x fewer MACs against a banded form already at
    ~78 TFLOP/s)
    but run in the depth-minor (B, H, W, D, C) layout the merge kernel
    already emits (:class:`ConvReluNormDLast`), so no big relayout sits
    between conv1 and the RPN fold.  **Returns (B, H, W, D, C)** —
    unlike MiddleConvLayers' (B, D, H, W, C).  Same parameter tree as
    MiddleConvLayers — checkpoints interchange; equivalence is tested in
    tests/test_column_cml.py.  Replaces the reference's scatter+dense
    pipeline at VoxelNet.py:16-22 / Pipe.py:33."""
    eps: float = 1e-6
    grid_shape: Sequence[int] = (352, 400, 10)
    # conv2/conv3 compute form: "banded" = one (D, C)-folded 2D conv
    # (ConvReluNormBanded, measured faster); "dlast" = NHWDC 3D conv
    # (ConvReluNormDLast, the oracle)
    conv23_form: str = "banded"

    @nn.compact
    def __call__(self, vfeat: jnp.ndarray, coords: jnp.ndarray,
                 vmask: jnp.ndarray) -> jnp.ndarray:
        conv = (ConvReluNormBanded if self.conv23_form == "banded"
                else ConvReluNormDLast)
        x = ColumnConv1ReluNorm(
            64, vfeat.shape[-1], tuple(self.grid_shape), self.eps,
            d_last=True, name="conv1")(vfeat, coords, vmask)  # (B,H,W,5,64)
        x = conv(64, (1, 1, 1),
                 ((0, 0), (1, 1), (1, 1)), self.eps,
                 name="conv2")(x)                            # D 5->3
        x = conv(64, (2, 1, 1),
                 ((1, 1), (1, 1), (1, 1)), self.eps,
                 name="conv3")(x)                            # D 3->2
        return x


# reference RPN shape (Pipe.py:45-75): stage channels, extra convs per
# stage, deconv width — the parity default for every model class
REFERENCE_RPN_TRUNK = ((128, 128, 256), (3, 5, 5), 256)


class RPN(nn.Module):
    """Region proposal network: 3 stride-2 conv stages, 3 deconvs back to
    full resolution, concat 3*deconv_ch, 1x1 cls/reg heads
    (Pipe.py:45-75).

    ``trunk`` = ((ch1, ch2, ch3), (extra1, extra2, extra3), deconv_ch);
    the default is the reference shape (768-ch concat).  Narrower values
    are the measured "cheaper dense trunk" route (Config.rpn_channels,
    DESIGN.md north-star route #5) — parameter names are unchanged so
    reference-checkpoint interchange still works at the default."""
    anchors_per_loc: int = 2
    box_dim: int = 7
    eps: float = 1e-6
    trunk: Tuple = REFERENCE_RPN_TRUNK

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        p = ((1, 1), (1, 1))
        (ch1, ch2, ch3), (e1, e2, e3), dch = self.trunk

        def block(x, ch, n_extra, name):
            x = ConvReluNorm(ch, (3, 3), (2, 2), p, self.eps,
                             name=f"{name}_down")(x)
            for i in range(n_extra):
                x = ConvReluNorm(ch, (3, 3), (1, 1), p, self.eps,
                                 name=f"{name}_conv{i}")(x)
            return x

        x1 = block(x, ch1, e1, "blk1")    # (176, 200, ch1)
        x2 = block(x1, ch2, e2, "blk2")   # (88, 100, ch2)
        x3 = block(x2, ch3, e3, "blk3")   # (44, 50, ch3)

        d1 = DeconvReluNorm(dch, (3, 3), (1, 1), "SAME", self.eps,
                            name="deconv1")(x1)
        d2 = DeconvReluNorm(dch, (2, 2), (2, 2), "VALID", self.eps,
                            name="deconv2")(x2)
        d3 = DeconvReluNorm(dch, (4, 4), (4, 4), "VALID", self.eps,
                            name="deconv3")(x3)
        feat = jnp.concatenate([d1, d2, d3], axis=-1)  # (176, 200, 3*dch)

        init = nn.initializers.xavier_uniform()
        score = nn.Conv(self.anchors_per_loc, (1, 1), kernel_init=init,
                        name="cls")(feat)
        reg = nn.Conv(self.anchors_per_loc * self.box_dim, (1, 1),
                      kernel_init=init, name="reg")(feat)
        return jax.nn.sigmoid(score), reg


class VoxelNetBranch(nn.Module):
    """Full LiDAR branch (reference VoxelNet.py:7-39).

    Input voxel features may be the 7 LiDAR channels (VoxelNet-only
    config) or 7 + 16 fused image channels (full MVXNet).

    ``remat=True`` rematerializes the CML stack in the backward pass
    (jax.checkpoint): the dense (D, H, W, 128) activations are the
    dominant training-memory term (~720 MB/frame in f32), and trading
    one extra forward for them roughly halves peak HBM at batch > 1 —
    no reference counterpart (it trains batch-1 only).
    """
    grid_shape: Sequence[int] = (352, 400, 10)   # (nx, ny, nz)
    anchors_per_loc: int = 2
    box_dim: int = 7
    eps: float = 1e-6
    remat: bool = False
    scatter_backend: str = "auto"  # "auto" | "xla" | "pallas"
    cml_mode: str = "dense3d"      # "dense3d" | "banded" | "column"
    rpn_trunk: Tuple = REFERENCE_RPN_TRUNK

    @nn.compact
    def __call__(self, voxels: jnp.ndarray, coords: jnp.ndarray,
                 mask: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """voxels: (B, V, T, C); coords: (B, V, 3) int; mask: (B, V).

        Returns (score (B, H/2, W/2, A) sigmoid-activated,
                 reg (B, H/2, W/2, A*7)).
        """
        x = SVFE(self.eps, name="svfe")(voxels, mask)           # (B,V,T,128)
        x = DenseReluNorm(128, self.eps, name="fcn")(
            x, mask[..., None] & jnp.ones((x.shape[-2],), bool))
        x = jnp.max(x, axis=-2)                                 # (B, V, 128)
        x = jnp.where(mask[..., None], x, 0.0)

        if self.cml_mode == "column":
            cml_cls = nn.remat(MiddleConvLayersColumn) if self.remat \
                else MiddleConvLayersColumn
            x = cml_cls(self.eps, tuple(self.grid_shape),
                        name="cml")(x, coords, mask)   # (B, H, W, D, C)
            B, H, W, D, C = x.shape
            # (C, D) torch flattening order, from the d-minor layout
            x = jnp.transpose(x, (0, 1, 2, 4, 3)).reshape(B, H, W, C * D)
            return RPN(self.anchors_per_loc, self.box_dim, self.eps,
                       self.rpn_trunk, name="rpn")(x)
        elif self.cml_mode == "banded":
            cml_cls = nn.remat(MiddleConvLayersBanded) if self.remat \
                else MiddleConvLayersBanded
            x = cml_cls(self.eps, tuple(self.grid_shape),
                        name="cml")(x, coords, mask)
        else:
            dense = jax.vmap(
                lambda f, c, m: _scatter(
                    f, c, m, self.grid_shape,
                    self.scatter_backend))(x, coords, mask)
            # (B, D, H, W, 128)
            cml_cls = nn.remat(MiddleConvLayers) if self.remat \
                else MiddleConvLayers
            x = cml_cls(self.eps, name="cml")(dense)            # (B,2,H,W,64)
        B, D, H, W, C = x.shape
        # fold depth into channels with torch's (C, D) flattening order
        # (reference VoxelNet.py:36 reshapes NCDHW -> N,C*D,H,W), so
        # reference RPN weights import 1:1
        x = jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(B, H, W, C * D)
        return RPN(self.anchors_per_loc, self.box_dim, self.eps,
                   self.rpn_trunk, name="rpn")(x)
