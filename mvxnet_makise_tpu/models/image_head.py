"""Image branch: detection transform, per-point feature gather, fusion MLP.

Reference: /root/reference/modules/imhead/{Pipe.py, Head.py}
(SURVEY.md §2 C10).  The pipeline is:

  image --transform--> padded tensor --ResNet50FPN--> 3 pyramid levels
        --bilinear gather at point projections--> (V, T, 768)
        --fusion MLP--> (V, T, 16) per-point image features

TPU-native details:
  * the transform (torchvision GeneralizedRCNNTransform semantics:
    ImageNet normalize, resize so min side <= 800 / max side <= 1333,
    pad to a multiple of 32 — Pipe.py:18) is *static* for the fixed KITTI
    crop size, so the whole branch compiles once;
  * the reference's ImageFeatureFusion interleaves "FCN" layers and 1x1
    convs (Pipe.py:84-105) — a 1x1 conv over the (V, T) plane *is* a
    pointwise Dense, and both block types are linear->ReLU->stateless-BN,
    so the fusion here is five DenseReluNorm layers of widths
    768, 128, 128, 16, 16 with identical math;
  * gather weights: textbook bilinear by default,
    ``swapped_weights=True`` reproduces the reference's swapped variant
    (Pipe.py:72-75) for parity runs;
  * faithful quirk: empty sample slots enter the fusion MLP as zero
    vectors and exit with the (nonzero) bias/norm response, exactly as in
    the reference (featureMaping zeroes before fusion, not after —
    Pipe.py:53-59 then Head.py:20); downstream SVFE sees the same values.
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from mvxnet_makise_tpu.models.blocks import (
    DenseReluNorm,
    DenseReluNormVirtual,
    DenseReluNormVirtualFull,
)
from mvxnet_makise_tpu.models.resnet_fpn import ResNet50FPN
from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn

# torchvision GeneralizedRCNNTransform defaults
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
_MIN_SIZE = 800.0
_MAX_SIZE = 1333.0
_PAD_STRIDE = 32


def _transform_scale(h: int, w: int, min_side: float) -> float:
    """torchvision GeneralizedRCNNTransform scale for an (h, w) image.

    ``min_side <= 0`` selects *native scale* (no resize, pad only).  At
    the reference default (800/1333) the KITTI aspect ratio makes the
    max-side constraint bind: 370x1224 scales by 1333/1224 = 1.089 to
    402x1332 (int-floor sizing) — NOT by 800/370 = 2.16 (a common
    misreading; the measured-pixels table in docs/DESIGN.md is the
    record)."""
    if min_side <= 0:
        return 1.0
    # keep the torchvision min/max aspect cap proportional so sub-800
    # settings shrink the long side too instead of re-binding at 1333;
    # supra-800 keeps torchvision's FIXED 1333 cap (clamped, so e.g.
    # min_side=1000 at KITTI aspect behaves exactly like 800)
    max_side = _MAX_SIZE * min(min_side / _MIN_SIZE, 1.0)
    return min(min_side / min(h, w), max_side / max(h, w))


def transform_output_shape(image_size: Sequence[int],
                           min_side: float = _MIN_SIZE
                           ) -> Tuple[int, int]:
    """Static (resized, padded) shape for a given input (h, w)."""
    h, w = image_size
    scale = _transform_scale(h, w, min_side)
    rh, rw = int(h * scale), int(w * scale)
    ph = int(math.ceil(rh / _PAD_STRIDE) * _PAD_STRIDE)
    pw = int(math.ceil(rw / _PAD_STRIDE) * _PAD_STRIDE)
    return (rh, rw), (ph, pw)


def gather_image_size(image_size: Sequence[int],
                      min_side: float = _MIN_SIZE) -> Tuple[float, float]:
    """Effective (h, w) for mapping original pixels to feature cells.

    The gather divides original-image pixels by ``im / Hf`` where Hf is
    measured on the *padded* feature map.  At the reference operating
    point (min_side == 800) we keep the reference's own convention of
    using the raw image size (Pipe.py:41-45) — a faithful ~3% stretch
    quirk.  At any other min_side (parity already forfeited) the pad
    fraction grows (10.8% of rows at min_side=512), so we return the
    content-correct effective size ``padded * original / resized``:
    original pixel y then maps to feature row y * rh / (h * stride),
    landing bottom/right points on the resized content instead of the
    zero-padded border."""
    h, w = image_size
    if min_side == _MIN_SIZE:
        return (float(h), float(w))
    (rh, rw), (ph, pw) = transform_output_shape(image_size, min_side)
    return (ph * h / rh, pw * w / rw)


def detection_transform(image: jnp.ndarray,
                        min_side: float = _MIN_SIZE) -> jnp.ndarray:
    """(H, W, 3) float image in [0, 1] -> normalized, resized, padded
    (Hp, Wp, 3) tensor, matching the torchvision transform the reference
    reuses (Pipe.py:18): normalize first, bilinear resize, zero-pad
    bottom/right to a multiple of 32.

    dtype-preserving: normalize/resize run in f32 for accuracy, but the
    output is cast back to the input dtype.  (The f32 numpy mean/std
    constants used to promote bf16 inputs to f32 — and because every
    downstream stage inherits the pyramid's dtype, that one promotion
    silently ran the ENTIRE fused model in f32 on TPU until round 4.)"""
    import jax

    h, w = image.shape[:2]
    (rh, rw), (ph, pw) = transform_output_shape((h, w), min_side)
    x = (image.astype(jnp.float32) - _IMAGENET_MEAN) / _IMAGENET_STD
    if (rh, rw) != (h, w):
        x = jax.image.resize(x, (rh, rw, 3), method="bilinear")
    return jnp.pad(x, ((0, ph - rh), (0, pw - rw), (0, 0))) \
        .astype(image.dtype)


class ImageFeatureFusion(nn.Module):
    """768 -> 16 pointwise fusion MLP (reference Pipe.py:84-105)."""
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        # x: (..., V, T, 768); mask: (..., V) voxel validity for norm stats
        T = x.shape[-2]
        m = mask[..., None] & jnp.ones((T,), bool)
        x = DenseReluNorm(768, self.eps, name="fcn1")(x, m)
        x = DenseReluNorm(128, self.eps, name="conv1")(x, m)
        x = DenseReluNorm(128, self.eps, name="fcn2")(x, m)
        x = DenseReluNorm(16, self.eps, name="conv2")(x, m)
        x = DenseReluNorm(16, self.eps, name="fcn3")(x, m)
        return x


class PointImageFusion(nn.Module):
    """768 -> 16 fusion MLP over *points* with virtual-row statistics.

    Numerically identical to :class:`ImageFeatureFusion` run over the
    full (V, T) slot grid (see DenseReluNormVirtual) while doing ~13x
    less work: real KITTI frames carry ~20-30k points against
    max_voxels * T = 430k sample slots.  Layer names match
    ImageFeatureFusion so reference-checkpoint import works unchanged.
    """
    eps: float = 1e-6
    # "masked" = per-layer masked sums (the r1-r4 formulation); "full" =
    # plain full-population reductions + analytic z correction
    # (DenseReluNormVirtualFull) — exact under this stack's invariant
    # that invalid rows are value-identical to z (both start as zeros)
    stats: str = "masked"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 n_virtual: jnp.ndarray):
        """x: (..., P, 768); mask: (..., P); n_virtual: () count of empty
        sample slots.  Returns ((..., P, 16) point features,
        (16,) empty-slot feature)."""
        blk = (DenseReluNormVirtualFull if self.stats == "full"
               else DenseReluNormVirtual)
        z = jnp.zeros((x.shape[-1],), x.dtype)
        for name, width in [("fcn1", 768), ("conv1", 128),
                            ("fcn2", 128), ("conv2", 16), ("fcn3", 16)]:
            x, z = blk(width, self.eps, name=name)(
                x, mask, z, n_virtual)
        return x, z


class PointImageHead(nn.Module):
    """Frozen FPN extractor + *per-point* gather + virtual-row fusion.

    The fast path: gathers and fuses once per real LiDAR point instead of
    once per voxel sample slot (13x less gather traffic and MLP FLOPs on
    KITTI shapes), with exact slot-grid semantics via
    :class:`PointImageFusion`.  Parameter tree matches :class:`ImageHead`
    (extractor/fusion) so checkpoints interchange.

    ``gather_backend="auto"`` resolves to ``"raw4"`` — per-image 4-tap
    row gathers from the raw feature maps, no patch tables
    (ops/gather.bilinear_gather_fpn_batch; measured 20.2 vs 30.0 ms for
    the stage, round-4 probe; harness now tools/probe.py).  ``"xla"`` keeps the vmapped
    patch-table gather (the r1-r3 default and the equivalence oracle).
    ``gather_backend="pallas"`` selects ops/pallas_gather's
    banded selector-matmul kernel: points are processed in
    image-row-sorted padded order, the
    fusion MLP runs directly on that order (pointwise math + masked
    statistics are order/padding-exact — padded rows carry mask False
    and weight zero), and only the final 16-channel output is
    un-permuted back to point order.
    """
    image_size: Tuple[int, int] = (370, 1224)
    eps: float = 1e-6
    swapped_bilerp: bool = False
    # "auto" | "raw4" | "raw4f" | "xla" | "xla_fused" | "pallas"
    gather_backend: str = "auto"
    # transform min-side (reference torchvision default 800; <= 0 =
    # native scale).  The gather maps original-image pixels to feature
    # cells through the pyramid's own (Hf, Wf), so every backend adapts
    # to the resolution automatically.  AP caveat in Config.
    image_min_side: float = _MIN_SIZE
    # fusion-MLP statistics formulation: "auto" | "masked" | "full"
    fusion_stats: str = "auto"

    @nn.compact
    def __call__(self, images: jnp.ndarray, points_rc: jnp.ndarray,
                 point_mask: jnp.ndarray, n_virtual: jnp.ndarray):
        """images: (B, H, W, 3); points_rc: (B, P, 2) (row, col);
        point_mask: (B, P) rows that landed in a voxel slot;
        n_virtual: () count of empty sample slots across the batch.
        Returns ((B, P, 16), (16,) empty-slot feature)."""
        import jax

        # measured (v5e, batch 8): raw4 beats xla (vmapped patch
        # tables) 20.2 vs 30.0 ms for the gather stage (round-4 probe);
        # pallas 88 vs xla 63 ms for the whole head — the banded
        # kernel's per-step MXU selector matmuls cost more than XLA's
        # row-gather engine at these shapes.  Round 5: raw4f (coarse
        # levels served by ONE wide-row gather) loses ISOLATED (18.1 vs
        # 16.7 ms — table-build cost) but wins IN-MODEL (e2e raw 87.0
        # vs 81.5 f/s at min_side 400; 72.0 vs 69.6 at 800): the wide
        # row overlaps the surrounding compute better than 8 narrow
        # issues — the inverse of the pallas-scatter lesson, and why
        # auto resolves by END-TO-END measurement, not stage isolation.
        backend = self.gather_backend
        if backend == "auto":
            backend = "raw4f"
        fstats = self.fusion_stats
        if fstats == "auto":
            # isolated dead-neutral (5.39 vs 5.41 ms — XLA already
            # fuses the masked products); keep the r1-r4 formulation
            fstats = "masked"
        # content-correct pixel->cell mapping at non-default min_side
        # (reference convention preserved at 800; see gather_image_size)
        gsize = gather_image_size(self.image_size, self.image_min_side)

        x = jax.vmap(
            lambda im: detection_transform(im, self.image_min_side)
        )(images)
        pyramid = ResNet50FPN(name="extractor")(x)
        # The extractor is frozen (reference Head.py:9-11; the optimizer
        # routes its params to set_to_zero — train/state.py).  Cut the
        # backward graph here explicitly so the ResNet50-FPN backward
        # (~2x its 105 GFLOP/frame forward) is never traced into the
        # train step — XLA usually DCEs it because the frozen updates
        # are zeros_like, but stop_gradient guarantees it across
        # remat/scan boundaries.
        pyramid = jax.tree_util.tree_map(jax.lax.stop_gradient, pyramid)

        if backend == "pallas":
            from mvxnet_makise_tpu.ops.pallas_gather import (
                fpn_gather_banded_diff)

            gathered, pos, padmask = fpn_gather_banded_diff(
                tuple(pyramid), points_rc, point_mask, gsize,
                self.eps, self.swapped_bilerp, 128,
                jax.default_backend() != "tpu")
            fused, z = PointImageFusion(self.eps, fstats, name="fusion")(
                gathered, padmask, n_virtual)
            return jnp.take_along_axis(fused, pos[..., None], axis=1), z

        # (a "projected" backend — fcn1 folded into the pyramid
        # pre-gather, exact by linearity of bilerp — was measured at
        # 95.6 vs 53.3 ms head time and removed in round 4; see
        # DESIGN.md's winner/loser table for the record.)
        if backend in ("raw4", "raw4f"):
            from mvxnet_makise_tpu.ops.gather import (
                bilinear_gather_fpn_batch)

            gathered = bilinear_gather_fpn_batch(
                tuple(pyramid), points_rc, point_mask, gsize,
                eps=self.eps, swapped_weights=self.swapped_bilerp,
                fuse_coarse=(backend == "raw4f"))
            return PointImageFusion(self.eps, fstats, name="fusion")(
                gathered, point_mask, n_virtual)

        gathered = jax.vmap(
            lambda feats, rc, ok: bilinear_gather_fpn(
                feats, rc, ok, gsize, eps=self.eps,
                swapped_weights=self.swapped_bilerp,
                fused_coarse=(backend == "xla_fused"))
        )(pyramid, points_rc, point_mask)
        return PointImageFusion(self.eps, fstats, name="fusion")(
            gathered, point_mask, n_virtual)


class ImageHead(nn.Module):
    """Frozen FPN extractor + per-point gather + trainable fusion
    (reference Head.py:4-21)."""
    image_size: Tuple[int, int] = (370, 1224)
    eps: float = 1e-6
    swapped_bilerp: bool = False
    image_min_side: float = _MIN_SIZE

    @nn.compact
    def __call__(self, images: jnp.ndarray, points_rc: jnp.ndarray,
                 point_valid: jnp.ndarray,
                 voxel_mask: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) in [0, 1]; points_rc: (B, V, T, 2) image
        (row, col) per sample point; point_valid: (B, V, T) bool;
        voxel_mask: (B, V).  Returns (B, V, T, 16)."""
        import jax

        x = jax.vmap(
            lambda im: detection_transform(im, self.image_min_side)
        )(images)
        pyramid = ResNet50FPN(name="extractor")(x)
        # The extractor is frozen (reference Head.py:9-11; the optimizer
        # routes its params to set_to_zero — train/state.py).  Cut the
        # backward graph here explicitly so the ResNet50-FPN backward
        # (~2x its 105 GFLOP/frame forward) is never traced into the
        # train step — XLA usually DCEs it because the frozen updates
        # are zeros_like, but stop_gradient guarantees it across
        # remat/scan boundaries.
        pyramid = jax.tree_util.tree_map(jax.lax.stop_gradient, pyramid)
        # region sizes are measured on the *padded* feature maps while
        # projections live in original-image pixels — the reference does
        # the same (Pipe.py:41-45), so keep its convention at the
        # default min_side; content-correct mapping otherwise.
        gsize = gather_image_size(self.image_size, self.image_min_side)
        gathered = jax.vmap(
            lambda feats, rc, ok: bilinear_gather_fpn(
                feats, rc, ok, gsize, eps=self.eps,
                swapped_weights=self.swapped_bilerp)
        )(pyramid, points_rc, point_valid)
        # (B, V, T, 768)
        return ImageFeatureFusion(self.eps, name="fusion")(
            gathered, voxel_mask)
