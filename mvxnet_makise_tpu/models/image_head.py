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
)
from mvxnet_makise_tpu.models.resnet_fpn import ResNet50FPN
from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn

# torchvision GeneralizedRCNNTransform defaults
_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)
_MIN_SIZE = 800.0
_MAX_SIZE = 1333.0
_PAD_STRIDE = 32


def transform_output_shape(image_size: Sequence[int]) -> Tuple[int, int]:
    """Static (resized, padded) shape for a given input (h, w)."""
    h, w = image_size
    scale = min(_MIN_SIZE / min(h, w), _MAX_SIZE / max(h, w))
    rh, rw = int(h * scale), int(w * scale)
    ph = int(math.ceil(rh / _PAD_STRIDE) * _PAD_STRIDE)
    pw = int(math.ceil(rw / _PAD_STRIDE) * _PAD_STRIDE)
    return (rh, rw), (ph, pw)


def detection_transform(image: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) float image in [0, 1] -> normalized, resized, padded
    (Hp, Wp, 3) tensor, matching the torchvision transform the reference
    reuses (Pipe.py:18): normalize first, bilinear resize, zero-pad
    bottom/right to a multiple of 32."""
    import jax

    h, w = image.shape[:2]
    (rh, rw), (ph, pw) = transform_output_shape((h, w))
    x = (image - _IMAGENET_MEAN) / _IMAGENET_STD
    x = jax.image.resize(x, (rh, rw, 3), method="bilinear")
    return jnp.pad(x, ((0, ph - rh), (0, pw - rw), (0, 0)))


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

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray,
                 n_virtual: jnp.ndarray, fcn1_pre_fn=None):
        """x: (..., P, 768); mask: (..., P); n_virtual: () count of empty
        sample slots.  Returns ((..., P, 16) point features,
        (16,) empty-slot feature).

        ``fcn1_pre_fn`` (see DenseReluNormVirtual.pre_fn) lets the caller
        compute fcn1's pre-activation itself — the projected-gather path;
        ``x`` is then only a shape/dtype placeholder and is never read
        (XLA dead-code-eliminates it)."""
        z = jnp.zeros((x.shape[-1],), x.dtype)
        for name, width in [("fcn1", 768), ("conv1", 128),
                            ("fcn2", 128), ("conv2", 16), ("fcn3", 16)]:
            x, z = DenseReluNormVirtual(width, self.eps, name=name)(
                x, mask, z, n_virtual,
                pre_fn=fcn1_pre_fn if name == "fcn1" else None)
        return x, z


class PointImageHead(nn.Module):
    """Frozen FPN extractor + *per-point* gather + virtual-row fusion.

    The fast path: gathers and fuses once per real LiDAR point instead of
    once per voxel sample slot (13x less gather traffic and MLP FLOPs on
    KITTI shapes), with exact slot-grid semantics via
    :class:`PointImageFusion`.  Parameter tree matches :class:`ImageHead`
    (extractor/fusion) so checkpoints interchange.

    ``gather_backend="auto"`` resolves to ``"xla"`` (the banded Pallas
    kernel measured slower in-model — see the backend note in
    ``__call__``).  ``gather_backend="pallas"`` selects ops/pallas_gather's
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
    # "auto" | "xla" | "xla_fused" | "pallas" | "projected"
    gather_backend: str = "auto"

    @nn.compact
    def __call__(self, images: jnp.ndarray, points_rc: jnp.ndarray,
                 point_mask: jnp.ndarray, n_virtual: jnp.ndarray):
        """images: (B, H, W, 3); points_rc: (B, P, 2) (row, col);
        point_mask: (B, P) rows that landed in a voxel slot;
        n_virtual: () count of empty sample slots across the batch.
        Returns ((B, P, 16), (16,) empty-slot feature)."""
        import jax

        # measured (v5e, batch 8): xla 63 ms vs pallas 88 ms for this
        # head — the banded kernel's per-step MXU selector matmuls cost
        # more than XLA's row-gather engine at these shapes.  Round 3:
        # "xla_fused" merges the two coarse levels into one wide-row
        # gather (ops/gather.py fused_coarse) — fewer, wider rows run
        # the row-issue-bound gather engine at a higher byte rate.
        backend = self.gather_backend
        if backend == "auto":
            backend = "xla"

        x = jax.vmap(detection_transform)(images)
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
                tuple(pyramid), points_rc, point_mask, self.image_size,
                self.eps, self.swapped_bilerp, 128,
                jax.default_backend() != "tpu")
            fused, z = PointImageFusion(self.eps, name="fusion")(
                gathered, padmask, n_virtual)
            return jnp.take_along_axis(fused, pos[..., None], axis=1), z

        if backend == "projected":
            # Fold fcn1 (Dense 768 -> 128) into the pyramid BEFORE the
            # gather: linearity of bilinear interpolation makes
            # ``W^T concat_l(bilerp_l(f)) == sum_l bilerp_l(f @ W_l)``
            # exact, so each gathered row shrinks 256 -> 128 channels
            # (ops/gather.projected_bilinear_gather_fpn).  Measured at
            # KITTI shapes (tools/bench_image.py, relayed v5e): 95.6 ms
            # vs 53.3 for the plain xla head — the halved row payload
            # does not survive the restructured evaluation order, so
            # auto stays "xla"; kept selectable with exact-math tests
            # (tests/test_projected_gather.py).
            from mvxnet_makise_tpu.ops.gather import (
                projected_bilinear_gather_fpn)

            dt = pyramid[0].dtype
            sizes = [f.shape[-1] for f in pyramid]
            offs = np.concatenate([[0], np.cumsum(sizes)]).tolist()
            total = offs[-1]

            def fcn1_pre(d):
                # bias-free per-level projections: recover fcn1's kernel
                # as d(I) - bias (a one-off 768x768 @ 768xK matmul) and
                # apply each level's 256-row slice directly — this avoids
                # materializing 768-channel zero-padded copies of every
                # pyramid level (which overflowed HBM at KITTI shapes).
                # Bias is stripped so invalid points can be zeroed
                # exactly (d(0) == bias, matching zeroed gathered rows).
                bias = d(jnp.zeros((total,), dt))
                kernel = d(jnp.eye(total, dtype=dt)) - bias
                proj = tuple(f @ kernel[offs[l]:offs[l + 1]]
                             for l, f in enumerate(pyramid))
                s = jax.vmap(
                    lambda fs, rc, okm: projected_bilinear_gather_fpn(
                        fs, rc, okm, self.image_size, eps=self.eps,
                        swapped_weights=self.swapped_bilerp)
                )(proj, points_rc, point_mask)
                return s + bias

            placeholder = jnp.zeros(point_mask.shape + (total,), dt)
            return PointImageFusion(self.eps, name="fusion")(
                placeholder, point_mask, n_virtual, fcn1_pre_fn=fcn1_pre)

        gathered = jax.vmap(
            lambda feats, rc, ok: bilinear_gather_fpn(
                feats, rc, ok, self.image_size, eps=self.eps,
                swapped_weights=self.swapped_bilerp,
                fused_coarse=(backend == "xla_fused"))
        )(pyramid, points_rc, point_mask)
        return PointImageFusion(self.eps, name="fusion")(
            gathered, point_mask, n_virtual)


class ImageHead(nn.Module):
    """Frozen FPN extractor + per-point gather + trainable fusion
    (reference Head.py:4-21)."""
    image_size: Tuple[int, int] = (370, 1224)
    eps: float = 1e-6
    swapped_bilerp: bool = False

    @nn.compact
    def __call__(self, images: jnp.ndarray, points_rc: jnp.ndarray,
                 point_valid: jnp.ndarray,
                 voxel_mask: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) in [0, 1]; points_rc: (B, V, T, 2) image
        (row, col) per sample point; point_valid: (B, V, T) bool;
        voxel_mask: (B, V).  Returns (B, V, T, 16)."""
        import jax

        x = jax.vmap(detection_transform)(images)
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
        # the same (Pipe.py:41-45), so keep its convention.
        gathered = jax.vmap(
            lambda feats, rc, ok: bilinear_gather_fpn(
                feats, rc, ok, self.image_size, eps=self.eps,
                swapped_weights=self.swapped_bilerp)
        )(pyramid, points_rc, point_valid)
        # (B, V, T, 768)
        return ImageFeatureFusion(self.eps, name="fusion")(
            gathered, voxel_mask)
