"""Per-point bilinear gather from FPN feature pyramids (MVX PointFusion).

Reference: ``featureMaping`` (/root/reference/modules/imhead/Pipe.py:23-82):
for every voxel sample point, bilinearly interpolate each FPN level at the
point's image-plane projection and concatenate the levels.

TPU-native design:
  * one fused gather per level over the *flattened* point list —
    (V*T,) indices into (Hf*Wf, C) feature tables; XLA lowers this to an
    efficient dynamic-gather, and the 4-tap interpolation is plain VPU
    math fused around it;
  * the reference's projection-bounds ``assert`` (Pipe.py:71) becomes a
    clamp: padded/invalid points are masked to zero anyway;
  * the reference's bilinear weights are *swapped* vs the textbook formula
    (``f[x, y] * xi * yi`` instead of ``* (1-xi) * (1-yi)``,
    Pipe.py:72-75).  Default here is the textbook version;
    ``swapped_weights=True`` reproduces the reference for checkpoint
    parity (SURVEY.md §7).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def bilinear_gather_fpn(features: Sequence[jnp.ndarray],
                        points_rc: jnp.ndarray,
                        valid: jnp.ndarray,
                        image_size: Sequence[int],
                        *,
                        eps: float = 1e-6,
                        swapped_weights: bool = False,
                        patch_mode: bool = True) -> jnp.ndarray:
    """Gather multi-level image features at projected point locations.

    Args:
      features: list of (Hf, Wf, C) feature maps (channels-last).
      points_rc: (..., 2) image coordinates as (row, col) in *original*
        image pixels (the layout voxel channels 7-8 carry, train.py:33).
      valid: (...,) bool — zero-points/padding mask
        (Pipe.py:53-59 zero-point handling).
      image_size: (h, w) original image size.

    Returns:
      (..., sum_of_level_channels) gathered features; invalid points 0.
    """
    im_h, im_w = image_size
    lead = points_rc.shape[:-1]
    rc = points_rc.reshape(-1, 2)
    ok = valid.reshape(-1)

    outs = []
    for feat in features:
        Hf, Wf, C = feat.shape
        # region size maps original-image pixels to feature cells
        # (Pipe.py:41-45)
        ry = im_h / Hf
        rx = im_w / Wf
        r = rc[:, 0] / ry - eps
        c = rc[:, 1] / rx - eps
        r = jnp.clip(r, 0.0, Hf - 1.0)
        c = jnp.clip(c, 0.0, Wf - 1.0)
        r0 = jnp.floor(r).astype(jnp.int32)
        c0 = jnp.floor(c).astype(jnp.int32)
        # weights in the feature dtype so bf16 pipelines stay bf16 (the
        # index math above stays in the input precision)
        fr = (r - r0.astype(r.dtype))[:, None].astype(feat.dtype)
        fc = (c - c0.astype(c.dtype))[:, None].astype(feat.dtype)
        r1 = jnp.minimum(r0 + 1, Hf - 1)
        c1 = jnp.minimum(c0 + 1, Wf - 1)

        if patch_mode:
            # one gather of a precomputed 2x2-patch table instead of four
            # row gathers: same bytes, 4x fewer gather rows — XLA's TPU
            # gather is row-count-bound, so this is ~3-4x faster (v5e).
            # The patch table rolls the feature map down/right with edge
            # clamping, matching the r1/c1 = min(+1, edge) taps below.
            down = jnp.concatenate([feat[1:], feat[-1:]], axis=0)
            patch = jnp.concatenate([
                feat,
                down,
                jnp.concatenate([feat[:, 1:], feat[:, -1:]], axis=1),
                jnp.concatenate([down[:, 1:], down[:, -1:]], axis=1),
            ], axis=-1).reshape(Hf * Wf, 4 * C)
            rows = patch[r0 * Wf + c0]
            f00 = rows[:, 0 * C:1 * C]
            f10 = rows[:, 1 * C:2 * C]
            f01 = rows[:, 2 * C:3 * C]
            f11 = rows[:, 3 * C:4 * C]
        else:
            table = feat.reshape(Hf * Wf, C)
            f00 = table[r0 * Wf + c0]
            f10 = table[r1 * Wf + c0]
            f01 = table[r0 * Wf + c1]
            f11 = table[r1 * Wf + c1]

        if swapped_weights:
            # reference Pipe.py:72-75 exact weights
            out = (f00 * fr * fc + f10 * (1 - fr) * fc
                   + f01 * fr * (1 - fc) + f11 * (1 - fr) * (1 - fc))
        else:
            out = (f00 * (1 - fr) * (1 - fc) + f10 * fr * (1 - fc)
                   + f01 * (1 - fr) * fc + f11 * fr * fc)
        outs.append(out)

    gathered = jnp.concatenate(outs, axis=-1)
    gathered = jnp.where(ok[:, None], gathered, 0.0)
    return gathered.reshape(lead + (gathered.shape[-1],))
