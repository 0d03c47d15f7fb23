"""Detection loss — mask-based, static-shape version of the reference's
``VoxelLoss`` (/root/reference/modules/voxelnet/Loss.py, SURVEY.md §2 C12,
§3.4).

Semantics preserved exactly (verified term by term against Loss.py:15-45):

  * positive term: sum of ``-log(score + eps)`` over positive anchors,
    normalized by ``num_pos + eps``; weight a = 1.5;
  * negative term: sum of ``-log(1 - score + eps)`` over all anchors *not*
    in the "not-negative" set (IoU >= neg_thr, a superset of positives —
    voxelutil.cpp:168-184), normalized by ``total - num_not_neg + eps``;
    weight b = 1;
  * a frame with no GT boxes reduces to ``mean(-log(1 - score + eps))``
    (Loss.py:17-19) — with empty masks our formula degenerates to exactly
    that, so there is no separate branch (jit-friendly);
  * regression: smooth-L1 (beta=1) between the predicted deltas and the
    encoded GT-vs-anchor targets (Loss.py:32-43), averaged over
    ``num_pos * 7`` elements; zero when there are no positives (the
    reference returns None and skips the add, train.py:145).

The only intended divergence: the reference's index lists can contain the
same anchor twice when two GTs both qualify, double-counting it in the
sums and normalizers; dense masks count each anchor once (see
ops/assign.py docstring).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax.numpy as jnp

from mvxnet_makise_tpu.geometry.boxes import encode_boxes
from mvxnet_makise_tpu.ops.assign import AnchorTargets


def smooth_l1(pred: jnp.ndarray, target: jnp.ndarray,
              beta: float = 1.0) -> jnp.ndarray:
    """Elementwise smooth-L1 (torch SmoothL1Loss semantics, beta=1)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta)


def voxel_loss(score: jnp.ndarray,
               reg: jnp.ndarray,
               targets: AnchorTargets,
               gt_boxes: jnp.ndarray,
               anchors: jnp.ndarray,
               *,
               pos_weight: float = 1.5,
               neg_weight: float = 1.0,
               eps: float = 1e-6,
               mode: str = "reference",
               focal_gamma: float = 2.0,
               focal_alpha: float = 0.25,
               ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Single-frame detection loss.

    Args:
      score: (H, W, A) sigmoid scores.
      reg: (H, W, A * 7) regression map.
      targets: dense assignment masks for this frame.
      gt_boxes: (G, 7) padded GT boxes (rows indexed by targets.gt_index).
      anchors: (H, W, A, 7) anchor boxes.

    Returns (total_loss, metrics dict with cls/reg components).
    """
    H, W, A = score.shape
    pos = targets.pos
    not_neg = targets.ignore

    num_pos = jnp.sum(pos)
    num_not_neg = jnp.sum(not_neg)
    total = H * W * A

    pos_nll = -jnp.log(score + eps)
    neg_nll = -jnp.log(1.0 - score + eps)

    if mode == "focal":
        # Sigmoid focal loss, SECOND / PointPillars semantics: both the
        # positive and the negative term are normalized by num_pos, so a
        # negative anchor's gradient is not diluted by the ~Nneg/Npos
        # ratio of the reference normalization.  (Lin et al. 2017 focal
        # loss; framework extension — not in the reference.)
        pos_focal = focal_alpha * (1.0 - score) ** focal_gamma * pos_nll
        neg_focal = (1.0 - focal_alpha) * score ** focal_gamma * neg_nll
        denom = jnp.maximum(num_pos, 1.0)
        pos_loss = jnp.sum(jnp.where(pos, pos_focal, 0.0)) / denom
        neg_loss = jnp.sum(jnp.where(not_neg, 0.0, neg_focal)) / denom
        cls_loss = pos_weight * pos_loss + neg_weight * neg_loss
    elif mode == "reference":
        pos_loss = jnp.sum(jnp.where(pos, pos_nll, 0.0)) / (num_pos + eps)
        neg_loss = jnp.sum(jnp.where(not_neg, 0.0, neg_nll)) / (
            total - num_not_neg + eps)
        cls_loss = pos_weight * pos_loss + neg_weight * neg_loss
    else:
        raise ValueError(f"unknown cls_loss_mode {mode!r}")

    # regression over positive anchors
    reg = reg.reshape(H, W, A, -1)
    gi = jnp.clip(targets.gt_index, 0, gt_boxes.shape[0] - 1)
    matched_gt = gt_boxes[gi]                           # (H, W, A, 7)
    deltas = encode_boxes(matched_gt, anchors)          # (H, W, A, 7)
    per_elem = smooth_l1(reg, deltas)
    reg_loss = jnp.sum(
        jnp.where(pos[..., None], per_elem, 0.0)) / (
        jnp.maximum(num_pos, 1) * deltas.shape[-1])
    reg_loss = jnp.where(num_pos > 0, reg_loss, 0.0)

    metrics = {
        "cls_loss": cls_loss,
        "reg_loss": reg_loss,
        "num_pos": num_pos,
        "num_not_neg": num_not_neg,
    }
    return cls_loss + reg_loss, metrics
