"""Rotated BEV non-maximum suppression (static-shape, jit-able).

The reference commits no NMS/inference code (SURVEY.md §6 — its eval
scripts are gitignored); this implements the standard greedy rotated-BEV
NMS needed by the detector head.

TPU-native design: instead of a data-dependent while loop over surviving
boxes, we (1) take the static top-K boxes by score, (2) compute the full
K x K rotated IoU matrix in one batched pass (the clipper in
geometry.boxes), then (3) run a K-step ``fori_loop`` whose carry is a
K-length keep mask — O(K^2) work but fully vectorized and compiled once.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.geometry.boxes import rotated_iou_bev


def rotated_nms_bev(boxes: jnp.ndarray,
                    scores: jnp.ndarray,
                    *,
                    iou_threshold: float = 0.1,
                    score_threshold: float = 0.0,
                    pre_max_size: int = 256,
                    post_max_size: int = 64,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy rotated NMS.

    Args:
      boxes: (N, 7) xyzlwhr.
      scores: (N,).

    Returns:
      (indices (post_max_size,) into the input, scores (post_max_size,),
       valid (post_max_size,) bool) — padded with index 0 / score 0 where
      invalid.
    """
    N = boxes.shape[0]
    K = min(pre_max_size, N)
    top_scores, top_idx = jax.lax.top_k(scores, K)
    top_boxes = boxes[top_idx]
    alive = top_scores > score_threshold

    iou = rotated_iou_bev(top_boxes, top_boxes)              # (K, K)

    def body(i, keep):
        # keep box i iff still alive; then kill overlapping lower-scored
        kept_i = keep[i]
        suppress = (iou[i] > iou_threshold) & (jnp.arange(K) > i) & kept_i
        return jnp.where(suppress, False, keep)

    keep = jax.lax.fori_loop(0, K, body, alive)

    # compact kept indices to the front (stable), cap at post_max_size
    order = jnp.argsort(jnp.logical_not(keep), stable=True)
    kept_sorted = keep[order]
    sel = order[:post_max_size]
    valid = kept_sorted[:post_max_size]
    out_idx = jnp.where(valid, top_idx[sel], 0)
    out_scores = jnp.where(valid, top_scores[sel], 0.0)
    return out_idx, out_scores, valid
