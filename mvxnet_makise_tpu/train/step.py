"""Jit-compiled train / eval steps over batched frames.

The reference iterates samples one at a time with host-side target
assignment (train.py:110-164, cputask train.py:26-49).  Here the whole
step — anchor assignment, forward, loss, backward, AdamW update — is one
XLA program over a real batch axis; assignment runs *on device* (it is a
few thousand rotated-IoU clips, nothing for a TPU).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.ops.assign import assign_anchor_targets
from mvxnet_makise_tpu.train.loss import voxel_loss
from mvxnet_makise_tpu.train.state import TrainState, cast_for_compute


def cast_batch_for_compute(batch: "Batch", use_bf16: bool) -> "Batch":
    """Precision-aware batch casting for bf16 compute.

    Only dense activations are downcast (slot voxels, images); tensors
    carrying *geometry* — raw point coordinates and image projections
    (points / sorted_points) — stay f32: bf16 has 7 mantissa bits, which
    is +-8 px at column ~1000 and +-0.25 m at x ~70 m.  Models cast the
    derived features to the compute dtype after the geometry is consumed.
    """
    if not use_bf16:
        return batch
    def cast(x):
        return x.astype(jnp.bfloat16) \
            if x is not None and jnp.issubdtype(x.dtype, jnp.floating) \
            else x
    return batch._replace(voxels=cast(batch.voxels),
                          images=cast(batch.images))


class Batch(NamedTuple):
    """One device batch of preprocessed frames (all static shapes)."""
    voxels: jnp.ndarray    # (B, V, T, 9)
    coords: jnp.ndarray    # (B, V, 3) int32
    vmask: jnp.ndarray     # (B, V) bool
    images: jnp.ndarray    # (B, H, W, 3) float [0,1]; empty for lidar-only
    gt_boxes: jnp.ndarray  # (B, G, 7)
    gt_mask: jnp.ndarray   # (B, G) bool
    gt_classes: jnp.ndarray = None  # (B, G) int32; None = all class 0
    points: jnp.ndarray = None      # (B, P, 6) padded clouds (point fusion)
    point_slots: jnp.ndarray = None  # (B, P) flat slot per point, -1 drop
    # point-major fields (fusion_mode "pm"): voxel-sorted views
    sorted_points: jnp.ndarray = None  # (B, P, 6)
    sorted_kept: jnp.ndarray = None    # (B, P) bool
    sorted_seg: jnp.ndarray = None     # (B, P) int32
    counts: jnp.ndarray = None         # (B, V) int32


def frames_to_batch(points, num_points, images, gt_boxes, gt_mask,
                    cfg: Config, shuffle_key=None,
                    gt_classes=None, point_major=None) -> Batch:
    """Voxelize a batch of padded frames on device (vmapped, jittable).

    points: (B, P, 6); num_points: (B,); images: (B, H, W, 3).
    This is the device half of the input pipeline — host code only pads
    and projects (data/pipeline.py); binning/sampling/centroids happen
    here so they fuse into the same XLA program as the forward pass.
    """
    from mvxnet_makise_tpu.ops.voxelize import voxelize

    B = points.shape[0]
    keys = (jax.random.split(shuffle_key, B)
            if shuffle_key is not None else None)

    if point_major is None:
        point_major = cfg.fusion_mode == "pm"

    def one(p, n, k):
        return voxelize(
            p, n, velo_range=cfg.velo_range, voxel_size=cfg.voxel_size,
            grid_shape=cfg.voxel_shape, max_voxels=cfg.max_voxels,
            samples_per_voxel=cfg.samples_per_voxel, shuffle_key=k,
            slot_features=not point_major)

    if keys is None:
        grids = jax.vmap(lambda p, n: one(p, n, None))(points, num_points)
    else:
        grids = jax.vmap(one)(points, num_points, keys)
    return Batch(voxels=grids.features, coords=grids.coords,
                 vmask=grids.mask, images=images,
                 gt_boxes=gt_boxes, gt_mask=gt_mask,
                 gt_classes=gt_classes, points=points,
                 point_slots=grids.point_slots,
                 sorted_points=grids.sorted_points,
                 sorted_kept=grids.sorted_kept,
                 sorted_seg=grids.sorted_seg,
                 counts=grids.counts)


def _assign_batch(batch: Batch, cfg: Config):
    classes = batch.gt_classes
    if classes is None:
        classes = jnp.zeros(batch.gt_mask.shape, jnp.int32)
    return jax.vmap(lambda b, m, c: assign_anchor_targets(
        b, m, grid_hw=cfg.feature_map_shape, velo_range=cfg.velo_range,
        box_size=cfg.anchor_sizes,
        neg_threshold=cfg.class_neg_thresholds,
        pos_threshold=cfg.class_pos_thresholds,
        window=cfg.assign_window, gt_classes=c,
        best_anchor_fallback=cfg.assign_best_anchor_fallback,
    ))(batch.gt_boxes, batch.gt_mask, classes)


def _model_inputs(batch: Batch, with_images: bool):
    if with_images:
        if batch.voxels is not None and batch.voxels.shape[1] == 0:
            # fully point-major path (models.MVXNetPM)
            return (batch.sorted_points, batch.sorted_kept,
                    batch.sorted_seg, batch.counts, batch.coords,
                    batch.vmask, batch.images)
        if batch.points is not None and batch.point_slots is not None:
            # point-fusion fast path (models.MVXNetPointFusion)
            return (batch.voxels, batch.coords, batch.vmask, batch.images,
                    batch.points, batch.point_slots)
        return (batch.voxels, batch.coords, batch.vmask, batch.images)
    # LiDAR-only config: the branch consumes the 7 LiDAR channels
    # (reference SVFE cin=7 without the 16 image channels, SURVEY.md §7 M3)
    if batch.voxels is not None and batch.voxels.shape[1] == 0:
        # point-major LiDAR branch (VoxelNetBranchPM)
        from mvxnet_makise_tpu.models.voxelnet_pm import (
            point_lidar_features)

        pf7 = jax.vmap(point_lidar_features)(
            batch.sorted_points, batch.sorted_seg, batch.sorted_kept,
            batch.counts)
        return (pf7, batch.sorted_kept, batch.sorted_seg, batch.counts,
                batch.coords, batch.vmask)
    return (batch.voxels[..., :7], batch.coords, batch.vmask)


def compute_loss(params, batch: Batch, targets, anchors, apply_fn,
                 cfg: Config, with_images: bool):
    cparams = cast_for_compute(params, cfg.use_bf16)
    cbatch = cast_batch_for_compute(batch, cfg.use_bf16)
    score, reg = apply_fn(cparams, *_model_inputs(cbatch, with_images))
    score = score.astype(jnp.float32)
    reg = reg.astype(jnp.float32)

    def per_frame(s, r, t, g):
        return voxel_loss(s, r, t, g, jnp.asarray(anchors),
                          pos_weight=cfg.pos_loss_weight,
                          neg_weight=cfg.neg_loss_weight, eps=cfg.eps,
                          mode=cfg.cls_loss_mode,
                          focal_gamma=cfg.focal_gamma,
                          focal_alpha=cfg.focal_alpha)

    losses, metrics = jax.vmap(per_frame)(
        score, reg, targets, batch.gt_boxes)
    return jnp.mean(losses), jax.tree.map(jnp.mean, metrics)


def make_train_step(cfg: Config, anchors, with_images: bool = True):
    """Build the jittable train step.  ``anchors``: (H, W, A, 7)."""

    def train_step(state: TrainState, batch: Batch
                   ) -> Tuple[TrainState, dict]:
        targets = _assign_batch(batch, cfg)

        def loss_fn(params):
            return compute_loss(params, batch, targets, anchors,
                                state.apply_fn, cfg, with_images)

        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)

        # failure containment (SURVEY.md §5: the reference only excludes
        # NaN losses from *statistics*, train.py:142-151; here a
        # non-finite loss additionally skips the parameter update so one
        # bad frame cannot poison the run)
        finite = jnp.isfinite(loss)
        new_state = jax.tree.map(
            lambda new, old: jnp.where(finite, new, old),
            new_state, state)
        metrics = dict(metrics, total_loss=loss,
                       skipped_nonfinite=(~finite).astype(jnp.int32))
        return new_state, metrics

    return train_step


def make_eval_step(cfg: Config, with_images: bool = True):
    """Forward-only step returning (score, reg) maps."""

    def eval_step(params, batch: Batch, apply_fn):
        cparams = cast_for_compute(params, cfg.use_bf16)
        cbatch = cast_batch_for_compute(batch, cfg.use_bf16)
        score, reg = apply_fn(cparams, *_model_inputs(cbatch, with_images))
        return score.astype(jnp.float32), reg.astype(jnp.float32)

    return eval_step
