"""Multi-class closed-loop learning proof.

test_learning.py proves single-class learning end-to-end; this does the
same with three classes in ONE scene: N fused train steps on a fixed
synthetic batch must collapse the loss and decode must recover each
class's GT box — with the right class id — at BEV IoU >= 0.4.
Guards the per-class anchor routing (ops/assign + eval/decode slot
layout) against regressions that per-component tests can miss.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.eval.decode import decode_predictions
from mvxnet_makise_tpu.geometry.boxes_np import bev_corners, iou_bev_corners
from mvxnet_makise_tpu.ops import create_anchors
from mvxnet_makise_tpu.train.loop import (build_model_and_state,
                                          make_full_train_step)
from mvxnet_makise_tpu.train.step import frames_to_batch, make_eval_step

CFG = Config(
    velo_range=(0.0, -8.0, -3.0, 12.8, 8.0, 1.0),
    voxel_shape=(32, 32, 10),
    image_size=(32, 48),
    max_points=1024, max_voxels=448, max_boxes=4,
    samples_per_voxel=8, assign_window=6,
    batch_size=1, learning_rate=2e-3,
    fusion_mode="pm",
    target_classes=("Car", "Pedestrian", "Cyclist"))

# one object per class, on anchor-cell centres (x = 0.4 + 0.8k,
# y = -7.5 + 1.0m), far enough apart that windows don't collide
_GT = np.array([
    [6.0, -4.5, -1.6, 3.9, 1.6, 1.56, 0.0],     # Car
    [8.4, 2.5, -1.7, 0.8, 0.6, 1.73, 0.0],      # Pedestrian
    [3.6, 3.5, -1.7, 1.76, 0.6, 1.73, 0.0],     # Cyclist
], dtype=np.float32)


def _one_batch():
    rng = np.random.default_rng(0)
    P = CFG.max_points
    pts = np.zeros((1, P, 6), np.float32)
    clouds = []
    for b in _GT:
        n_box = 220
        local = rng.uniform(-0.5, 0.5, (n_box, 3)).astype(np.float32)
        face = rng.integers(0, 3, n_box)
        local[np.arange(n_box), face] = rng.choice([-0.5, 0.5], n_box)
        local *= b[3:6]
        c, s = np.cos(b[6]), np.sin(b[6])
        rx = local[:, 0] * c + local[:, 1] * s
        ry = -local[:, 0] * s + local[:, 1] * c
        clouds.append(np.stack(
            [rx + b[0], ry + b[1], local[:, 2] + b[2] + b[5] / 2],
            axis=1))
    n_bg = 160
    clouds.append(np.stack([
        rng.uniform(0.5, 12.5, n_bg),
        rng.uniform(-7.5, 7.5, n_bg),
        rng.normal(-1.7, 0.05, n_bg)], axis=1))
    cloud = np.concatenate(clouds).astype(np.float32)
    np.clip(cloud, (0.0, -8.0, -3.0),
            (12.8 - 1e-3, 8.0 - 1e-3, 1.0 - 1e-3), out=cloud)
    n = len(cloud)
    pts[0, :n, :3] = cloud
    pts[0, :n, 3] = rng.uniform(0, 1, n)
    num = np.full((1,), n, np.int32)
    gt_pad = np.zeros((1, CFG.max_boxes, 7), np.float32)
    gt_pad[0, :3] = _GT
    gmask = np.zeros((1, CFG.max_boxes), bool)
    gmask[0, :3] = True
    gcls = np.zeros((1, CFG.max_boxes), np.int32)
    gcls[0, :3] = [0, 1, 2]
    images = np.zeros((1, 1, 1, 3), np.float32)
    return (jnp.asarray(pts), jnp.asarray(num), jnp.asarray(images),
            jnp.asarray(gt_pad), jnp.asarray(gmask), jnp.asarray(gcls))


@pytest.mark.slow
def test_multiclass_overfit_recovers_each_class():
    anchors = create_anchors(CFG.feature_map_shape, CFG.velo_range,
                             CFG.anchor_sizes)
    model, state = build_model_and_state(CFG, with_images=False)
    step = make_full_train_step(CFG, anchors, with_images=False)
    pts, num, images, gt, gmask, gcls = _one_batch()

    key = jax.random.key(1)
    losses = []
    best = (np.inf, None)
    for it in range(300):
        state, metrics = step(state, pts, num, images, gt, gmask, gcls,
                              key)
        tot = float(metrics["total_loss"])
        losses.append(tot)
        sel = tot + 3.0 * float(metrics["reg_loss"])
        if sel < best[0]:
            best = (sel, jax.tree.map(np.asarray, state.params))
    assert np.isfinite(losses).all()
    assert min(losses) < 0.25 * losses[0], (losses[0], min(losses))
    state = state.replace(params=jax.tree.map(jnp.asarray, best[1]))

    batch = frames_to_batch(pts, num, images, gt, gmask, CFG,
                            gt_classes=gcls)
    eval_step = jax.jit(
        lambda p, b: make_eval_step(CFG, with_images=False)(
            p, b, model.apply))
    score, reg = eval_step(state.params, batch)

    det = jax.tree.map(np.asarray, decode_predictions(
        score[0], reg[0], jnp.asarray(anchors),
        score_threshold=0.3, nms_iou_threshold=0.1,
        pre_max_size=64, post_max_size=16))
    assert det.valid.any(), "no confident detection at all"
    for ci in range(3):
        ious = np.array([
            iou_bev_corners(bev_corners(det.boxes[k][None]),
                            bev_corners(_GT[ci][None]))[0, 0]
            if det.valid[k] and det.classes[k] == ci else 0.0
            for k in range(len(det.boxes))])
        k = int(np.argmax(ious))
        # 3-class convergence is slower than the single-class proof
        # (measured: loss 2.15 -> 0.27 over 400 steps at lr 1e-3);
        # IoU 0.4 with the right class id already requires correct
        # per-class anchor routing, which is what this test guards
        assert ious[k] >= 0.4, (
            f"class {ci}: best IoU {ious.max():.3f}",
            det.boxes[det.valid][:5], det.classes[det.valid][:5])
