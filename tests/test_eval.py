"""Eval subsystem tests: 3D IoU, decode+NMS roundtrip, AP protocol."""

import numpy as np
import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.geometry.boxes import (
    encode_boxes,
    rotated_iou_3d,
)
from mvxnet_makise_tpu.ops import create_anchors
from mvxnet_makise_tpu.eval import (
    average_precision_3d,
    decode_predictions,
    evaluate_frames,
)
from mvxnet_makise_tpu.eval.decode import decode_batch

CFG = Config()


def test_iou3d_identical_and_disjoint():
    b = jnp.array([[10.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.4]])
    iou = np.asarray(rotated_iou_3d(b, b))
    np.testing.assert_allclose(iou, [[1.0]], rtol=1e-5)
    b2 = b.at[0, 2].add(5.0)  # same BEV footprint, no z overlap
    np.testing.assert_allclose(np.asarray(rotated_iou_3d(b, b2)), [[0.0]])


def test_iou3d_half_height_overlap():
    b1 = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b2 = jnp.array([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    # overlap volume 4*1=4, union 8+8-4=12
    np.testing.assert_allclose(
        np.asarray(rotated_iou_3d(b1, b2)), [[4 / 12]], rtol=1e-5)


def test_decode_recovers_planted_boxes():
    """Plant GT boxes, build a perfect (score, reg) map, decode, and check
    the detections reproduce the GTs."""
    anchors = jnp.asarray(create_anchors(
        CFG.feature_map_shape, CFG.velo_range, CFG.car_size))
    H, W, A, _ = anchors.shape
    gt = jnp.asarray(np.array([
        [20.2, 5.1, -1.5, 4.0, 1.7, 1.5, 0.3],
        [50.0, -10.0, -1.6, 3.8, 1.6, 1.5, 1.2],
    ], dtype=np.float32))

    # pick the nearest anchor cell for each gt, yaw slot 0
    score = np.zeros((H, W, A), dtype=np.float32)
    reg = np.zeros((H, W, A, 7), dtype=np.float32)
    for g in np.asarray(gt):
        i = int((g[0] - CFG.velo_range[0]) / 0.4)
        j = int((g[1] - CFG.velo_range[1]) / 0.4)
        score[i, j, 0] = 0.95
        reg[i, j, 0] = np.asarray(encode_boxes(
            jnp.asarray(g[None]), anchors[i, j, 0][None]))[0]

    det = decode_predictions(
        jnp.asarray(score), jnp.asarray(reg.reshape(H, W, A * 7)), anchors,
        score_threshold=0.5)
    boxes = np.asarray(det.boxes)[np.asarray(det.valid)]
    assert len(boxes) == 2
    boxes = boxes[np.argsort(boxes[:, 0])]
    np.testing.assert_allclose(boxes, np.asarray(gt), rtol=1e-3, atol=1e-3)


def test_ap_perfect_and_empty():
    gt = [np.array([[10, 0, -1, 4, 2, 1.5, 0.0]], np.float32),
          np.array([[30, 5, -1, 4, 2, 1.5, 0.5]], np.float32)]
    # perfect detections
    dets = [(g.copy(), np.array([0.9], np.float32)) for g in gt]
    res = average_precision_3d(dets, gt)
    np.testing.assert_allclose(res["ap"], 1.0, atol=1e-6)
    assert res["num_gt"] == 2

    # no detections
    res0 = average_precision_3d(
        [(np.zeros((0, 7), np.float32), np.zeros(0, np.float32))] * 2, gt)
    assert res0["ap"] == 0.0


def test_ap_false_positives_reduce_precision():
    gt = [np.array([[10, 0, -1, 4, 2, 1.5, 0.0]], np.float32)]
    fp = np.array([[40, 10, -1, 4, 2, 1.5, 0.0]], np.float32)
    dets = [(np.concatenate([gt[0], fp]),
             np.array([0.9, 0.8], np.float32))]
    res = average_precision_3d(dets, gt)
    # recall 1 reached with one FP after the TP: AP stays 1.0 (R40 takes
    # max precision at each recall level, and TP comes first)
    np.testing.assert_allclose(res["ap"], 1.0, atol=1e-6)
    # reversed scores: FP first -> precision at recall 1 is 0.5
    dets = [(np.concatenate([fp, gt[0]]),
             np.array([0.9, 0.8], np.float32))]
    res = average_precision_3d(dets, gt)
    assert res["ap"] < 0.6


def test_ap_duplicate_detections_one_tp():
    gt = [np.array([[10, 0, -1, 4, 2, 1.5, 0.0]], np.float32)]
    dets = [(np.concatenate([gt[0], gt[0]]),
             np.array([0.9, 0.8], np.float32))]
    res = average_precision_3d(dets, gt)
    assert res["num_det"] == 2
    # second hit on the same GT is a FP (greedy matching takes the GT)
    np.testing.assert_allclose(res["recall"], 1.0)
    np.testing.assert_allclose(res["precision"], 0.5)


def test_ap_ignored_gts_neutral():
    """Dets matching an ignored GT are neither TP nor FP (KITTI ignore
    semantics for out-of-difficulty objects)."""
    gt = [np.array([[10, 0, -1, 4, 2, 1.5, 0.0],
                    [30, 5, -1, 4, 2, 1.5, 0.0]], np.float32)]
    ignored = [np.array([False, True])]
    # detect both
    dets = [(gt[0].copy(), np.array([0.9, 0.8], np.float32))]
    res = average_precision_3d(dets, gt, gt_ignored=ignored)
    assert res["num_gt"] == 1          # only the counted GT
    np.testing.assert_allclose(res["ap"], 1.0, atol=1e-6)
    np.testing.assert_allclose(res["precision"], 1.0)  # no FP counted
    assert res["num_det"] == 1         # ignored match dropped


def test_evaluate_frames_batched(rng):
    anchors = jnp.asarray(create_anchors(
        CFG.feature_map_shape, CFG.velo_range, CFG.car_size))
    H, W, A, _ = anchors.shape
    B = 2
    score = jnp.asarray(rng.uniform(0, 0.2, (B, H, W, A)).astype(np.float32))
    reg = jnp.zeros((B, H, W, A * 7), jnp.float32)
    decoded = decode_batch(score, reg, anchors, score_threshold=0.5)
    gt = np.zeros((B, 4, 7), np.float32)
    gt[..., 3:6] = 1.0
    mask = np.zeros((B, 4), bool)
    mask[0, 0] = True
    res = evaluate_frames(decoded, gt, mask)
    assert res["num_gt"] == 1
    assert res["ap"] == 0.0  # no detections above threshold
