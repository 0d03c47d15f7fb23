"""Dense windowed assignment vs a spiral-walk oracle.

The reference classifies anchors by walking outward from each GT's
centre cell with an early exit once IoU drops below 0.1
(voxelutil.cpp:138-316; python twin Calc.py:98-204).  Our dense window
claims to mark exactly the same anchors (quasi-concavity of IoU along
rays — ops/assign.py docstring).  This test re-implements the *visit
semantics* as an independent numpy oracle (row/column walks with the
0.1 break, ascending-GT overwrite for gi) using the rasterization IoU
from test_geometry — no shared code with the JAX path — and checks the
outputs agree on random scenes.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.ops import assign_anchor_targets, create_anchors
from mvxnet_makise_tpu.geometry.boxes_np import bev_corners, iou_bev_corners

CFG = Config(
    velo_range=(0.0, -16.0, -3.0, 32.0, 16.0, 1.0),
    voxel_shape=(160, 160, 10), assign_window=12)


def spiral_assign_oracle(gts, grid_hw, velo_range, size,
                         neg_thr, pos_thr):
    """Numpy re-implementation of the reference's spiral visit order."""
    H, W = grid_hw
    x0, y0 = velo_range[0], velo_range[1]
    ls = (velo_range[3] - x0) / H
    ws = (velo_range[4] - y0) / W
    pos = np.zeros((H, W, 2), bool)
    not_neg = np.zeros((H, W, 2), bool)
    gi = np.full((H, W, 2), -1, np.int64)

    anchor_quads = {}

    def iou_at(h, w, z, gt_quad, gt_area):
        key = (h, w, z)
        if key not in anchor_quads:
            yaw = 0.0 if z == 0 else np.pi / 2
            box = np.array([x0 + ls / 2 + h * ls, y0 + ws / 2 + w * ws,
                            -1.0, size[0], size[1], size[2], yaw],
                           np.float32)
            anchor_quads[key] = bev_corners(box[None])[0]
        q = anchor_quads[key]
        return float(iou_bev_corners(gt_quad[None], q[None])[0, 0])

    a_area = size[0] * size[1]
    for g, gt in enumerate(gts):
        nl = int(np.floor((gt[0] - x0 - ls / 2) / ls + 0.5))
        nw = int(np.floor((gt[1] - y0 - ws / 2) / ws + 0.5))
        quad = bev_corners(gt[None])[0]
        area = gt[3] * gt[4]
        for z in range(2):
            for hdir in (1, -1):
                h = 0 if hdir == 1 else -1
                while 0 <= nl + h < H:
                    iou = iou_at(nl + h, nw, z, quad, area)
                    if iou < 0.1:
                        break
                    _mark(pos, not_neg, gi, nl + h, nw, z, g, iou,
                          neg_thr, pos_thr)
                    for vdir in (1, -1):
                        v = vdir
                        while 0 <= nw + v < W:
                            iou = iou_at(nl + h, nw + v, z, quad, area)
                            if iou < 0.1:
                                break
                            _mark(pos, not_neg, gi, nl + h, nw + v, z,
                                  g, iou, neg_thr, pos_thr)
                            v += vdir
                    h += hdir
    return pos, not_neg, gi


def _mark(pos, not_neg, gi, h, w, z, g, iou, neg_thr, pos_thr):
    if iou >= pos_thr:
        pos[h, w, z] = True
        gi[h, w, z] = g       # ascending overwrite: last writer wins
        not_neg[h, w, z] = True
    elif iou >= neg_thr:
        not_neg[h, w, z] = True


def test_dense_assignment_matches_spiral_oracle():
    rng = np.random.default_rng(7)
    G = 5
    gts = np.zeros((G, 7), np.float32)
    gts[:, 0] = rng.uniform(4, 28, G)
    gts[:, 1] = rng.uniform(-12, 12, G)
    gts[:, 2] = -1.0
    gts[:, 3:6] = np.array(CFG.car_size) * rng.uniform(0.9, 1.2, (G, 3))
    gts[:, 6] = rng.uniform(-np.pi, np.pi, G)

    t = jax.tree.map(np.asarray, assign_anchor_targets(
        jnp.asarray(gts), jnp.ones(G, bool),
        grid_hw=CFG.feature_map_shape, velo_range=CFG.velo_range,
        box_size=CFG.car_size, neg_threshold=CFG.neg_iou_threshold,
        pos_threshold=CFG.pos_iou_threshold, window=CFG.assign_window))

    pos, not_neg, gi = spiral_assign_oracle(
        gts, CFG.feature_map_shape, CFG.velo_range, CFG.car_size,
        CFG.neg_iou_threshold, CFG.pos_iou_threshold)

    assert pos.sum() > 0 and not_neg.sum() > pos.sum()
    np.testing.assert_array_equal(t.pos, pos)
    np.testing.assert_array_equal(t.ignore, not_neg)
    # matched gt index agrees wherever positive
    np.testing.assert_array_equal(t.gt_index[pos], gi[pos])


def _full_grid_assign(gts, grid_hw, velo_range, size, neg_thr, pos_thr):
    """Unwindowed oracle: IoU of every GT against EVERY anchor cell."""
    from mvxnet_makise_tpu.ops.assign import create_anchors

    anchors = create_anchors(grid_hw, velo_range, size)      # (H, W, 2, 7)
    H, W, A, _ = anchors.shape
    aq = bev_corners(anchors.reshape(-1, 7))                 # (HWA, 4, 2)
    gq = bev_corners(gts)                                    # (G, 4, 2)
    iou = iou_bev_corners(gq, aq).reshape(len(gts), H, W, A)
    pos = (iou >= pos_thr).any(0)
    ign = (iou >= neg_thr).any(0)
    gi = np.where(iou >= pos_thr,
                  np.arange(len(gts))[:, None, None, None], -1).max(0)
    return pos, ign, gi


def test_window_guard_raises_on_undersized_window():
    import pytest

    from mvxnet_makise_tpu.ops.assign import min_assign_window

    req = min_assign_window(CFG.feature_map_shape, CFG.velo_range,
                            CFG.car_size, CFG.neg_iou_threshold)
    assert req > 1
    with pytest.raises(ValueError, match="under-covers"):
        assign_anchor_targets(
            jnp.zeros((1, 7)), jnp.ones(1, bool),
            grid_hw=CFG.feature_map_shape, velo_range=CFG.velo_range,
            box_size=CFG.car_size, neg_threshold=CFG.neg_iou_threshold,
            pos_threshold=CFG.pos_iou_threshold, window=req - 1)
    with pytest.raises(ValueError, match="under-covers"):
        Config(assign_window=3)


def test_min_window_covers_oversized_boxes():
    """Property: with window >= min_assign_window, windowed assignment
    equals the unwindowed full-grid pass even for GTs much larger than
    the anchor footprint (the failure mode the guard exists for)."""
    from mvxnet_makise_tpu.ops.assign import min_assign_window

    grid_hw = (48, 48)
    vr = (0.0, -9.6, -3.0, 19.2, 9.6, 1.0)  # 0.4 m cells
    size = CFG.car_size
    rng = np.random.default_rng(3)
    G = 6
    gts = np.zeros((G, 7), np.float32)
    gts[:, 0] = rng.uniform(3, 16, G)
    gts[:, 1] = rng.uniform(-7, 7, G)
    gts[:, 2] = -1.0
    # oversized in length (up to 2x); IoU >= neg_thr needs combined area
    # scale <= 1/neg_thr, so widths stay near 1x — the regime where the
    # qualifying ring extends furthest from the centre cell
    gts[:, 3] = size[0] * rng.uniform(1.3, 2.0, G)
    gts[:, 4] = size[1] * rng.uniform(0.95, 1.1, G)
    gts[:, 5] = size[2]
    gts[:, 6] = rng.uniform(-np.pi, np.pi, G)
    gts[::2, 6] = rng.uniform(-0.2, 0.2, len(gts[::2]))

    req = min_assign_window(grid_hw, vr, size, CFG.neg_iou_threshold)
    t = jax.tree.map(np.asarray, assign_anchor_targets(
        jnp.asarray(gts), jnp.ones(G, bool),
        grid_hw=grid_hw, velo_range=vr, box_size=size,
        neg_threshold=CFG.neg_iou_threshold,
        pos_threshold=CFG.pos_iou_threshold, window=req))

    pos, ign, gi = _full_grid_assign(
        gts, grid_hw, vr, size, CFG.neg_iou_threshold,
        CFG.pos_iou_threshold)
    assert ign.sum() > 0
    np.testing.assert_array_equal(t.pos, pos)
    np.testing.assert_array_equal(t.ignore, ign)
    np.testing.assert_array_equal(t.gt_index[pos], gi[pos])
