"""Tests for assignment, scatter, gather and NMS ops.

The anchor-assignment oracle computes the *full dense* IoU field with the
(independently rasterization-validated) clipper and applies thresholds —
this checks the windowing + scatter logic against an exhaustive pass.
"""

import numpy as np
import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.geometry.boxes import rotated_iou_bev
from mvxnet_makise_tpu.ops import (
    assign_anchor_targets,
    bilinear_gather_fpn,
    bilinear_gather_fpn_batch,
    create_anchors,
    rotated_nms_bev,
    scatter_voxels_to_grid,
)

CFG = Config()


# ---------------------------------------------------------------------------
# anchors
# ---------------------------------------------------------------------------

def test_create_anchors_layout():
    a = create_anchors(CFG.feature_map_shape, CFG.velo_range, CFG.car_size)
    assert a.shape == (176, 200, 2, 7)
    # first cell centre: x0 + stride/2 (Preprocessing.py:126-128)
    np.testing.assert_allclose(a[0, 0, 0, :2], [0.2, -39.8], atol=1e-5)
    np.testing.assert_allclose(a[-1, -1, 0, :2], [70.2, 39.8], atol=1e-4)
    np.testing.assert_allclose(a[..., 2], -1.0)
    np.testing.assert_allclose(a[..., 3:6], np.tile(CFG.car_size, (176, 200, 2, 1)))
    np.testing.assert_allclose(a[..., 0, 6], 0.0)
    np.testing.assert_allclose(a[..., 1, 6], np.pi / 2)


def _assign(gt, mask):
    return assign_anchor_targets(
        jnp.asarray(gt), jnp.asarray(mask),
        grid_hw=CFG.feature_map_shape, velo_range=CFG.velo_range,
        box_size=CFG.car_size, neg_threshold=CFG.neg_iou_threshold,
        pos_threshold=CFG.pos_iou_threshold, window=CFG.assign_window)


def test_assign_matches_dense_oracle(rng):
    G = 4
    gt = np.zeros((G, 7), dtype=np.float32)
    gt[:, 0] = rng.uniform(5, 65, G)
    gt[:, 1] = rng.uniform(-35, 35, G)
    gt[:, 2] = -1.0
    gt[:, 3:6] = np.array(CFG.car_size) * rng.uniform(0.9, 1.2, (G, 3))
    gt[:, 6] = rng.uniform(-np.pi, np.pi, G)
    mask = np.array([True, True, True, False])

    t = jax.tree.map(np.asarray, _assign(gt, mask))

    anchors = create_anchors(CFG.feature_map_shape, CFG.velo_range,
                             CFG.car_size)
    H, W, A, _ = anchors.shape
    iou = np.asarray(rotated_iou_bev(
        jnp.asarray(gt[:3]), jnp.asarray(anchors.reshape(-1, 7))))
    iou = iou.reshape(3, H, W, A)
    exp_pos = (iou >= CFG.pos_iou_threshold).any(axis=0)
    exp_ign = (iou >= CFG.neg_iou_threshold).any(axis=0)

    np.testing.assert_array_equal(t.pos, exp_pos)
    np.testing.assert_array_equal(t.ignore, exp_ign)
    # positives exist for reasonably-sized GTs and matched index is right
    assert t.pos.sum() > 0
    qual = iou >= CFG.pos_iou_threshold
    exp_gi = np.where(exp_pos, np.argmax(
        qual[::-1], axis=0), -1)  # last qualifying gt
    exp_gi = np.where(exp_pos, 2 - exp_gi, -1)
    np.testing.assert_array_equal(t.gt_index, exp_gi)


def test_assign_no_gt():
    gt = np.zeros((2, 7), dtype=np.float32)
    t = _assign(gt, np.zeros(2, dtype=bool))
    assert not np.asarray(t.pos).any()
    assert not np.asarray(t.ignore).any()
    assert (np.asarray(t.gt_index) == -1).all()


def test_assign_anchor_on_gt_is_positive():
    # GT exactly on an anchor -> IoU 1 at that anchor, yaw 0
    anchors = create_anchors(CFG.feature_map_shape, CFG.velo_range,
                             CFG.car_size)
    gt = anchors[88, 100, 0][None].copy()
    t = _assign(gt, np.ones(1, dtype=bool))
    assert bool(t.pos[88, 100, 0])
    assert int(t.gt_index[88, 100, 0]) == 0
    # perpendicular anchor at same cell: IoU = (1.6*1.6)/(2*3.9*1.6-2.56)
    # ~ 0.26 < 0.45 -> neither pos nor ignored
    assert not bool(t.pos[88, 100, 1])
    assert not bool(t.ignore[88, 100, 1])


# ---------------------------------------------------------------------------
# scatter
# ---------------------------------------------------------------------------

def test_scatter_matches_numpy(rng):
    V, C = 64, 8
    grid_shape = (16, 20, 4)
    feats = rng.normal(size=(V, C)).astype(np.float32)
    coords = np.stack([
        rng.integers(0, 16, V), rng.integers(0, 20, V),
        rng.integers(0, 4, V)], axis=1).astype(np.int32)
    # make coords unique (duplicate scatter order is unspecified)
    _, uniq = np.unique(
        coords[:, 0] * 80 + coords[:, 1] * 4 + coords[:, 2],
        return_index=True)
    mask = np.zeros(V, dtype=bool)
    mask[uniq] = True
    mask[-4:] = False  # padding rows
    coords[~mask] = -1

    out = np.asarray(scatter_voxels_to_grid(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask),
        grid_shape))
    assert out.shape == (4, 16, 20, C)
    expect = np.zeros_like(out)
    for i in range(V):
        if mask[i]:
            x, y, z = coords[i]
            expect[z, x, y] = feats[i]
    np.testing.assert_allclose(out, expect)


# ---------------------------------------------------------------------------
# bilinear gather
# ---------------------------------------------------------------------------

def _numpy_bilerp(feat, r, c, ry, rx, eps=1e-6, swapped=False):
    Hf, Wf, _ = feat.shape
    rr = min(max(r / ry - eps, 0.0), Hf - 1.0)
    cc = min(max(c / rx - eps, 0.0), Wf - 1.0)
    r0, c0 = int(np.floor(rr)), int(np.floor(cc))
    fr, fc = rr - r0, cc - c0
    r1, c1 = min(r0 + 1, Hf - 1), min(c0 + 1, Wf - 1)
    if swapped:
        return (feat[r0, c0] * fr * fc + feat[r1, c0] * (1 - fr) * fc
                + feat[r0, c1] * fr * (1 - fc)
                + feat[r1, c1] * (1 - fr) * (1 - fc))
    return (feat[r0, c0] * (1 - fr) * (1 - fc) + feat[r1, c0] * fr * (1 - fc)
            + feat[r0, c1] * (1 - fr) * fc + feat[r1, c1] * fr * fc)


def test_gather_matches_numpy(rng):
    im_h, im_w = 370, 1224
    feats = [rng.normal(size=(93, 306, 4)).astype(np.float32),
             rng.normal(size=(47, 153, 4)).astype(np.float32)]
    N = 50
    rc = np.stack([rng.uniform(0, im_h - 1, N),
                   rng.uniform(0, im_w - 1, N)], axis=1).astype(np.float32)
    valid = rng.random(N) > 0.2
    for swapped in (False, True):
        out = np.asarray(bilinear_gather_fpn(
            [jnp.asarray(f) for f in feats], jnp.asarray(rc),
            jnp.asarray(valid), (im_h, im_w), swapped_weights=swapped))
        assert out.shape == (N, 8)
        for i in range(N):
            if not valid[i]:
                np.testing.assert_allclose(out[i], 0.0)
                continue
            exp = np.concatenate([
                _numpy_bilerp(f, rc[i, 0], rc[i, 1],
                              im_h / f.shape[0], im_w / f.shape[1],
                              swapped=swapped)
                for f in feats])
            np.testing.assert_allclose(out[i], exp, rtol=1e-4, atol=1e-5)


def test_gather_batch_raw4_matches_vmapped(rng):
    """bilinear_gather_fpn_batch (per-image 4-tap raw gathers, the
    round-4 default) == vmap(bilinear_gather_fpn) bit-for-bit intent,
    both weight conventions, including edge cells and invalid rows."""
    import jax

    im_h, im_w = 370, 1224
    B, P = 3, 64
    feats = [rng.normal(size=(B, 93, 306, 4)).astype(np.float32),
             rng.normal(size=(B, 47, 153, 4)).astype(np.float32),
             rng.normal(size=(B, 24, 77, 4)).astype(np.float32)]
    rc = np.stack([rng.uniform(0, im_h, (B, P)),
                   rng.uniform(0, im_w, (B, P))], axis=-1)
    rc = rc.astype(np.float32)
    rc[:, 0] = [im_h - 1e-4, im_w - 1e-4]   # exact far corner
    rc[:, 1] = 0.0                          # exact origin
    valid = rng.random((B, P)) > 0.2
    for swapped in (False, True):
        ref = np.asarray(jax.vmap(
            lambda fs, r, v: bilinear_gather_fpn(
                fs, r, v, (im_h, im_w), swapped_weights=swapped)
        )(tuple(jnp.asarray(f) for f in feats), jnp.asarray(rc),
          jnp.asarray(valid)))
        out = np.asarray(bilinear_gather_fpn_batch(
            tuple(jnp.asarray(f) for f in feats), jnp.asarray(rc),
            jnp.asarray(valid), (im_h, im_w), swapped_weights=swapped))
        np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_gather_fused_coarse_matches_unfused(rng):
    """xla_fused mode (one wide-row gather for the coarse levels) must
    reproduce the per-level gather: exactly on generic points, and to
    O(eps) tap weight on boundary-sliver points."""
    im_h, im_w = 370, 1224
    # exactly-halving pyramid, like the real (104,336)/(52,168)/(26,84)
    feats = [rng.normal(size=(40, 128, 4)).astype(np.float32),
             rng.normal(size=(20, 64, 4)).astype(np.float32),
             rng.normal(size=(10, 32, 4)).astype(np.float32)]
    N = 200
    rc = np.stack([rng.uniform(0, im_h - 1, N),
                   rng.uniform(0, im_w - 1, N)], axis=1).astype(np.float32)
    # adversarial rows: coordinates landing exactly on (and a hair around)
    # coarse-level cell boundaries, where the ancestor-derived floor can
    # differ from the direct floor inside an O(eps) sliver
    ry2 = im_h / feats[2].shape[0]
    rx2 = im_w / feats[2].shape[1]
    adv = []
    for k in range(1, 8):
        for d in (-2e-6, -1e-6, 0.0, 5e-7, 1e-6, 1.5e-6, 2e-6, 1e-3):
            adv.append([k * ry2 + d * ry2, k * rx2 + d * rx2])
    adv = np.array(adv, dtype=np.float32)
    rc = np.concatenate([rc, adv], axis=0)
    valid = np.ones(len(rc), dtype=bool)
    base = np.asarray(bilinear_gather_fpn(
        [jnp.asarray(f) for f in feats], jnp.asarray(rc),
        jnp.asarray(valid), (im_h, im_w), fused_coarse=False))
    fused = np.asarray(bilinear_gather_fpn(
        [jnp.asarray(f) for f in feats], jnp.asarray(rc),
        jnp.asarray(valid), (im_h, im_w), fused_coarse=True))
    # generic points: bitwise-equal taps, identical arithmetic order
    np.testing.assert_allclose(fused[:N], base[:N], rtol=0, atol=1e-6)
    # sliver points: tap bases may differ by one cell but the mismatched
    # tap carries O(eps) weight (textbook weights vanish there)
    np.testing.assert_allclose(fused[N:], base[N:], rtol=0, atol=1e-4)
    # the swapped-weight variant is discontinuous at cell boundaries, so
    # fused_coarse must fall back to the per-level gather (bit-exact)
    base_sw = np.asarray(bilinear_gather_fpn(
        [jnp.asarray(f) for f in feats], jnp.asarray(rc),
        jnp.asarray(valid), (im_h, im_w), swapped_weights=True,
        fused_coarse=False))
    fused_sw = np.asarray(bilinear_gather_fpn(
        [jnp.asarray(f) for f in feats], jnp.asarray(rc),
        jnp.asarray(valid), (im_h, im_w), swapped_weights=True,
        fused_coarse=True))
    np.testing.assert_array_equal(fused_sw, base_sw)


def test_gather_fused_coarse_skips_non_halving(rng):
    """Non-halving pyramids silently fall back to the per-level path."""
    im_h, im_w = 370, 1224
    feats = [rng.normal(size=(40, 128, 4)).astype(np.float32),
             rng.normal(size=(21, 64, 4)).astype(np.float32),
             rng.normal(size=(10, 32, 4)).astype(np.float32)]
    rc = np.stack([rng.uniform(0, im_h - 1, 16),
                   rng.uniform(0, im_w - 1, 16)], axis=1).astype(np.float32)
    valid = np.ones(16, dtype=bool)
    base = np.asarray(bilinear_gather_fpn(
        [jnp.asarray(f) for f in feats], jnp.asarray(rc),
        jnp.asarray(valid), (im_h, im_w), fused_coarse=False))
    fused = np.asarray(bilinear_gather_fpn(
        [jnp.asarray(f) for f in feats], jnp.asarray(rc),
        jnp.asarray(valid), (im_h, im_w), fused_coarse=True))
    np.testing.assert_array_equal(fused, base)


def test_gather_batch_shape(rng):
    feat = [jnp.asarray(rng.normal(size=(93, 306, 4)).astype(np.float32))]
    rc = jnp.asarray(rng.uniform(0, 300, (10, 35, 2)).astype(np.float32))
    valid = jnp.ones((10, 35), dtype=bool)
    out = bilinear_gather_fpn(feat, rc, valid, (370, 1224))
    assert out.shape == (10, 35, 4)


# ---------------------------------------------------------------------------
# rotated NMS
# ---------------------------------------------------------------------------

def test_nms_suppresses_overlaps():
    boxes = np.array([
        [10.0, 0.0, -1, 4, 2, 1.5, 0.0],
        [10.2, 0.1, -1, 4, 2, 1.5, 0.05],   # heavy overlap with 0
        [30.0, 5.0, -1, 4, 2, 1.5, 1.0],
        [30.1, 5.0, -1, 4, 2, 1.5, 1.0],    # heavy overlap with 2
    ], dtype=np.float32)
    scores = np.array([0.9, 0.8, 0.7, 0.95], dtype=np.float32)
    idx, sc, valid = jax.tree.map(np.asarray, rotated_nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores),
        iou_threshold=0.1, post_max_size=4))
    kept = set(idx[valid].tolist())
    assert kept == {0, 3}
    # scores ordered descending among kept
    assert sc[0] >= sc[1]


def test_nms_score_threshold():
    boxes = np.tile(np.array([[10, 0, -1, 4, 2, 1.5, 0]], np.float32), (3, 1))
    boxes[1, 0] += 20
    boxes[2, 0] += 40
    scores = np.array([0.9, 0.05, 0.5], np.float32)
    idx, _, valid = jax.tree.map(np.asarray, rotated_nms_bev(
        jnp.asarray(boxes), jnp.asarray(scores), score_threshold=0.1,
        post_max_size=3))
    assert set(idx[valid].tolist()) == {0, 2}


# ---------------------------------------------------------------------------
# best-anchor fallback (framework extension, default OFF)
# ---------------------------------------------------------------------------

def test_best_anchor_fallback_rescues_diagonal_gt():
    """A GT at yaw pi/4 reaches no axis-aligned anchor at IoU 0.6 (the
    reference leaves it with zero positives); with the fallback its
    highest-IoU anchor becomes positive and leaves the negative pool."""
    gt = np.zeros((1, 7), np.float32)
    gt[0] = [35.0, 0.0, -1.0, *CFG.car_size, np.pi / 4]
    mask = np.ones(1, bool)

    base = _assign(gt, mask)
    assert int(base.pos.sum()) == 0  # the gap the fallback closes

    fb = assign_anchor_targets(
        jnp.asarray(gt), jnp.asarray(mask),
        grid_hw=CFG.feature_map_shape, velo_range=CFG.velo_range,
        box_size=CFG.car_size, neg_threshold=CFG.neg_iou_threshold,
        pos_threshold=CFG.pos_iou_threshold, window=CFG.assign_window,
        best_anchor_fallback=True)
    assert int(fb.pos.sum()) == 1
    # the fallback anchor is the global best: at the GT centre cell
    ij = np.argwhere(np.asarray(fb.pos))[0]
    anchors = create_anchors(CFG.feature_map_shape, CFG.velo_range,
                             CFG.car_size)
    np.testing.assert_allclose(anchors[ij[0], ij[1], ij[2], :2],
                               gt[0, :2], atol=0.3)
    # positive implies non-negative, and it carries the GT index
    assert bool(fb.ignore[ij[0], ij[1], ij[2]])
    assert int(fb.gt_index[ij[0], ij[1], ij[2]]) == 0


def test_best_anchor_fallback_noop_when_thresholds_met():
    """An axis-aligned GT already has threshold positives; the fallback
    must not change the assignment."""
    gt = np.zeros((1, 7), np.float32)
    gt[0] = [35.0, 0.0, -1.0, *CFG.car_size, 0.0]
    mask = np.ones(1, bool)
    base = _assign(gt, mask)
    fb = assign_anchor_targets(
        jnp.asarray(gt), jnp.asarray(mask),
        grid_hw=CFG.feature_map_shape, velo_range=CFG.velo_range,
        box_size=CFG.car_size, neg_threshold=CFG.neg_iou_threshold,
        pos_threshold=CFG.pos_iou_threshold, window=CFG.assign_window,
        best_anchor_fallback=True)
    assert int(base.pos.sum()) >= 1
    np.testing.assert_array_equal(np.asarray(base.pos), np.asarray(fb.pos))
    np.testing.assert_array_equal(np.asarray(base.ignore),
                                  np.asarray(fb.ignore))
    np.testing.assert_array_equal(np.asarray(base.gt_index),
                                  np.asarray(fb.gt_index))
