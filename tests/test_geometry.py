"""Geometry unit tests.

Oracle strategy (SURVEY.md §4): the reference cross-checked its C++ IoU
against shapely; shapely is unavailable here, so the oracle is an
*independent algorithm* — dense rasterization (point-in-polygon counting on
a fine grid), which shares no code path with the Sutherland-Hodgman clipper
under test.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from mvxnet_makise_tpu.geometry import (
    aligned_bbox_intersection,
    boxes3d_to_bev_corners,
    boxes3d_to_corners3d,
    boxes_cam_to_lidar,
    boxes_lidar_to_cam,
    decode_boxes,
    encode_boxes,
    quad_intersection_area,
    rotated_iou_bev,
)


# ---------------------------------------------------------------------------
# oracle: rasterized polygon intersection area
# ---------------------------------------------------------------------------

def _point_in_convex(pts, quad):
    """pts (P,2), quad (4,2) CCW -> bool (P,)"""
    inside = np.ones(len(pts), dtype=bool)
    for k in range(4):
        a, b = quad[k], quad[(k + 1) % 4]
        cross = (b[0] - a[0]) * (pts[:, 1] - a[1]) - \
                (b[1] - a[1]) * (pts[:, 0] - a[0])
        inside &= cross >= 0
    return inside


def raster_intersection_area(q1, q2, res=400):
    allp = np.concatenate([q1, q2], axis=0)
    lo, hi = allp.min(0) - 0.01, allp.max(0) + 0.01
    xs = np.linspace(lo[0], hi[0], res)
    ys = np.linspace(lo[1], hi[1], res)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    pts = np.stack([gx.ravel(), gy.ravel()], axis=1)
    inside = _point_in_convex(pts, q1) & _point_in_convex(pts, q2)
    cell = (xs[1] - xs[0]) * (ys[1] - ys[0])
    return inside.sum() * cell


def random_boxes(rng, n, center_scale=5.0):
    boxes = np.zeros((n, 7), dtype=np.float32)
    boxes[:, 0:2] = rng.uniform(-center_scale, center_scale, (n, 2))
    boxes[:, 2] = rng.uniform(-2, 0, n)
    boxes[:, 3] = rng.uniform(1.0, 5.0, n)   # l
    boxes[:, 4] = rng.uniform(1.0, 3.0, n)   # w
    boxes[:, 5] = rng.uniform(1.0, 2.0, n)   # h
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n)
    return boxes


# ---------------------------------------------------------------------------
# corners
# ---------------------------------------------------------------------------

def test_bev_corners_axis_aligned():
    box = jnp.array([10.0, 5.0, -1.0, 4.0, 2.0, 1.5, 0.0])
    corners = np.asarray(boxes3d_to_bev_corners(box))
    expect = np.array([[12, 6], [8, 6], [8, 4], [12, 4]], dtype=np.float32)
    np.testing.assert_allclose(corners, expect, atol=1e-5)


def test_bev_corners_rotation_reference_convention():
    # reference rotates row-vectors by [[c,-s],[s,c]] (Calc.py:30): for
    # r=pi/2 the corner (l/2, w/2) maps to (w/2, -l/2).
    box = jnp.array([0.0, 0.0, 0.0, 4.0, 2.0, 1.5, np.pi / 2])
    corners = np.asarray(boxes3d_to_bev_corners(box))
    np.testing.assert_allclose(corners[0], [1.0, -2.0], atol=1e-5)


def test_bev_corners_ccw_winding(rng):
    boxes = random_boxes(rng, 16)
    corners = np.asarray(boxes3d_to_bev_corners(jnp.asarray(boxes)))
    # shoelace must be positive (CCW) for the clipper's half-plane tests
    x, y = corners[..., 0], corners[..., 1]
    area = 0.5 * np.sum(
        x * np.roll(y, -1, axis=-1) - np.roll(x, -1, axis=-1) * y, axis=-1)
    assert np.all(area > 0)
    np.testing.assert_allclose(area, boxes[:, 3] * boxes[:, 4], rtol=1e-4)


def test_corners3d_top_bottom():
    box = jnp.array([0.0, 0.0, -1.0, 4.0, 2.0, 1.5, 0.3])
    c = np.asarray(boxes3d_to_corners3d(box))
    assert c.shape == (8, 3)
    np.testing.assert_allclose(c[:4, 2], 0.5, atol=1e-6)   # z + h
    np.testing.assert_allclose(c[4:, 2], -1.0, atol=1e-6)  # z (bottom)


# ---------------------------------------------------------------------------
# rotated IoU vs rasterization oracle
# ---------------------------------------------------------------------------

def test_quad_intersection_identical():
    box = jnp.array([[1.0, 2.0, 0.0, 4.0, 2.0, 1.0, 0.7]])
    q = boxes3d_to_bev_corners(box)
    area = np.asarray(quad_intersection_area(q, q))
    np.testing.assert_allclose(area, [8.0], rtol=1e-5)


def test_quad_intersection_disjoint():
    b1 = jnp.array([[0.0, 0.0, 0, 2, 2, 1, 0.0]])
    b2 = jnp.array([[10.0, 0.0, 0, 2, 2, 1, 0.5]])
    iou = np.asarray(rotated_iou_bev(b1, b2))
    np.testing.assert_allclose(iou, [[0.0]], atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rotated_iou_matches_rasterization(seed):
    rng = np.random.default_rng(seed)
    b1 = random_boxes(rng, 6, center_scale=2.0)
    b2 = random_boxes(rng, 7, center_scale=2.0)
    iou = np.asarray(rotated_iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    q1 = np.asarray(boxes3d_to_bev_corners(jnp.asarray(b1)))
    q2 = np.asarray(boxes3d_to_bev_corners(jnp.asarray(b2)))
    for i in range(len(b1)):
        for j in range(len(b2)):
            inter = raster_intersection_area(q1[i], q2[j])
            a1 = b1[i, 3] * b1[i, 4]
            a2 = b2[j, 3] * b2[j, 4]
            expect = inter / (a1 + a2 - inter)
            assert abs(iou[i, j] - expect) < 2e-2, (i, j, iou[i, j], expect)


def test_rotated_iou_many_boxes_no_corruption(rng):
    # the reference's C++ bboxOverlap corrupts memory for >5 boxes
    # (voxelutil.cpp:108,129); ours must stay finite and within [0, 1].
    b1 = random_boxes(rng, 12)
    b2 = random_boxes(rng, 12)
    iou = np.asarray(rotated_iou_bev(jnp.asarray(b1), jnp.asarray(b2)))
    assert np.all(np.isfinite(iou))
    assert np.all((iou >= 0) & (iou <= 1.0 + 1e-6))


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------

def test_encode_decode_roundtrip(rng):
    gt = random_boxes(rng, 10)
    anchors = random_boxes(rng, 10)
    deltas = encode_boxes(jnp.asarray(gt), jnp.asarray(anchors))
    rec = np.asarray(decode_boxes(deltas, jnp.asarray(anchors)))
    np.testing.assert_allclose(rec, gt, rtol=1e-4, atol=1e-4)


def test_encode_matches_reference_formula():
    gt = jnp.array([[11.0, 5.5, -0.8, 4.2, 1.7, 1.6, 0.4]])
    anchor = jnp.array([[10.0, 5.0, -1.0, 3.9, 1.6, 1.56, 0.0]])
    t = np.asarray(encode_boxes(gt, anchor))[0]
    d = np.sqrt(3.9 ** 2 + 1.6 ** 2)
    np.testing.assert_allclose(t[0], 1.0 / d, rtol=1e-5)
    np.testing.assert_allclose(t[1], 0.5 / d, rtol=1e-5)
    np.testing.assert_allclose(t[2], 0.2 / 1.56, rtol=1e-4)
    np.testing.assert_allclose(t[3], np.log(4.2 / 3.9), rtol=1e-4)
    np.testing.assert_allclose(t[6], 0.4, rtol=1e-5)


# ---------------------------------------------------------------------------
# cam <-> lidar
# ---------------------------------------------------------------------------

def _toy_velo_to_cam():
    # KITTI-like: cam x = -velo y, cam y = -velo z, cam z = velo x, + offset
    m = np.zeros((4, 4), dtype=np.float32)
    m[0, 1] = -1
    m[1, 2] = -1
    m[2, 0] = 1
    m[3, 3] = 1
    m[:3, 3] = [0.02, -0.05, -0.3]
    return m


def test_cam_lidar_roundtrip(rng):
    v2c = _toy_velo_to_cam()
    c2v = np.linalg.inv(v2c)
    cam_boxes = np.zeros((5, 7), dtype=np.float32)
    cam_boxes[:, 0] = rng.uniform(1.3, 1.8, 5)   # h
    cam_boxes[:, 1] = rng.uniform(1.4, 1.8, 5)   # w
    cam_boxes[:, 2] = rng.uniform(3.5, 4.5, 5)   # l
    cam_boxes[:, 3:6] = rng.uniform(-5, 5, (5, 3))
    cam_boxes[:, 6] = rng.uniform(-np.pi, np.pi, 5)
    lidar = boxes_cam_to_lidar(cam_boxes, c2v)
    # layout: xyzlwhr with l=cam l, w=cam w, h=cam h, r = ry - pi/2
    np.testing.assert_allclose(lidar[:, 3], cam_boxes[:, 2], rtol=1e-5)
    np.testing.assert_allclose(lidar[:, 5], cam_boxes[:, 0], rtol=1e-5)
    np.testing.assert_allclose(
        lidar[:, 6], cam_boxes[:, 6] - np.pi / 2, rtol=1e-5)
    back = boxes_lidar_to_cam(lidar, v2c)
    np.testing.assert_allclose(back, cam_boxes, rtol=1e-4, atol=1e-4)


def test_aligned_bbox_intersection():
    b1 = np.array([[0, 0, 4, 4], [0, 0, 1, 1]], dtype=np.float32)
    b2 = np.array([[2, 2, 6, 6]], dtype=np.float32)
    inter = aligned_bbox_intersection(b1, b2)
    np.testing.assert_allclose(inter, [[4.0], [0.0]])
