"""Box geometry in JAX — fully vectorized, static-shape, jit-friendly.

Covers the reference's geometry layer (SURVEY.md §2 C7):
  * /root/reference/modules/Calc.py  (bbox3d2bev, bbox3d2corner,
    bboxCam2Lidar, decodeRegression)
  * /root/reference/cpp/voxelutil.cpp:50-136 (rotated polygon IoU)
  * /root/reference/modules/utils/Bbox.py (axis-aligned intersection)

Design notes (TPU-first):
  * The reference computes rotated IoU one box pair at a time in C++ with
    mutable global scratch (voxelutil.cpp:95) and has an out-of-bounds
    indexing bug for >5 boxes (voxelutil.cpp:108,129 — see SURVEY.md §5).
    Here the convex clipping runs as a *batched* Sutherland-Hodgman over
    fixed 8-vertex buffers, vmap/vectorized so thousands of pairs compute
    in one fused XLA program.  The OOB bug is not reproduced.
  * All polygons are kept in fixed-size (8, 2) vertex buffers with an
    explicit vertex count; compaction uses a stable argsort on validity,
    which lowers to a tiny sort on TPU.

Box convention (matches the reference throughout): ``(x, y, z, l, w, h, r)``
in LiDAR coordinates, ``z`` = box *bottom*, ``r`` = yaw.  Corner generation
follows Calc.py:15-37 exactly, including its rotation sign convention
(row-vector times ``[[c,-s],[s,c]]``, i.e. a clockwise rotation by ``r``):
corners are consistent between GTs/anchors so IoU and targets match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# Base BEV square in (l, w) units, counter-clockwise winding
# (same corner order as Calc.py:25).
_BASE_CORNERS = np.array(
    [[0.5, 0.5], [-0.5, 0.5], [-0.5, -0.5], [0.5, -0.5]], dtype=np.float32)

_MAX_VERTS = 8  # a 4-gon clipped by 4 half-planes has at most 8 vertices


# ---------------------------------------------------------------------------
# box -> corners
# ---------------------------------------------------------------------------

def boxes3d_to_bev_corners(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) xyzlwhr -> (..., 4, 2) BEV corner quads (CCW).

    Mirrors Calc.py:15-37: corners = base * (l, w), rotated with the
    reference's row-vector convention, translated by (x, y).
    """
    boxes = jnp.asarray(boxes)
    c, s = jnp.cos(boxes[..., 6]), jnp.sin(boxes[..., 6])
    base = jnp.asarray(_BASE_CORNERS, dtype=boxes.dtype)           # (4, 2)
    px = base[:, 0] * boxes[..., 3:4]                              # (..., 4)
    py = base[:, 1] * boxes[..., 4:5]
    # row-vector @ [[c, -s], [s, c]]  (Calc.py:9-13, 30)
    rx = px * c[..., None] + py * s[..., None]
    ry = -px * s[..., None] + py * c[..., None]
    out = jnp.stack([rx + boxes[..., 0:1], ry + boxes[..., 1:2]], axis=-1)
    return out


def boxes3d_to_corners3d(boxes: jnp.ndarray) -> jnp.ndarray:
    """(..., 7) -> (..., 8, 3) 3D corners; top 4 then bottom 4
    (Calc.py:39-60: top face at z + h, bottom at z)."""
    bev = boxes3d_to_bev_corners(boxes)                            # (...,4,2)
    z = jnp.broadcast_to(boxes[..., 2:3], bev.shape[:-1])[..., None]
    h = jnp.broadcast_to(boxes[..., 5:6], bev.shape[:-1])[..., None]
    top = jnp.concatenate([bev, z + h], axis=-1)
    bot = jnp.concatenate([bev, z], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


# ---------------------------------------------------------------------------
# convex polygon clipping (batched Sutherland-Hodgman)
# ---------------------------------------------------------------------------

def _clip_halfplane(verts, count, a, b):
    """Clip a convex polygon by the half-plane left of directed edge a->b.

    verts: (V, 2) with `count` valid CCW vertices (V = _MAX_VERTS).
    a, b: (2,) edge endpoints of the CCW clip polygon.
    Returns (verts', count').
    """
    V = verts.shape[0]
    idx = jnp.arange(V)
    valid = idx < count
    nxt_idx = jnp.where(idx + 1 < count, idx + 1, 0)
    nxt = verts[nxt_idx]

    edge = b - a
    d_cur = edge[0] * (verts[:, 1] - a[1]) - edge[1] * (verts[:, 0] - a[0])
    d_nxt = edge[0] * (nxt[:, 1] - a[1]) - edge[1] * (nxt[:, 0] - a[0])
    in_cur = d_cur >= 0
    in_nxt = d_nxt >= 0

    denom = d_cur - d_nxt
    t = d_cur / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    inter = verts + t[:, None] * (nxt - verts)

    # candidate slots: 2i = current vertex, 2i+1 = crossing point
    cand = jnp.stack([verts, inter], axis=1).reshape(2 * V, 2)
    cand_ok = jnp.stack(
        [valid & in_cur, valid & (in_cur != in_nxt)], axis=1).reshape(2 * V)

    # stable compaction: valid candidates first, order preserved
    order = jnp.argsort(jnp.logical_not(cand_ok), stable=True)
    cand = cand[order][:V]
    new_count = jnp.minimum(jnp.sum(cand_ok), V)
    return cand, new_count


def polygon_area(verts: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Shoelace area of a CCW polygon in a fixed (V, 2) buffer.

    Slots >= count are replaced by vertex 0 (duplicates contribute zero).
    """
    V = verts.shape[0]
    idx = jnp.arange(V)
    verts = jnp.where((idx < count)[:, None], verts, verts[0])
    nxt = jnp.roll(verts, -1, axis=0)
    cross = verts[:, 0] * nxt[:, 1] - nxt[:, 0] * verts[:, 1]
    return 0.5 * jnp.sum(cross)


def _quad_intersection_area_single(q1, q2):
    """Intersection area of two CCW quads, each (4, 2)."""
    verts = jnp.concatenate(
        [q1, jnp.broadcast_to(q1[0], (_MAX_VERTS - 4, 2))], axis=0)
    count = jnp.asarray(4, dtype=jnp.int32)
    for k in range(4):
        a = q2[k]
        b = q2[(k + 1) % 4]
        verts, count = _clip_halfplane(verts, count, a, b)
    area = polygon_area(verts, count)
    return jnp.where(count >= 3, area, 0.0)


def _clipped_edges(qa: jnp.ndarray, qb: jnp.ndarray, lim: float):
    """Clip each (CCW) edge of qa to the part inside qb, as parameter
    intervals — pure min/max arithmetic, no vertex buffers.

    ``lim`` sets the inside rule (signed distance >= -lim): a small
    positive lim is inclusive of qb's boundary, a negative lim strict.
    Returns (cross_sum, closure) where cross_sum = sum of cross(A, B)
    over kept sub-segments and closure = sum of (B - A).
    """
    p0 = qa                                   # (..., 4, 2) edge starts
    d = jnp.roll(qa, -1, axis=-2) - p0

    b0 = qb[..., None, :, :]                  # (..., 1, 4, 2) clip edges
    e = jnp.roll(qb, -1, axis=-2)[..., None, :, :] - b0

    # signed distance of edge endpoints to each clip half-plane
    rel0 = p0[..., :, None, :] - b0           # (..., 4 qa-edges, 4 planes, 2)
    da = e[..., 0] * rel0[..., 1] - e[..., 1] * rel0[..., 0]
    reld = d[..., :, None, :]
    db = da + e[..., 0] * reld[..., 1] - e[..., 1] * reld[..., 0]

    denom = da - db
    t_cross = da / jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    in_a = da >= -lim
    in_b = db >= -lim
    lo = jnp.where(in_a, 0.0, jnp.where(in_b, t_cross, 1.0))
    hi = jnp.where(in_b, 1.0, jnp.where(in_a, t_cross, 0.0))
    t0 = jnp.max(lo, axis=-1)                 # (..., 4)
    t1 = jnp.min(hi, axis=-1)
    keep = t1 > t0

    a_pt = p0 + t0[..., None] * d
    b_pt = p0 + t1[..., None] * d
    cross = a_pt[..., 0] * b_pt[..., 1] - a_pt[..., 1] * b_pt[..., 0]
    cross_sum = jnp.sum(jnp.where(keep, cross, 0.0), axis=-1)
    closure = jnp.sum(jnp.where(keep[..., None], b_pt - a_pt, 0.0),
                      axis=-2)
    return cross_sum, closure


def quad_intersection_area(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Batched intersection area.  q1, q2: (..., 4, 2) CCW quads with
    broadcast-compatible leading dims -> (...,) areas.

    Replaces voxelutil.cpp:50-93 (`polygon_cut`/`intersectArea`).  Unlike
    a Sutherland-Hodgman clip, no intermediate polygon is ever built: by
    Green's theorem, 2*area = sum of cross(A, B) over the intersection
    boundary's directed segments *in any order*, and those segments are
    exactly (parts of q1's edges inside q2) + (parts of q2's edges inside
    q1) — each obtainable by clipping an edge to a parameter interval
    with pure min/max arithmetic.  The previous formulation compacted
    vertex buffers with an argsort per clip edge (8M batched mini-sorts
    per 512-box NMS — measured 3.2 s/batch of 8 frames on v5e); this one
    is sort-free, fully vectorized, and ~50x faster there.

    Degenerate contacts are handled without polygon buffers:
      * coincident boundary pieces (e.g. identical boxes) are counted
        once — the q1 pass is boundary-inclusive, the q2 pass strict;
      * zero-area contacts (edge-on-edge touch) leave the collected
        boundary *open*; a closed boundary satisfies sum(B - A) = 0, so
        a nonzero closure defect forces the area to 0.
    """
    q1, q2 = jnp.broadcast_arrays(q1, q2)
    lim = 1e-6
    s1, c1 = _clipped_edges(q1, q2, lim)       # inclusive of q2 boundary
    s2, c2 = _clipped_edges(q2, q1, -lim)      # strictly inside q1
    defect = jnp.sum(jnp.abs(c1 + c2), axis=-1)
    area = jnp.maximum(0.5 * (s1 + s2), 0.0)
    return jnp.where(defect < 1e-3, area, 0.0)


def rotated_iou_bev(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV IoU.  boxes1 (N, 7), boxes2 (M, 7) -> (N, M).

    Correct replacement for voxelutil.cpp:96-123 `bboxOverlap` (which has an
    out-of-bounds scratch write for M > 5 — SURVEY.md §5; not reproduced).
    """
    q1 = boxes3d_to_bev_corners(boxes1)                            # (N,4,2)
    q2 = boxes3d_to_bev_corners(boxes2)                            # (M,4,2)
    a1 = boxes1[:, 3] * boxes1[:, 4]
    a2 = boxes2[:, 3] * boxes2[:, 4]
    inter = quad_intersection_area(q1[:, None], q2[None, :])       # (N,M)
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def corners_iou_bev(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU from corner quads directly: (N,4,2),(M,4,2)->(N,M)."""
    a1 = jax.vmap(lambda q: polygon_area(
        jnp.concatenate([q, jnp.broadcast_to(q[0], (4, 2))], 0),
        jnp.asarray(4)))(q1)
    a2 = jax.vmap(lambda q: polygon_area(
        jnp.concatenate([q, jnp.broadcast_to(q[0], (4, 2))], 0),
        jnp.asarray(4)))(q2)
    inter = quad_intersection_area(q1[:, None], q2[None, :])
    union = a1[:, None] + a2[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


def rotated_iou_3d(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU: rotated BEV intersection x vertical overlap.
    boxes1 (N, 7), boxes2 (M, 7) with z = box bottom -> (N, M).

    No reference counterpart (the reference ships no eval — SURVEY.md §6);
    standard KITTI-protocol 3D IoU for the evaluator.
    """
    q1 = boxes3d_to_bev_corners(boxes1)
    q2 = boxes3d_to_bev_corners(boxes2)
    inter_bev = quad_intersection_area(q1[:, None], q2[None, :])
    zlo = jnp.maximum(boxes1[:, None, 2], boxes2[None, :, 2])
    zhi = jnp.minimum(boxes1[:, None, 2] + boxes1[:, None, 5],
                      boxes2[None, :, 2] + boxes2[None, :, 5])
    inter_h = jnp.maximum(zhi - zlo, 0.0)
    inter = inter_bev * inter_h
    v1 = boxes1[:, 3] * boxes1[:, 4] * boxes1[:, 5]
    v2 = boxes2[:, 3] * boxes2[:, 4] * boxes2[:, 5]
    union = v1[:, None] + v2[None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


# ---------------------------------------------------------------------------
# regression encode / decode
# ---------------------------------------------------------------------------

def encode_boxes(gt: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Delta-encode GT boxes against anchors (both (..., 7) xyzlwhr).

    Matches Loss.py:32-40: xy normalized by the anchor BEV diagonal,
    z by anchor height, log size ratios, additive yaw delta.
    """
    d = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
    t_xy = (gt[..., 0:2] - anchors[..., 0:2]) / d[..., None]
    t_z = (gt[..., 2:3] - anchors[..., 2:3]) / anchors[..., 5:6]
    t_lwh = jnp.log(
        jnp.maximum(gt[..., 3:6], 1e-6) / jnp.maximum(anchors[..., 3:6], 1e-6))
    t_r = gt[..., 6:7] - anchors[..., 6:7]
    return jnp.concatenate([t_xy, t_z, t_lwh, t_r], axis=-1)


def decode_boxes(deltas: jnp.ndarray, anchors: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`encode_boxes`.

    The reference's decodeRegression (Calc.py:228-236) computes the
    normalizer from the anchor *position* ``sqrt(x^2+y^2)`` instead of its
    footprint diagonal — inconsistent with its own encoder (Loss.py:35)
    and unused by its training loop.  We implement the exact inverse of
    the encoder.
    """
    d = jnp.sqrt(anchors[..., 3] ** 2 + anchors[..., 4] ** 2)
    xy = deltas[..., 0:2] * d[..., None] + anchors[..., 0:2]
    z = deltas[..., 2:3] * anchors[..., 5:6] + anchors[..., 2:3]
    lwh = jnp.exp(deltas[..., 3:6]) * anchors[..., 3:6]
    r = deltas[..., 6:7] + anchors[..., 6:7]
    return jnp.concatenate([xy, z, lwh, r], axis=-1)


# ---------------------------------------------------------------------------
# camera <-> LiDAR box conversion
# ---------------------------------------------------------------------------

def boxes_cam_to_lidar(cam_boxes, cam_to_velo):
    """KITTI label boxes (N, 7) 'h w l x y z ry' (camera frame) ->
    (N, 7) 'x y z l w h r' in LiDAR frame.  Matches Calc.py:206-226:
    position via inv(Tr_velo_to_cam) (rect frame is *not* undone — the
    reference inverts only Tr; we reproduce that), dims reordered
    h,w,l -> l,w,h, yaw r = ry - pi/2.  Works for numpy or jnp inputs.
    """
    xp = jnp if isinstance(cam_boxes, jnp.ndarray) else np
    xyz1 = xp.concatenate(
        [cam_boxes[:, 3:6], xp.ones_like(cam_boxes[:, :1])], axis=1)
    xyz = (cam_to_velo @ xyz1.T).T[:, :3]
    lwh = cam_boxes[:, [2, 1, 0]]
    r = cam_boxes[:, 6:7] - 0.5 * np.pi
    return xp.concatenate([xyz, lwh, r], axis=1)


def boxes_lidar_to_cam(lidar_boxes, velo_to_cam):
    """Inverse of :func:`boxes_cam_to_lidar`: (N,7) xyzlwhr -> hwlxyzr."""
    xp = jnp if isinstance(lidar_boxes, jnp.ndarray) else np
    xyz1 = xp.concatenate(
        [lidar_boxes[:, 0:3], xp.ones_like(lidar_boxes[:, :1])], axis=1)
    xyz = (velo_to_cam @ xyz1.T).T[:, :3]
    hwl = lidar_boxes[:, [5, 4, 3]]
    ry = lidar_boxes[:, 6:7] + 0.5 * np.pi
    return xp.concatenate([hwl, xyz, ry], axis=1)


# ---------------------------------------------------------------------------
# axis-aligned 2D intersection (augmentation gate)
# ---------------------------------------------------------------------------

def aligned_bbox_intersection(b1, b2):
    """Pairwise intersection area of xyxy boxes: (N,4),(M,4)->(N,M).
    Matches modules/utils/Bbox.py:3-9."""
    xp = jnp if isinstance(b1, jnp.ndarray) else np
    lt = xp.maximum(b1[:, None, :2], b2[None, :, :2])
    rb = xp.minimum(b1[:, None, 2:], b2[None, :, 2:])
    wh = xp.clip(rb - lt, 0, None)
    return wh[..., 0] * wh[..., 1]
