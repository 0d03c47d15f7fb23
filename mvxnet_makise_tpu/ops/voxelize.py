"""Fixed-capacity point-cloud voxelization, jit-compiled end to end.

Reference behaviour being reproduced (SURVEY.md §2 C5): the numba kernel
``group`` (/root/reference/modules/data/Preprocessing.py:76-116) and its C++
twin ``cpp._group`` (/root/reference/cpp/voxelutil.cpp:325-360): shuffle the
cloud, bin points into voxels, keep the first ``T`` points per voxel, emit
9 channels ``[x, y, z, dx, dy, dz, refl, img_row, img_col]`` where
``d*`` are offsets from the voxel centroid of the kept points.

TPU-native design — none of this resembles the reference's hash-map loop:

* **Static shapes.** Point count is padded to ``max_points`` and voxel
  count capped at ``max_voxels``; everything downstream jits once.
* **Sort-based grouping.** Points are stably sorted by linear voxel id;
  segment boundaries give each voxel a dense slot and each point a rank
  within its voxel.  A single scatter then materializes the
  ``(max_voxels, T, 9)`` buffer.  Sorting ~32k keys is microseconds on
  TPU/XLA and replaces the data-dependent Python dict entirely.
* **First-come-after-shuffle sampling** is preserved exactly: the sort is
  stable, so within a voxel points keep their shuffled order and
  ``rank < T`` keeps the same subset the reference's dict insertion keeps.
* Empty sample slots are zeroed here.  (In the reference, raw ``group``
  leaves ``-centroid`` offsets in empty slots, which the fused model then
  zeroes in featureMaping — /root/reference/modules/imhead/Pipe.py:53-59.
  Zeroing at the source gives the same fused-model semantics with one
  fewer pass.)
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp


class VoxelGrid(NamedTuple):
    """Static-capacity voxelized frame."""
    features: jnp.ndarray    # (max_voxels, T, 9) float
    coords: jnp.ndarray      # (max_voxels, 3) int32 — (ix, iy, iz); -1 pad
    counts: jnp.ndarray      # (max_voxels,) int32 — points kept per voxel
    num_voxels: jnp.ndarray  # () int32
    mask: jnp.ndarray        # (max_voxels,) bool — slot holds a real voxel
    # flat sample-slot index (voxel * T + rank) each *input* row landed
    # in, -1 if dropped — lets per-point computations (e.g. the
    # point-fusion image features) scatter into the voxel buffer without
    # re-deriving the binning
    point_slots: jnp.ndarray  # (P,) int32
    num_kept: jnp.ndarray     # () int32 — total points kept
    # point-major view (sorted by voxel): enables segment-op compute
    # paths that never materialize the (V, T, C) slot tensor
    sorted_points: jnp.ndarray   # (P, C_in) points in voxel-sorted order
    sorted_seg: jnp.ndarray      # (P,) int32 voxel slot per point; V=drop
    sorted_kept: jnp.ndarray     # (P,) bool
    sorted_to_orig: jnp.ndarray  # (P,) int32 original row of each entry


def crop_to_range_mask(points: jnp.ndarray,
                       velo_range: Sequence[float]) -> jnp.ndarray:
    """Axis-aligned range filter as a mask: ``low <= xyz < high``
    (reference Preprocessing.py:12-17 `crop`)."""
    lo = jnp.asarray(velo_range[:3], dtype=points.dtype)
    hi = jnp.asarray(velo_range[3:6], dtype=points.dtype)
    xyz = points[..., :3]
    return jnp.all((xyz >= lo) & (xyz < hi), axis=-1)


def frustum_mask(points: jnp.ndarray, proj: jnp.ndarray, rect: jnp.ndarray,
                 image_size: Sequence[int]) -> jnp.ndarray:
    """Camera-FOV filter as a mask (reference Preprocessing.py:26-55
    `cropToSight`): positive depth and projection inside the image, with
    the reference's ``imsize - 1e-3`` boundary epsilon.

    proj: combined (4,4) LiDAR->image matrix; rect: (4,4) R0 @ Tr.
    image_size: (h, w).
    """
    ones = jnp.ones_like(points[..., :1])
    p = jnp.concatenate([points[..., :3], ones], axis=-1)
    cam = p @ rect.T
    depth_ok = cam[..., 2] > 0
    img = p @ proj.T
    z = img[..., 2]
    uv = img[..., :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)[..., None]
    h, w = image_size
    lim = jnp.asarray([w - 1e-3, h - 1e-3], dtype=points.dtype)
    uv_ok = jnp.all((uv >= 0) & (uv < lim), axis=-1)
    return depth_ok & uv_ok


def voxelize(points: jnp.ndarray,
             num_valid: jnp.ndarray,
             *,
             velo_range: Sequence[float],
             voxel_size: Sequence[float],
             grid_shape: Sequence[int],
             max_voxels: int,
             samples_per_voxel: int,
             shuffle_key: Optional[jax.Array] = None,
             slot_features: bool = True) -> VoxelGrid:
    """Voxelize a padded point cloud.

    Args:
      points: (P, 6) float — ``[x, y, z, refl, img_row, img_col]`` (the
        layout train.py:31-42 assembles before calling ``group``).  Rows
        at index >= ``num_valid`` are padding and ignored.
      num_valid: () int32 — number of real points.
      shuffle_key: optional PRNG key; when given, points are randomly
        permuted first (reference Preprocessing.py:87 ``np.random.shuffle``)
        so per-voxel sampling is stochastic.  Omit for deterministic eval.
      slot_features: build the dense (max_voxels, T, 9) slot tensor.
        Point-major consumers (models/voxelnet_pm.py) set False and skip
        its scatter entirely (a measured 22 ms/batch on v5e) — the
        sorted_* fields carry everything they need.

    Returns a :class:`VoxelGrid` with 9-channel features (a (0, T, 9)
    placeholder when ``slot_features=False``).
    """
    P = points.shape[0]
    T = samples_per_voxel
    nx, ny, nz = grid_shape
    n_cells = nx * ny * nz

    if shuffle_key is not None:
        perm = jax.random.permutation(shuffle_key, P)
        points = points[perm]
        # validity travels with the permutation
        was_valid = (perm < num_valid)
    else:
        was_valid = jnp.arange(P) < num_valid

    lo = jnp.asarray(velo_range[:3], dtype=points.dtype)
    vs = jnp.asarray(voxel_size, dtype=points.dtype)
    ijk = jnp.floor((points[:, :3] - lo) / vs).astype(jnp.int32)
    in_bounds = jnp.all(
        (ijk >= 0) & (ijk < jnp.asarray([nx, ny, nz])), axis=-1)
    valid = was_valid & in_bounds

    linear = ijk[:, 0] * (ny * nz) + ijk[:, 1] * nz + ijk[:, 2]
    linear = jnp.where(valid, linear, n_cells)  # padding sorts last

    order = jnp.argsort(linear, stable=True)
    linear_s = linear[order]
    points_s = points[order]
    valid_s = valid[order]

    pos = jnp.arange(P, dtype=jnp.int32)
    new_seg = jnp.concatenate(
        [valid_s[:1], linear_s[1:] != linear_s[:-1]]) & valid_s
    seg_id = jnp.cumsum(new_seg.astype(jnp.int32)) - 1       # (P,)
    # index of the first point of this point's segment
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(new_seg, pos, -1))
    rank = pos - seg_start

    keep = valid_s & (rank < T) & (seg_id >= 0) & (seg_id < max_voxels)
    flat_idx = jnp.where(keep, seg_id * T + rank, max_voxels * T)

    if slot_features:
        # one scatter materializes the padded voxel buffer (+1 shared
        # dump row).  Measured on v5e: this beats a unique-index dump
        # *region* (which grows the buffer and lost ~20%), so no scatter
        # hints here.
        buf = jnp.zeros((max_voxels * T + 1, points.shape[1]),
                        points.dtype)
        buf = buf.at[flat_idx].set(points_s, mode="drop")
        samples = buf[:-1].reshape(max_voxels, T, points.shape[1])

    counts = jnp.zeros((max_voxels + 1,), jnp.int32).at[
        jnp.where(keep, seg_id, max_voxels)].add(1, mode="drop")[:-1]

    # non-source rows share the dump slot (duplicates), so no unique hint
    coord_src = new_seg & (seg_id < max_voxels) & (seg_id >= 0)
    coord_buf = jnp.full((max_voxels + 1,), -1, jnp.int32).at[
        jnp.where(coord_src, seg_id, max_voxels)].set(
        linear_s, mode="drop")[:-1]
    coords = jnp.stack([
        coord_buf // (ny * nz),
        (coord_buf // nz) % ny,
        coord_buf % nz,
    ], axis=-1)
    coords = jnp.where((coord_buf >= 0)[:, None], coords, -1)

    num_voxels = jnp.minimum(jnp.sum(new_seg), max_voxels).astype(jnp.int32)
    vmask = jnp.arange(max_voxels) < num_voxels

    if slot_features:
        # centroid offsets over kept points (Preprocessing.py:110-115)
        denom = jnp.maximum(counts, 1).astype(points.dtype)[:, None]
        centroid = jnp.sum(samples[..., :3], axis=1) / denom   # (V, 3)
        offsets = samples[..., :3] - centroid[:, None, :]

        feats = jnp.concatenate(
            [samples[..., :3], offsets, samples[..., 3:6]],
            axis=-1)                                           # (V,T,9)

        # zero empty sample slots and dead voxel slots
        slot_ok = (jnp.arange(T)[None, :] < counts[:, None]) \
            & vmask[:, None]
        feats = jnp.where(slot_ok[..., None], feats, 0.0)
    else:
        feats = jnp.zeros((0, T, 9), points.dtype)

    # map original input rows -> flat sample slot (only consumers are
    # slot-indexed models; the point-major path never reads it, so skip
    # the scatter when slot features are off)
    if shuffle_key is not None:
        orig_rows = perm[order]
    else:
        orig_rows = order
    if slot_features:
        point_slots = jnp.full((P,), -1, jnp.int32).at[orig_rows].set(
            jnp.where(keep, (seg_id * T + rank).astype(jnp.int32), -1),
            unique_indices=True)
    else:
        point_slots = jnp.full((P,), -1, jnp.int32)
    num_kept = jnp.sum(keep).astype(jnp.int32)

    return VoxelGrid(features=feats, coords=coords, counts=counts,
                     num_voxels=num_voxels, mask=vmask,
                     point_slots=point_slots, num_kept=num_kept,
                     sorted_points=points_s,
                     sorted_seg=jnp.where(keep, seg_id,
                                          max_voxels).astype(jnp.int32),
                     sorted_kept=keep,
                     sorted_to_orig=orig_rows.astype(jnp.int32))
