"""Sparse voxel features -> dense BEV grid scatter.

Reference: ``VoxelNet.reindex`` (/root/reference/modules/voxelnet/
VoxelNet.py:16-22), which scatters (N, 128) voxel features into a dense
``(1, 128, D, H, W)`` NCDHW tensor with advanced indexing.

TPU-native design: the dense grid is laid out **channels-last**
``(D, H, W, C)`` — the native layout for TPU convolutions — and the
scatter is a single flat ``.at[].set`` with a dump row for masked-out
slots, which XLA lowers to one scatter op.  The channel dim (128) maps
onto lanes; D*H*W maps onto sublanes.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def scatter_voxels_to_grid(features: jnp.ndarray,
                           coords: jnp.ndarray,
                           mask: jnp.ndarray,
                           grid_shape: Sequence[int]) -> jnp.ndarray:
    """Scatter per-voxel features into a dense channels-last grid.

    Args:
      features: (V, C) per-voxel features.
      coords: (V, 3) int voxel coords (ix, iy, iz); may contain -1 padding.
      mask: (V,) bool validity.
      grid_shape: (nx, ny, nz) — reference config.yml voxelshape.

    Returns:
      (nz, nx, ny, C) dense grid (depth-major, channels-last) — matches
      the reference's (D, H, W) spatial arrangement of reindex with C
      moved last for TPU.
    """
    nx, ny, nz = grid_shape
    V, C = features.shape
    flat = coords[:, 2] * (nx * ny) + coords[:, 0] * ny + coords[:, 1]
    flat = jnp.where(mask, flat, nx * ny * nz)
    # voxel cells are unique by construction; presorting the (tiny) index
    # vector lets XLA take the sorted+unique scatter fast path instead of
    # the general conflict-resolving apply loop
    order = jnp.argsort(flat)
    flat = flat[order]
    features = features[order]
    grid = jnp.zeros((nx * ny * nz + 1, C), features.dtype)
    grid = grid.at[flat].set(features, mode="drop",
                             indices_are_sorted=True, unique_indices=True)
    return grid[:-1].reshape(nz, nx, ny, C)
