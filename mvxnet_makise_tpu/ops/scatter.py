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


def scatter_voxels_to_conv1_bands(features: jnp.ndarray,
                                  coords: jnp.ndarray,
                                  mask: jnp.ndarray,
                                  grid_shape: Sequence[int]
                                  ) -> jnp.ndarray:
    """Scatter voxels directly into the CML conv1's *depth-banded input
    layout*, so conv1 becomes one plain 2D convolution.

    The reference pipeline (VoxelNet.py:16-22 then Pipe.py:33) scatters
    into a (D, H, W, C) grid and runs Conv3d(k=3, stride=(2,1,1),
    pad=1).  On TPU, XLA maps that strided-depth 3D conv onto the MXU at
    ~48 TFLOP/s while an equivalent-FLOPs NHWC 2D conv reaches ~139
    (measured, v5e).  Observation: output depth ``d`` consumes input
    slices ``z = 2d-1+kd``, so each voxel (with height index z) feeds at
    most TWO (d, kd) pairs — odd z: (d=(z+1)/2, kd=0) and (d=(z-1)/2,
    kd=2); even z: (d=z/2, kd=1).  Scattering each voxel row into those
    slots of a ``(d_out, H, W, 3*C)`` tensor (kd-major channel blocks)
    yields exactly the im2col-in-depth input of a (3, 3, 3C, C_out) 2D
    conv — no strided 3D conv, no channel-slice copies, and the
    out-of-range taps of d=0 / d=d_out-1 are handled by the rows simply
    never being written.

    Args / semantics match :func:`scatter_voxels_to_grid`; geometry is
    fixed to conv1's (kernel 3, depth stride 2, pad 1).

    Returns:
      (d_out, nx, ny, 3*C) banded conv input, d_out = (nz-1)//2 + 1.
    """
    nx, ny, nz = grid_shape
    d_out = (nz + 2 - 3) // 2 + 1
    V, C = features.shape
    n_rows = d_out * nx * ny * 3
    iz = coords[:, 2]
    odd = (iz % 2) == 1
    base3 = (coords[:, 0] * ny + coords[:, 1]) * 3

    # slot A: odd z -> (d=(z+1)/2, kd=0); even z -> (d=z/2, kd=1)
    d_a = jnp.where(odd, (iz + 1) // 2, iz // 2)
    kd_a = jnp.where(odd, 0, 1)
    ok_a = mask & (d_a < d_out)
    flat_a = jnp.where(ok_a, (d_a * nx * ny * 3) + base3 + kd_a, n_rows)
    # slot B: odd z -> (d=(z-1)/2, kd=2)
    d_b = (iz - 1) // 2
    ok_b = mask & odd & (d_b >= 0)
    flat_b = jnp.where(ok_b, (d_b * nx * ny * 3) + base3 + 2, n_rows)

    flat = jnp.concatenate([flat_a, flat_b])
    rows = jnp.concatenate([features, features])
    # slots are unique by construction (each (voxel, kd) pair maps to
    # one row); presort for the fast scatter path
    order = jnp.argsort(flat)
    out = jnp.zeros((n_rows + 1, C), features.dtype)
    out = out.at[flat[order]].set(rows[order], mode="drop",
                                  indices_are_sorted=True,
                                  unique_indices=True)
    return out[:-1].reshape(d_out, nx, ny, 3 * C)
