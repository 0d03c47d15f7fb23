"""Sparse-input 3D convolution: voxel rows -> dense conv1 output.

Reference dataflow (VoxelNet.py:16-22 + Pipe.py:31-43): scatter ~12k
voxel features into a dense (10, 352, 400, 128) grid, then run a dense
3x3x3 conv over it.  That grid is <1% occupied — the dense conv spends
311 GFLOP/frame multiplying zeros, and materializing the grid costs a
360 MB/frame HBM round-trip (the single largest traffic term in the
model, measured 31.6 ms/batch-8 on v5e).

TPU-native reformulation: a convolution over a sparse *input* is a sum
of shifted outer products — each voxel contributes ``K[kd,kh,kw]^T @
feat`` to up to 27 output cells.  Grouping taps by spatial shift
(kh, kw) and exploiting the depth stride-2 parity (a voxel reaches at
most TWO output depths: kd in {0,2} for odd z, kd=1 for even z) packs
the whole conv into

  * 27 small (V, Cin) x (Cin, Cout) matmuls (5.4 GFLOP/frame, MXU food),
  * 9 unique-index scatter-adds of (2V, Cout) rows into the
    (5, 352, 400, Cout) output (~90 MB — 4x smaller than the input grid
    it replaces, and the 128-channel dense grid never exists).

FLOPs drop ~58x and the scatter traffic ~10x versus scatter+dense-conv,
with bit-identical math (same kernel layout as flax's NDHWC/DHWIO conv;
equivalence-tested against MiddleConvLayers in tests/test_sparse_cml.py).

Fixed geometry: kernel 3x3x3, depth stride 2 / pad 1, spatial stride 1 /
pad 1 — the reference CML's first layer (Pipe.py:33).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp


def sparse_conv3d_d2(features: jnp.ndarray,
                     coords: jnp.ndarray,
                     vmask: jnp.ndarray,
                     kernel: jnp.ndarray,
                     bias: jnp.ndarray,
                     grid_shape: Sequence[int],
                     unique_taps: bool = True) -> jnp.ndarray:
    """Conv3d(k=3, strides=(2,1,1), padding=1) over sparse voxel input.

    Args:
      features: (V, Cin) per-voxel features (the dense grid's nonzero
        rows; absent cells are zero, matching conv zero-padding).
      coords: (V, 3) int32 (ix, iy, iz); may contain -1 padding.
      vmask: (V,) bool validity.
      kernel: (3, 3, 3, Cin, Cout) DHWIO — flax nn.Conv layout.
      bias: (Cout,).
      grid_shape: (nx, ny, nz) voxel grid extent.
      unique_taps: True issues one scatter-add per (kd, kh, kw) tap
        (27 ops, every one with provably unique indices — for fixed kd
        the z -> d_out map is injective); False merges the depth taps
        into 9 scatter-adds whose indices may collide (voxels at
        z = 2k-1, 2k, 2k+1 of one column all feed depth k), so no
        uniqueness hint can be given.  Selected by measurement.

    Returns:
      (d_out, nx, ny, Cout) dense conv output (pre-activation), where
      d_out = (nz + 2 - 3) // 2 + 1 — identical to
      ``nn.Conv(..., strides=(2,1,1), padding=1)`` applied to the
      scattered dense grid.
    """
    nx, ny, nz = grid_shape
    d_out = (nz + 2 - 3) // 2 + 1
    V, Cin = features.shape
    Cout = kernel.shape[-1]
    n_cells = d_out * nx * ny
    dump = n_cells

    ix, iy, iz = coords[:, 0], coords[:, 1], coords[:, 2]
    odd = (iz % 2) == 1
    # depth tap A: kd=0 for odd z (do = (iz+1)/2), kd=1 for even z
    # (do = iz/2); depth tap B: kd=2 for odd z (do = (iz-1)/2), nothing
    # for even z.  out[do] = sum_kd in[2*do - 1 + kd] * K[kd].
    do_a = jnp.where(odd, (iz + 1) // 2, iz // 2)
    do_b = (iz - 1) // 2
    ok_a = vmask & (do_a >= 0) & (do_a < d_out)
    ok_b = vmask & odd & (do_b >= 0) & (do_b < d_out)

    out = jnp.zeros((n_cells + 1, Cout), features.dtype)
    for kh in range(3):
        oh = ix + 1 - kh
        for kw in range(3):
            ow = iy + 1 - kw
            in_plane = (oh >= 0) & (oh < nx) & (ow >= 0) & (ow < ny)
            base = oh * ny + ow

            m0 = features @ kernel[0, kh, kw]
            m1 = features @ kernel[1, kh, kw]
            m2 = features @ kernel[2, kh, kw]
            idx_a = jnp.where(ok_a & in_plane, do_a * (nx * ny) + base,
                              dump)
            idx_b = jnp.where(ok_b & in_plane, do_b * (nx * ny) + base,
                              dump)
            if unique_taps:
                # per-kd scatters: for fixed kd the z -> d_out map is
                # injective, so indices within each op are unique
                idx_a0 = jnp.where(odd, idx_a, dump)
                idx_a1 = jnp.where(odd, dump, idx_a)
                out = out.at[idx_a0].add(m0, mode="drop",
                                         unique_indices=True)
                out = out.at[idx_a1].add(m1, mode="drop",
                                         unique_indices=True)
                out = out.at[idx_b].add(m2, mode="drop",
                                        unique_indices=True)
            else:
                rows_a = jnp.where(odd[:, None], m0, m1)
                out = out.at[jnp.concatenate([idx_a, idx_b])].add(
                    jnp.concatenate([rows_a, m2]), mode="drop")

    out = out[:-1] + bias
    return out.reshape(d_out, nx, ny, Cout)
