"""Column-compacted sparse CML conv1: one MXU matmul over active BEV
columns + 9 shift-unique scatter-adds.

The reference dataflow (/root/reference/modules/voxelnet/VoxelNet.py:16-22
then Pipe.py:31-43) scatters ~12k voxel features into a dense
(10, 352, 400, 128) grid and convolves it with a 3x3x3 stride-(2,1,1)
kernel.  The grid is <1% occupied: the dense conv burns 311 GFLOP/frame
multiplying zeros and the 360 MB/frame grid round-trip is the model's
single largest HBM term (measured 31.6 ms/batch-8 scatter + 51.5 ms
conv1 on v5e).

TPU-native reformulation — exploit that the sparsity is purely *BEV*
(a LiDAR frame occupies ~5-8k of 140k BEV columns, but an occupied
column's 10-deep z-stack is dense enough to treat as a unit):

  1. **Compact columns.**  The voxelizer emits voxels sorted by
     (ix, iy, iz) (ops/voxelize.py sorts on the linear cell id), so
     consecutive voxels of one BEV column are adjacent: a boundary scan
     + cumsum assigns each active column a dense slot, and one
     sorted-unique scatter packs the frame into ``(C_cap, nz, Cin)`` —
     ~30 MB instead of 360.
  2. **Depth is folded into one matmul.**  conv1's depth taps are local
     to the column: with depth stride 2 / pad 1, output depth ``d``
     reads input ``z = 2d-1+kd``.  Stacking the three kd-slices gives
     ``(C_cap, d_out, 3*Cin)``, and ALL 27 taps for ALL output depths
     of ALL active columns become ONE ``(C_cap*d_out, 3Cin) @
     (3Cin, 9*Cout)`` MXU contraction (~27 GFLOP/frame vs 311 dense).
  3. **Shift-unique merge.**  The 3x3 spatial taps are pure BEV shifts:
     for a fixed tap, active-column -> output-cell is injective AND
     order-preserving (a shift of distinct sorted cells), so the merge
     is 9 unique-index scatter-adds of (C_cap, d_out*Cout) rows into
     the (nx*ny, d_out*Cout) output — accumulated in f32, exactly the
     conv's MXU accumulation dtype.

Out-of-grid taps drop (= the conv's zero padding); cells no active
column reaches stay zero, so ``+ bias -> relu -> standardize`` over the
result is bit-equivalent (up to f32 accumulation order) to running the
dense conv — verified against MiddleConvLayers in tests/test_column_cml.py.

Everything is fixed-capacity and jit-compatible; gradients flow through
the matmul / scatter-adds (their transposes are gathers), so the same
formulation serves training and inference.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp


def compact_columns(vfeat: jnp.ndarray,
                    coords: jnp.ndarray,
                    vmask: jnp.ndarray,
                    grid_shape: Sequence[int],
                    assume_sorted: bool = False,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pack voxel rows into dense per-BEV-column z-stacks.

    Args:
      vfeat: (V, Cin) per-voxel features; rows of dead slots are zero.
      coords: (V, 3) int32 (ix, iy, iz); -1 on dead rows.
      vmask: (V,) bool validity.
      grid_shape: (nx, ny, nz).
      assume_sorted: True skips the internal stable sort.  Safe iff
        valid rows are ascending in the linear cell id
        ``ix*(ny*nz) + iy*nz + iz`` AND all invalid rows trail them —
        exactly the order ops/voxelize.voxelize emits.

    Returns:
      cols: (V, nz, Cin) — column c's z-stack in cols[c]; absent cells
        zero.  Capacity V (every voxel its own column worst-case), so
        no active column is ever dropped.
      col_xy: (V, 2) int32 (ix, iy) per column slot (-1 padding).
      col_mask: (V,) bool.
    """
    nx, ny, nz = grid_shape
    V, Cin = vfeat.shape

    ix, iy, iz = coords[:, 0], coords[:, 1], coords[:, 2]
    col_lin = jnp.where(vmask, ix * ny + iy, nx * ny)

    if not assume_sorted:
        order = jnp.argsort(
            jnp.where(vmask, col_lin * nz + jnp.clip(iz, 0, nz - 1),
                      nx * ny * nz), stable=True)
        vfeat, vmask, col_lin = (vfeat[order], vmask[order],
                                 col_lin[order])
        ix, iy, iz = ix[order], iy[order], iz[order]

    prev = jnp.concatenate([jnp.full((1,), -1, col_lin.dtype),
                            col_lin[:-1]])
    new_col = vmask & (col_lin != prev)
    col_id = jnp.cumsum(new_col.astype(jnp.int32)) - 1        # (V,)

    flat = jnp.where(vmask, col_id * nz + iz, V * nz)
    cols = jnp.zeros((V * nz + 1, Cin), vfeat.dtype)
    # (col_id, iz) is strictly increasing over valid rows and padding
    # maps past the end, so the scatter takes the sorted+unique fast path
    cols = cols.at[flat].set(vfeat, mode="drop",
                             indices_are_sorted=True, unique_indices=True)
    cols = cols[:-1].reshape(V, nz, Cin)

    # NB: src interleaves the dump index V between ascending ids, so no
    # sortedness hint here (dump-row write races are discarded)
    src = jnp.where(new_col, col_id, V)
    col_ix = jnp.full((V + 1,), -1, jnp.int32).at[src].set(
        ix.astype(jnp.int32), mode="drop")[:-1]
    col_iy = jnp.full((V + 1,), -1, jnp.int32).at[src].set(
        iy.astype(jnp.int32), mode="drop")[:-1]
    n_cols = jnp.sum(new_col).astype(jnp.int32)
    col_mask = jnp.arange(V) < n_cols
    return cols, jnp.stack([col_ix, col_iy], axis=-1), col_mask


def fold_conv1_kernel(kernel: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) DHWIO -> (3*Cin, 9*Cout) with kd-major rows
    and (kh, kw)-major columns, matching the tap layouts below."""
    kd, kh, kw, cin, cout = kernel.shape
    k = jnp.transpose(kernel, (0, 3, 1, 2, 4))      # (kd, Cin, kh, kw, Cout)
    return k.reshape(kd * cin, kh * kw * cout)


def column_taps_matmul(cols: jnp.ndarray,
                       kernel: jnp.ndarray) -> jnp.ndarray:
    """The arithmetic half: depth-im2col + ONE MXU matmul.

    cols: (C_cap, nz, Cin); kernel: (3, 3, 3, Cin, Cout) DHWIO.
    Returns (C_cap, d_out, 9, Cout) per-column per-tap contributions,
    tap-major t = kh*3 + kw, accumulated in f32 (f64 under x64)."""
    C_cap, nz, Cin = cols.shape
    d_out = (nz + 2 - 3) // 2 + 1
    Cout = kernel.shape[-1]

    # depth im2col: (C_cap, d_out, 3*Cin), kd-major channel blocks
    xp = jnp.pad(cols, ((0, 0), (1, 1), (0, 0)))
    span = 2 * (d_out - 1) + 1
    taps = jnp.concatenate(
        [xp[:, kd:kd + span:2, :] for kd in range(3)], axis=-1)

    # accumulate in (at least) f32 — the dense conv's MXU accumulation
    # dtype; promotes to f64 under jax.enable_x64 test runs
    acc = jnp.promote_types(cols.dtype, jnp.float32)
    kfold = fold_conv1_kernel(kernel).astype(cols.dtype)
    y = jnp.dot(taps.reshape(C_cap * d_out, 3 * Cin), kfold,
                preferred_element_type=acc)
    return y.reshape(C_cap, d_out, 9, Cout)


def fold_conv1_kernel_zmajor(kernel: jnp.ndarray,
                             nz: int) -> jnp.ndarray:
    """(3, 3, 3, Cin, Cout) DHWIO -> (nz*Cin, 9*d_out*Cout), the
    *depth-unrolled* folded kernel.

    Row (z, ci) / column ((kh*3+kw)*d_out + d, co) holds
    ``kernel[z - 2d + 1, kh, kw, ci, co]`` when ``0 <= z - 2d + 1 < 3``
    and zero otherwise — i.e. conv1's depth taps for EVERY output depth
    are unrolled into the contraction, so ``cols.reshape(V, nz*Cin) @
    K'`` emits all taps and all depths at once, already in the
    tap-major / d-major-lane layout the Pallas merge kernel consumes
    (no im2col intermediate, no f32 materialization, no transpose).
    ~3.3x the FLOPs of the im2col form (the zeros are multiplied), but
    the contraction K-dim (nz*Cin = 1280) runs the MXU at high
    efficiency and the relayout traffic vanishes — measured faster at
    KITTI shapes (docs/DESIGN.md)."""
    kd_, kh_, kw_, cin, cout = kernel.shape
    d_out = (nz + 2 - 3) // 2 + 1
    kf = jnp.zeros((nz, cin, 9 * d_out, cout), kernel.dtype)
    for d in range(d_out):
        for kd in range(kd_):
            z = 2 * d - 1 + kd
            if 0 <= z < nz:
                # columns for (tap t, depth d) live at t*d_out + d
                kf = kf.at[z, :, d::d_out, :].set(
                    jnp.transpose(kernel[kd], (2, 0, 1, 3))
                    .reshape(cin, 9, cout))
    return kf.reshape(nz * cin, 9 * d_out * cout)


def column_taps_matmul_folded(cols: jnp.ndarray,
                              kernel: jnp.ndarray,
                              out_dtype=None) -> jnp.ndarray:
    """One depth-unrolled MXU matmul: (C_cap, nz, Cin) x DHWIO kernel
    -> (C_cap, 9, d_out*Cout) per-tap rows (d-major lanes), accumulated
    in f32 and emitted in ``out_dtype`` (default: cols.dtype).  Exactly
    ``transpose(column_taps_matmul(cols, kernel), (0, 2, 1, 3))`` up to
    f32 summation order (tests/test_column_cml.py)."""
    C_cap, nz, Cin = cols.shape
    d_out = (nz + 2 - 3) // 2 + 1
    Cout = kernel.shape[-1]
    acc = jnp.promote_types(cols.dtype, jnp.float32)
    kf = fold_conv1_kernel_zmajor(kernel, nz).astype(cols.dtype)
    y = jnp.dot(cols.reshape(C_cap, nz * Cin), kf,
                preferred_element_type=acc)
    y = y.astype(out_dtype if out_dtype is not None else cols.dtype)
    return y.reshape(C_cap, 9, d_out * Cout)


def column_conv1_d2(cols: jnp.ndarray,
                    col_xy: jnp.ndarray,
                    col_mask: jnp.ndarray,
                    kernel: jnp.ndarray,
                    grid_shape: Sequence[int]) -> jnp.ndarray:
    """Conv3d(k=3, strides=(2,1,1), padding=1) over compacted columns —
    single-frame, XLA-only form (the scatter-add merge).  The model path
    uses :class:`...models.voxelnet.ColumnConv1ReluNorm`, which batches
    the merge through the Pallas kernel (ops/pallas_column_merge.py);
    this function remains the per-frame oracle.

    Args:
      cols/col_xy/col_mask: from :func:`compact_columns`.
      kernel: (3, 3, 3, Cin, Cout) DHWIO (flax nn.Conv layout — the
        parameter tree interchanges with the dense path).
      grid_shape: (nx, ny, nz).

    Returns:
      (d_out, nx, ny, Cout) pre-activation WITHOUT bias (the caller
      adds bias so inactive cells get it too, as dense conv semantics
      require), in f32 (f64 under x64 mode).
    """
    nx, ny, nz = grid_shape
    d_out = (nz + 2 - 3) // 2 + 1
    C_cap = cols.shape[0]
    Cout = kernel.shape[-1]
    n_bev = nx * ny

    y = column_taps_matmul(cols, kernel)
    acc = y.dtype

    cx, cy = col_xy[:, 0], col_xy[:, 1]
    out = jnp.zeros((n_bev + 1, d_out * Cout), acc)
    for kh in range(3):
        ox = cx + 1 - kh
        for kw in range(3):
            oy = cy + 1 - kw
            ok = col_mask & (ox >= 0) & (ox < nx) & (oy >= 0) & (oy < ny)
            idx = jnp.where(ok, ox * ny + oy, n_bev)
            rows = y[:, :, kh * 3 + kw, :].reshape(C_cap, d_out * Cout)
            # shift of distinct sorted cells: in-grid targets are unique
            # (duplicate drops all share the dump row, whose value is
            # discarded below)
            out = out.at[idx].add(rows, mode="drop", unique_indices=True)

    out = out[:-1].reshape(nx, ny, d_out, Cout)
    return jnp.transpose(out, (2, 0, 1, 3))
