"""Pallas TPU kernel: merge per-column conv taps into the dense conv1
output — the memory-system half of the column-compacted CML
(ops/column_conv.py).

Problem.  column_conv1_d2 reduces conv1's arithmetic to one MXU matmul,
leaving a merge: every active BEV column holds 9 tap contributions
``Y[col, t] in R^{d_out*Cout}`` that must be summed into the 3x3
BEV-shifted cells of the dense output.  XLA expresses this only as
scatter(-add), whose TPU lowering is row-issue-bound at ~40-65 ns/row
(measured, v5e): 9 taps x 12k columns x 8 frames ~ 35-75 ms/batch —
slower than the dense conv it replaces.

Kernel idea.  Columns arrive sorted by (cx, cy) (the voxelizer order,
preserved by compact_columns).  For output BEV row ``ox``, ALL
contributing columns (cx in {ox-1, ox, ox+1}) form ONE contiguous range
of the column list — so the kernel, gridded over (batch, ox):

  1. DMAs that range from HBM in fixed-size chunks (contiguous slabs —
     no per-row issue cost);
  2. classifies each slab row's kh tap group by comparing its index
     against the prefetched per-cx bounds (kh = cx - ox + 1);
  3. for each kw, selects the (kh, kw) tap slice with three masked
     adds, builds a one-hot positioning matrix ``S[oy, j] = (oy ==
     cy_j + 1 - kw)``, and accumulates ``S @ slab`` on the MXU —
     columns of one cx row have distinct cy, so S is a true scatter
     matrix and the matmul is an exact in-VMEM positioned add;
  4. writes the finished (ny, d_out*Cout) output row once.

The spatial positioning thus rides the MXU (dense, fast) instead of the
scatter engine, and HBM traffic is contiguous slabs + one streaming
output write.

Reference semantics being implemented: the scatter + conv1 pipeline of
/root/reference/modules/voxelnet/VoxelNet.py:16-22 + Pipe.py:31-43.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# columns DMA'd per chunk; output rows with more contributing columns
# loop over several chunks (no correctness cap — the loop runs
# ceil(count / CHUNK) times)
CHUNK = 128


def _merge_kernel(bounds_ref,        # SMEM (B, nx+1) int32 prefetch
                  cy_ref,            # VMEM (1, V_pad, 1) int32
                  y_ref,             # ANY  (B, V_pad, 9*Rp)
                  out_ref,           # VMEM (1, 1, ny, Rp)
                  acc_ref,           # VMEM (ny, Rp) f32 scratch
                  slab_ref,          # VMEM (CHUNK, 9*Rp) scratch
                  sem,               # DMA semaphore
                  *, nx: int, ny: int, rp: int):
    b = pl.program_id(0)
    ox = pl.program_id(1)

    # contributing columns: one contiguous range [s, e)
    s = bounds_ref[b, jnp.maximum(ox - 1, 0)]
    b1 = bounds_ref[b, ox]                       # first cx == ox
    b2 = bounds_ref[b, jnp.minimum(ox + 1, nx)]  # first cx == ox + 1
    e = bounds_ref[b, jnp.minimum(ox + 2, nx)]
    # ox = 0 / nx-1: the clamped reads above collapse the absent
    # neighbour ranges to empty ([s, b1) or [b2, e)) automatically
    count = e - s

    acc_ref[:] = jnp.zeros((ny, rp), jnp.float32)

    # Mosaic requires DMA slice offsets on the tiled row dimension to be
    # provably tile-aligned — so chunks live on a GLOBAL CHUNK-aligned
    # lattice covering [s, e), and the first/last chunks mask their
    # out-of-range rows
    c0 = s // CHUNK
    n_chunks = jnp.where(count > 0, (e - 1) // CHUNK - c0 + 1, 0)
    compute_dtype = slab_ref.dtype

    def chunk_body(c, _):
        start = pl.multiple_of((c0 + c) * CHUNK, CHUNK)

        dma = pltpu.make_async_copy(
            y_ref.at[b, pl.ds(start, CHUNK), :], slab_ref, sem)
        dma.start()

        # row classification while the DMA flies
        j = start + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 1), 0)
        valid = (j >= s) & (j < e)
        kh = ((j >= b1).astype(jnp.int32)
              + (j >= b2).astype(jnp.int32))     # (CHUNK, 1) in {0,1,2}
        cy = cy_ref[0, pl.ds(start, CHUNK), :]   # (CHUNK, 1)

        dma.wait()
        slab = slab_ref[:]                       # (CHUNK, 9*Rp)

        for kw in range(3):
            oy = cy + 1 - kw                      # (CHUNK, 1)
            ok = valid & (oy >= 0) & (oy < ny)
            # select each row's (kh, kw) tap slice: 3 masked adds over
            # lane-aligned static slices (Rp is a multiple of 128)
            sel = jnp.zeros((CHUNK, rp), compute_dtype)
            for khv in range(3):
                t = khv * 3 + kw
                m = (kh == khv) & ok
                sel = sel + jnp.where(
                    m, slab[:, t * rp:(t + 1) * rp],
                    jnp.zeros((), compute_dtype))
            # one-hot positioning matrix: S[oy_row, j] — columns of one
            # cx row have distinct cy, so rows within a tap are
            # collision-free; collisions ACROSS kh groups sum via the
            # matmul's contraction, exactly as the conv requires
            rows = jax.lax.broadcasted_iota(jnp.int32, (ny, CHUNK), 0)
            s_mat = (rows == jnp.where(ok, oy, -1).reshape(1, CHUNK)
                     ).astype(compute_dtype)
            acc_ref[:] = acc_ref[:] + jax.lax.dot_general(
                s_mat, sel, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, n_chunks, chunk_body, 0)
    out_ref[0, 0] = acc_ref[:].astype(out_ref.dtype)


def merge_taps_reference(y: jnp.ndarray, col_cy: jnp.ndarray,
                         bounds: jnp.ndarray, grid_shape: Sequence[int]
                         ) -> jnp.ndarray:
    """XLA reference implementation (per frame): 9 scatter-adds.
    Used as the kernel's test oracle and as the custom-VJP forward on
    non-TPU backends."""
    nx, ny, _ = grid_shape
    V = col_cy.shape[0]
    r = y.shape[-1]
    col_ids = jnp.arange(V)
    # reconstruct cx from bounds: cx_j = searchsorted-style count
    cx = jnp.searchsorted(bounds, col_ids, side="right") - 1
    n_cols = bounds[-1]
    cm = col_ids < n_cols
    out = jnp.zeros((nx, ny, r), jnp.float32)
    cxs = jnp.where(cm, cx, nx + 8)
    for kh in range(3):
        ox = cxs + 1 - kh
        for kw in range(3):
            oy = col_cy + 1 - kw
            # .at[] wraps negative indices (numpy semantics) — replace
            # every out-of-grid target with a positive OOB index so
            # mode="drop" actually drops it; no sorted/unique hints
            # (this is the correctness oracle, not the fast path)
            ok = (ox >= 0) & (ox < nx) & (oy >= 0) & (oy < ny)
            oxs = jnp.where(ok, ox, nx)
            oys = jnp.where(ok, oy, ny)
            out = out.at[oxs, oys].add(
                y[:, kh * 3 + kw, :].astype(jnp.float32), mode="drop")
    return out


def _merge_fwd_pallas(y, col_cy, bounds, grid_shape, interpret):
    """y: (B, V, 9, R); col_cy: (B, V) int32; bounds: (B, nx+1) int32.
    Returns (B, nx, ny, R) dense merged output in y.dtype."""
    nx, ny, _ = grid_shape
    B, V, _, r = y.shape
    rp = -(-r // 128) * 128       # lane-aligned tap stride
    v_pad = V + CHUNK             # chunk overruns read zeros, masked anyway

    y_flat = jnp.zeros((B, v_pad, 9, rp), y.dtype).at[
        :, :V, :, :r].set(y).reshape(B, v_pad, 9 * rp)
    cy_pad = jnp.zeros((B, v_pad, 1), jnp.int32).at[:, :V, 0].set(
        col_cy.astype(jnp.int32))

    kernel = functools.partial(_merge_kernel, nx=nx, ny=ny, rp=rp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nx),
        in_specs=[
            pl.BlockSpec((1, v_pad, 1), lambda b, ox, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, 1, ny, rp),
                               lambda b, ox, *_: (b, ox, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((ny, rp), jnp.float32),
            pltpu.VMEM((CHUNK, 9 * rp), y.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, nx, ny, rp), y.dtype),
        interpret=interpret,
    )(bounds.astype(jnp.int32), cy_pad, y_flat)
    return out[..., :r]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def merge_taps(y, col_cy, bounds, grid_shape, backend="pallas"):
    """Differentiable tap merge.

    Args:
      y: (B, V, 9, R) per-column per-tap contributions (tap t = kh*3+kw).
      col_cy: (B, V) int32 — cy of each column slot.
      bounds: (B, nx+1) int32 — bounds[b, i] = first column slot of
        frame b with cx >= i; bounds[b, nx] = number of active columns.
        (Columns sorted by (cx, cy), the compact_columns order.)
      grid_shape: (nx, ny, nz).
      backend: "pallas" (TPU kernel; interpreter off-TPU) or "xla"
        (9 scatter-adds — slow on TPU, fine on CPU).

    Returns: (B, nx, ny, R) dense merged output, y.dtype.
    """
    if backend == "xla":
        return jax.vmap(lambda a, b_, c: merge_taps_reference(
            a, b_, c, tuple(grid_shape)))(y, col_cy, bounds).astype(y.dtype)
    return _merge_fwd_pallas(y, col_cy, bounds, tuple(grid_shape),
                             interpret=jax.default_backend() != "tpu")


def _merge_taps_fwd(y, col_cy, bounds, grid_shape, backend):
    return merge_taps(y, col_cy, bounds, grid_shape, backend), (
        col_cy, bounds)


def _merge_taps_bwd(grid_shape, backend, res, g):
    """The merge is linear: each tap's cotangent is a gather of the
    output cotangent at the tap-shifted cell (XLA gathers; a dedicated
    backward kernel is a future optimization — training still runs)."""
    col_cy, bounds = res
    nx, ny, _ = grid_shape
    B, _, _, r = g.shape
    V = col_cy.shape[1]

    def one(gf, cyf, bf):
        col_ids = jnp.arange(V)
        cx = jnp.searchsorted(bf, col_ids, side="right") - 1
        cm = col_ids < bf[-1]
        gpad = jnp.zeros((nx + 2, ny + 2, r), gf.dtype).at[
            1:-1, 1:-1].set(gf)
        taps = []
        for kh in range(3):
            ox = jnp.clip(cx + 2 - kh, 0, nx + 1)
            for kw in range(3):
                oy = jnp.clip(cyf + 2 - kw, 0, ny + 1)
                rowv = gpad[ox, oy]                       # (V, R)
                taps.append(jnp.where(cm[:, None], rowv, 0.0))
        return jnp.stack(taps, axis=1)                    # (V, 9, R)

    dy = jax.vmap(one)(g, col_cy, bounds)
    return dy.astype(g.dtype), None, None


merge_taps.defvjp(_merge_taps_fwd, _merge_taps_bwd)


def column_bounds(col_xy: jnp.ndarray, col_mask: jnp.ndarray,
                  nx: int) -> jnp.ndarray:
    """Per-cx start offsets into the sorted column list.

    col_xy: (V, 2) int32 (cx, cy) sorted by (cx, cy) with -1 padding;
    returns (nx+1,) int32 with bounds[i] = first slot with cx >= i and
    bounds[nx] = number of active columns."""
    V = col_xy.shape[0]
    cx = jnp.where(col_mask, col_xy[:, 0], nx)
    return jnp.searchsorted(cx, jnp.arange(nx + 1),
                            side="left").astype(jnp.int32)
