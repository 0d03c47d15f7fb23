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
    acc = jnp.promote_types(y.dtype, jnp.float32)
    out = jnp.zeros((nx, ny, r), acc)
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
                y[:, kh * 3 + kw, :].astype(acc), mode="drop")
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
    output cotangent at the tap-shifted cell.

    The 9 taps of one column read a contiguous 3x3 spatial window of the
    padded cotangent around (cx+1, cy+1), so instead of 9 per-tap row
    gathers (9V rows of R values — measured 27.5 ms/batch-8 at flagship
    shapes) this issues ONE windowed gather of (3, 3, R) slices: 3x fewer
    row issues, each row 3x wider — the shape the TPU gather engine is
    fastest at (see DESIGN.md's row-issue measurements).  Values are
    identical: tap (kh, kw) = window[2-kh, 2-kw]."""
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
        # window corner (cx, cy) in padded coords; valid columns have
        # cx in [0, nx), cy in [0, ny) so the 3x3 window always fits —
        # mode="clip" only ever acts on dead (masked) columns
        starts = jnp.stack([cx, cyf], axis=-1)            # (V, 2)
        win = jax.lax.gather(
            gpad, starts,
            jax.lax.GatherDimensionNumbers(
                offset_dims=(1, 2, 3), collapsed_slice_dims=(),
                start_index_map=(0, 1)),
            slice_sizes=(3, 3, r), mode="clip")           # (V, 3, 3, R)
        taps = win[:, ::-1, ::-1, :].reshape(V, 9, r)
        return jnp.where(cm[:, None, None], taps, 0.0)

    dy = jax.vmap(one)(g, col_cy, bounds)
    return dy.astype(g.dtype), None, None


merge_taps.defvjp(_merge_taps_fwd, _merge_taps_bwd)


# ---------------------------------------------------------------------------
# fused variant: merge + bias + relu + per-row statistics in one kernel
# ---------------------------------------------------------------------------

# chunk size for the fused kernel: 128 keeps the cy side-table in a
# proper (rows, 128-lane) int32 layout (one row per chunk, no padding
# blow-up) and chunk starts 128-aligned for the DMA
FCHUNK = 128
# output rows per program: adjacent output rows share 2 of their 3
# contributing cx rows, so grouping amortises the slab DMA (~4x fewer
# HBM bytes) and the per-program fixed costs
OXG = 4


def _merge_fused_kernel(bounds_ref,    # SMEM (B, nx+1) int32 prefetch
                        cy_ref,        # VMEM (1, V_pad//128, 128) int32
                        y_ref,         # ANY  (B, V_pad, 9*Rp)
                        bias_ref,      # VMEM (1, Rp) f32 (packed, pad 0)
                        out_ref,       # VMEM (1, OXG, ny, Rp)
                        stat_ref,      # VMEM (1, OXG, 2, Rp) f32
                        acc_ref,       # VMEM (OXG, ny, Rp) f32 scratch
                        slab0_ref,     # VMEM (FCHUNK, 9*Rp) scratch
                        slab1_ref,     # VMEM (FCHUNK, 9*Rp) scratch
                        sem0, sem1,    # DMA semaphores
                        *, nx: int, ny: int, rp: int):
    """Per-(b, ox-group) program: accumulate the 3x3 tap contributions
    for OXG consecutive output rows from their union column range
    (double-buffered chunk DMA), then emit relu(acc + bias) and its
    per-lane [sum, sum-of-squares] — the dense-conv epilogue (bias,
    relu, and the standardize statistics pass) fused into the merge so
    the (B, nx, ny, Rp) tensor is written once and never re-read.

    Masking split: per-column validity and kh-classification derive
    from the column index j (sublane-major, masks the sel rows); the
    positioning matrix S[row, j] = (row == cy_j + 1 - kw) needs NO
    masking — dead columns have zero sel rows, and out-of-grid oy
    simply matches no row of the iota."""
    b = pl.program_id(0)
    ox0 = pl.program_id(1) * OXG

    # bounds[ox0-1 .. ox0+OXG+1] (clamped): per-row ranges + kh splits
    bnd = [bounds_ref[b, jnp.clip(ox0 - 1 + i, 0, nx)]
           for i in range(OXG + 3)]
    s, e = bnd[0], bnd[OXG + 2]
    count = e - s

    acc_ref[:] = jnp.zeros((OXG, ny, rp), jnp.float32)

    c0 = s // FCHUNK
    n_chunks = jnp.where(count > 0, (e - 1) // FCHUNK - c0 + 1, 0)
    compute_dtype = slab0_ref.dtype

    slabs = (slab0_ref, slab1_ref)
    sems = (sem0, sem1)

    def start_dma(c, buf):
        # c is dynamic: guard against launching past the range
        @pl.when(c < n_chunks)
        def _():
            start = pl.multiple_of((c0 + c) * FCHUNK, FCHUNK)
            pltpu.make_async_copy(
                y_ref.at[b, pl.ds(start, FCHUNK), :], slabs[buf],
                sems[buf]).start()

    def compute(c, buf):
        """Wait buf's DMA for chunk c and accumulate its taps."""
        start = pl.multiple_of((c0 + c) * FCHUNK, FCHUNK)
        pltpu.make_async_copy(
            y_ref.at[b, pl.ds(start, FCHUNK), :], slabs[buf],
            sems[buf]).wait()
        slab = slabs[buf][:]

        # column indices along sublanes (mask side) ...
        j = start + jax.lax.broadcasted_iota(jnp.int32, (FCHUNK, 1), 0)
        # ... and cy along lanes (positioning side): chunk c is exactly
        # row (c0 + c) of the (V_pad//128, 128) side-table
        cy = cy_ref[0, (c0 + c), :].reshape(1, FCHUNK)
        rows = jax.lax.broadcasted_iota(jnp.int32, (ny, FCHUNK), 0)

        for kw in range(3):
            # S needs no masking (see docstring), and it is SHARED by
            # all OXG group rows — so the OXG sel blocks concatenate
            # into one wide rhs and the positioning runs as ONE matmul
            # per kw (the kernel is matmul-issue-bound, not FLOP-bound)
            s_mat = (rows == cy + 1 - kw).astype(compute_dtype)
            sels = []
            for i in range(OXG):        # static unroll over group rows
                # column j contributes to row ox0+i with kh = cx-ox+1;
                # kh == khv exactly on the interval
                # [bnd[i+khv], bnd[i+khv+1]) of the sorted column list
                sel = jnp.zeros((FCHUNK, rp), compute_dtype)
                for khv in range(3):
                    t = khv * 3 + kw
                    m = (j >= bnd[i + khv]) & (j < bnd[i + khv + 1])
                    sel = sel + jnp.where(
                        m, slab[:, t * rp:(t + 1) * rp],
                        jnp.zeros((), compute_dtype))
                sels.append(sel)
            wide = jax.lax.dot_general(
                s_mat, jnp.concatenate(sels, axis=1),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)   # (ny, OXG*rp)
            for i in range(OXG):
                acc_ref[i] = acc_ref[i] + wide[:, i * rp:(i + 1) * rp]

    # software-pipelined double buffering, statically two chunks per
    # iteration so each buffer's start/wait pair stays structurally
    # matched (no cond over refs)
    start_dma(0, 0)
    start_dma(1, 1)

    def pair_body(p, _):
        c = 2 * p

        @pl.when(c < n_chunks)
        def _():
            compute(c, 0)
        start_dma(c + 2, 0)

        @pl.when(c + 1 < n_chunks)
        def _():
            compute(c + 1, 1)
        start_dma(c + 3, 1)
        return 0

    jax.lax.fori_loop(0, (n_chunks + 1) // 2, pair_body, 0)

    for i in range(OXG):
        emitted = jnp.maximum(acc_ref[i] + bias_ref[0, :], 0.0)
        out_ref[0, i] = emitted.astype(out_ref.dtype)
        stat_ref[0, i, 0] = jnp.sum(emitted, axis=0)
        stat_ref[0, i, 1] = jnp.sum(emitted * emitted, axis=0)


def _merge_fused_fwd_pallas(y, col_cy, bounds, bias_packed, grid_shape):
    nx, ny, _ = grid_shape
    B, V, _, r = y.shape
    rp = -(-r // 128) * 128
    v_pad = -(-(V + FCHUNK) // FCHUNK) * FCHUNK
    nxp = -(-nx // OXG) * OXG     # pad the row axis to whole groups

    y_flat = jnp.zeros((B, v_pad, 9, rp), y.dtype).at[
        :, :V, :, :r].set(y).reshape(B, v_pad, 9 * rp)
    # cy side-table in (rows, 128) lanes: row k holds cy of columns
    # [128k, 128k+128); dead slots hold 0 (their sel rows are zero)
    cy_pad = jnp.zeros((B, v_pad), jnp.int32).at[:, :V].set(
        col_cy.astype(jnp.int32)).reshape(B, v_pad // FCHUNK, FCHUNK)
    bias_pad = jnp.zeros((1, rp), jnp.float32).at[0, :r].set(
        bias_packed.astype(jnp.float32))

    kernel = functools.partial(_merge_fused_kernel, nx=nx, ny=ny, rp=rp)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, nxp // OXG),
        in_specs=[
            pl.BlockSpec((1, v_pad // FCHUNK, FCHUNK),
                         lambda b, g, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, rp), lambda b, g, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, OXG, ny, rp), lambda b, g, *_: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OXG, 2, rp), lambda b, g, *_: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((OXG, ny, rp), jnp.float32),
            pltpu.VMEM((FCHUNK, 9 * rp), y.dtype),
            pltpu.VMEM((FCHUNK, 9 * rp), y.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, stats = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((B, nxp, ny, rp), y.dtype),
                   jax.ShapeDtypeStruct((B, nxp, 2, rp), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(bounds.astype(jnp.int32), cy_pad, y_flat, bias_pad)
    return out[:, :nx, :, :r], stats[:, :nx, :, :r]


def _merge_fused_reference(y, col_cy, bounds, bias_packed, grid_shape):
    """XLA composition with identical outputs (oracle + non-TPU path)."""
    acc = jnp.promote_types(y.dtype, jnp.float32)
    merged = merge_taps(y, col_cy, bounds, grid_shape, "xla")
    emitted = jnp.maximum(
        merged.astype(acc) + bias_packed.astype(acc), 0.0)
    stats = jnp.stack([jnp.sum(emitted, axis=2),
                       jnp.sum(emitted * emitted, axis=2)], axis=2)
    return emitted.astype(y.dtype), stats  # stats stay in acc dtype


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def merge_taps_fused(y, col_cy, bounds, bias_packed, grid_shape,
                     backend="pallas"):
    """Tap merge with the dense-conv epilogue fused in.

    Args are as :func:`merge_taps` plus ``bias_packed`` (R,) f32 — the
    conv bias already tiled to the packed d-major layout (pad lanes 0).

    Returns:
      out:   (B, nx, ny, R) = relu(merge(y) + bias), y.dtype.
      stats: (B, nx, 2, R) f32 — per output row [sum, sum_sq] of out
        over ny, for a one-pass batch standardize downstream.
    """
    if backend == "xla":
        return _merge_fused_reference(y, col_cy, bounds, bias_packed,
                                      tuple(grid_shape))
    return _merge_fused_fwd_pallas(y, col_cy, bounds, bias_packed,
                                   tuple(grid_shape))


def _merge_fused_fwd(y, col_cy, bounds, bias_packed, grid_shape, backend):
    out, stats = merge_taps_fused(y, col_cy, bounds, bias_packed,
                                  grid_shape, backend)
    return (out, stats), (out, col_cy, bounds)


def _merge_fused_bwd(grid_shape, backend, res, cots):
    """relu+bias are elementwise over the merged tensor; the stats
    outputs contribute broadcast terms.  d(merge)/dy is the tap-shifted
    gather (same transpose as merge_taps)."""
    out, col_cy, bounds = res
    g_out, g_stats = cots
    live = (out > 0).astype(g_out.dtype)
    h = (g_out
         + g_stats[:, :, 0][:, :, None, :].astype(g_out.dtype)
         + 2.0 * out * g_stats[:, :, 1][:, :, None, :].astype(g_out.dtype))
    pre = h * live                                    # (B, nx, ny, R)
    dbias = jnp.sum(
        pre.astype(jnp.promote_types(pre.dtype, jnp.float32)),
        axis=(0, 1, 2))
    dy = _merge_taps_bwd(grid_shape, backend, (col_cy, bounds), pre)[0]
    return dy, None, None, dbias


merge_taps_fused.defvjp(_merge_fused_fwd, _merge_fused_bwd)


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
