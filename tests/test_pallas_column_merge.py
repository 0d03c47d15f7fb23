"""ops/pallas_column_merge: the Pallas tap-merge kernel must equal the
XLA scatter-add oracle (and its VJP the hand-derived gather transpose)
on random column scenes, including edge columns, empty cx rows, dense
rows spanning multiple chunks, and empty frames."""

import numpy as np

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.ops.column_conv import compact_columns
from mvxnet_makise_tpu.ops.pallas_column_merge import (
    column_bounds,
    merge_taps,
    merge_taps_reference,
)

GRID = (16, 24, 10)
R = 2 * 3          # d_out * Cout stand-in (small, unaligned on purpose)


def _cols(seed, B=2, V=64, dense_row=False):
    """Random sorted active columns per frame -> (col_cy, bounds, y)."""
    rng = np.random.default_rng(seed)
    nx, ny, _ = GRID
    col_cy = np.zeros((B, V), np.int32)
    bounds = np.zeros((B, nx + 1), np.int32)
    n_cols = []
    for b in range(B):
        n = rng.integers(V // 2, V + 1)
        cells = rng.choice(nx * ny, n, replace=False)
        if dense_row:
            # force one fully-active BEV row (multi-chunk path)
            row = rng.integers(0, nx)
            cells = np.unique(np.concatenate(
                [row * ny + np.arange(ny), cells]))[:V]
            n = len(cells)
        cells = np.sort(cells)
        cx, cy = cells // ny, cells % ny
        col_cy[b, :n] = cy
        bounds[b] = np.searchsorted(cx, np.arange(nx + 1), side="left")
        n_cols.append(n)
    y = rng.normal(size=(B, V, 9, R)).astype(np.float32)
    # dead column slots must not contribute even if nonzero
    return (jnp.asarray(y), jnp.asarray(col_cy), jnp.asarray(bounds),
            n_cols)


def test_merge_matches_reference():
    y, col_cy, bounds, _ = _cols(0)
    got = merge_taps(y, col_cy, bounds, GRID, "pallas")
    want = jax.vmap(lambda a, b, c: merge_taps_reference(
        a, b, c, GRID))(y, col_cy, bounds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_merge_multi_chunk_dense_row():
    y, col_cy, bounds, _ = _cols(1, V=96, dense_row=True)
    got = merge_taps(y, col_cy, bounds, GRID, "pallas")
    want = jax.vmap(lambda a, b, c: merge_taps_reference(
        a, b, c, GRID))(y, col_cy, bounds)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)


def test_merge_empty_frame():
    y, col_cy, bounds, _ = _cols(2)
    bounds = bounds.at[1].set(0)         # frame 1: zero active columns
    got = merge_taps(y, col_cy, bounds, GRID, "pallas")
    assert not np.any(np.asarray(got)[1])


def test_merge_xla_backend_matches():
    y, col_cy, bounds, _ = _cols(3)
    a = merge_taps(y, col_cy, bounds, GRID, "pallas")
    b = merge_taps(y, col_cy, bounds, GRID, "xla")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_merge_grad_matches_reference_grad():
    y, col_cy, bounds, _ = _cols(4)
    w = jnp.asarray(np.random.default_rng(9).normal(
        size=(2, GRID[0], GRID[1], R)).astype(np.float32))

    def f_kernel(y):
        return jnp.sum(merge_taps(y, col_cy, bounds, GRID, "pallas") * w)

    def f_ref(y):
        out = jax.vmap(lambda a, b, c: merge_taps_reference(
            a, b, c, GRID))(y, col_cy, bounds)
        return jnp.sum(out * w)

    gk = jax.grad(f_kernel)(y)
    gr = jax.grad(f_ref)(y)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(gr),
                               rtol=1e-5, atol=1e-6)


def test_column_bounds_matches_searchsorted():
    rng = np.random.default_rng(5)
    nx, ny, _ = GRID
    n = 20
    cells = np.sort(rng.choice(nx * ny, n, replace=False))
    V = 32
    col_xy = np.full((V, 2), -1, np.int32)
    col_xy[:n, 0] = cells // ny
    col_xy[:n, 1] = cells % ny
    mask = np.arange(V) < n
    b = column_bounds(jnp.asarray(col_xy), jnp.asarray(mask), nx)
    want = np.searchsorted(col_xy[:n, 0], np.arange(nx + 1), side="left")
    np.testing.assert_array_equal(np.asarray(b), want)
    assert int(b[-1]) == n


def test_merge_against_compact_columns_pipeline():
    """End-to-end shape check with real compact_columns outputs."""
    rng = np.random.default_rng(6)
    nx, ny, nz = GRID
    V = 48
    cells = np.sort(rng.choice(nx * ny * nz, V, replace=False))
    coords = np.stack([cells // (ny * nz), (cells // nz) % ny,
                       cells % nz], 1).astype(np.int32)
    feats = rng.normal(size=(V, 4)).astype(np.float32)
    mask = np.ones(V, bool)
    cols, col_xy, col_mask = compact_columns(
        jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask), GRID,
        assume_sorted=True)
    b = column_bounds(col_xy, col_mask, nx)
    y = jnp.asarray(rng.normal(size=(1, V, 9, R)).astype(np.float32))
    out = merge_taps(y, col_xy[None, :, 1], b[None], GRID, "pallas")
    assert out.shape == (1, nx, ny, R)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# fused merge (bias + relu + stats in-kernel)
# ---------------------------------------------------------------------------

def _fused_args(seed, **kw):
    from mvxnet_makise_tpu.ops.pallas_column_merge import merge_taps_fused
    y, col_cy, bounds, _ = _cols(seed, **kw)
    rng = np.random.default_rng(seed + 100)
    bias = jnp.asarray(rng.normal(size=(R,)).astype(np.float32))
    return merge_taps_fused, y, col_cy, bounds, bias


def test_merge_fused_matches_reference():
    fused, y, col_cy, bounds, bias = _fused_args(10)
    out, stats = fused(y, col_cy, bounds, bias, GRID, "pallas")
    ref_out, ref_stats = fused(y, col_cy, bounds, bias, GRID, "xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(ref_stats),
                               rtol=1e-5, atol=1e-5)
    # spot-check semantics: out == relu(merge + bias)
    merged = merge_taps(y, col_cy, bounds, GRID, "xla")
    want = np.maximum(np.asarray(merged) + np.asarray(bias), 0.0)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5,
                               atol=1e-6)


def test_merge_fused_multi_chunk_and_empty():
    fused, y, col_cy, bounds, bias = _fused_args(11, V=96, dense_row=True)
    bounds = bounds.at[1].set(0)      # frame 1 empty
    out, stats = fused(y, col_cy, bounds, bias, GRID, "pallas")
    ref_out, ref_stats = fused(y, col_cy, bounds, bias, GRID, "xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(stats), np.asarray(ref_stats),
                               rtol=1e-5, atol=1e-5)
    # empty frame: every cell is relu(bias), stats follow
    want_row = np.maximum(np.asarray(bias), 0.0)
    np.testing.assert_allclose(
        np.asarray(out)[1], np.broadcast_to(want_row, out[1].shape),
        rtol=1e-6, atol=1e-7)


def test_merge_fused_grad_matches_composition():
    fused, y, col_cy, bounds, bias = _fused_args(12)
    ny = GRID[1]
    rng = np.random.default_rng(55)
    w = jnp.asarray(rng.normal(size=(2, GRID[0], ny, R)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(2, GRID[0], 2, R)).astype(np.float32))

    def f(yv, bv, backend):
        out, stats = fused(yv, col_cy, bounds, bv, GRID, backend)
        return jnp.sum(out * w) + jnp.sum(stats * ws)

    gk = jax.grad(f, argnums=(0, 1))(y, bias, "pallas")
    gr = jax.grad(lambda yv, bv: jnp.sum(
        jnp.maximum(merge_taps(yv, col_cy, bounds, GRID, "xla") + bv,
                    0.0) * w)
        + jnp.sum(jnp.stack([
            jnp.sum(jnp.maximum(merge_taps(yv, col_cy, bounds, GRID,
                                           "xla") + bv, 0.0), axis=2),
            jnp.sum(jnp.square(jnp.maximum(
                merge_taps(yv, col_cy, bounds, GRID, "xla") + bv, 0.0)),
                axis=2)], axis=2) * ws),
        argnums=(0, 1))(y, bias)
    np.testing.assert_allclose(np.asarray(gk[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gk[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-5)
