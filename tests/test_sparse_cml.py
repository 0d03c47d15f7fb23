"""Sparse-input CML head vs the dense scatter+conv reference path.

sparse_conv3d_d2 (ops/sparse_conv.py) claims bit-compatible math with
``scatter_voxels_to_grid`` followed by ``nn.Conv(k=3, strides=(2,1,1),
padding=1)`` — the reference CML's first layer (Pipe.py:31-43) — while
never materializing the dense 128-channel grid.  Verified here for the
full MiddleConvLayers stack and both scatter-add groupings, including
the collision case the 9-merged grouping must survive (a z-column of
voxels at z = 2k-1, 2k, 2k+1 all feeding output depth k).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.models.voxelnet import (MiddleConvLayers,
                                               MiddleConvLayersSparse)
from mvxnet_makise_tpu.ops.scatter import scatter_voxels_to_grid
from mvxnet_makise_tpu.ops.sparse_conv import sparse_conv3d_d2

GRID = (24, 20, 10)


def _scene(rng, B=2, V=96, dense_columns=True):
    n_cells = GRID[0] * GRID[1] * GRID[2]
    # a full z-column (consecutive z in one (x, y) column) forces the
    # depth-tap collision case; the rest are random distinct cells
    column = (5 * GRID[1] + 7) * GRID[2] + np.arange(GRID[2]) \
        if dense_columns else np.empty(0, np.int64)
    pool = np.setdiff1d(np.arange(n_cells), column)
    flats = np.stack([
        rng.permutation(np.concatenate(
            [column, rng.choice(pool, V - len(column), replace=False)]))
        for _ in range(B)])
    coords = np.stack([flats // (GRID[1] * GRID[2]),
                       (flats // GRID[2]) % GRID[1],
                       flats % GRID[2]], axis=-1).astype(np.int32)
    vmask = np.ones((B, V), bool)
    vmask[:, V - 12:] = False
    feat = rng.normal(0, 1, (B, V, 16)).astype(np.float32)
    feat[~vmask] = 0
    coords[~vmask] = -1
    return (jnp.asarray(feat), jnp.asarray(coords), jnp.asarray(vmask))


def test_sparse_cml_equals_dense_cml():
    rng = np.random.default_rng(0)
    feat, coords, vmask = _scene(rng)

    dense_m = MiddleConvLayers(eps=1e-6)
    sparse_m = MiddleConvLayersSparse(eps=1e-6, grid_shape=GRID)
    grid = jax.vmap(lambda f, c, m: scatter_voxels_to_grid(
        f, c, m, GRID))(feat, coords, vmask)
    params = dense_m.init(jax.random.key(0), grid)

    out_d = dense_m.apply(params, grid)
    out_s = jax.jit(sparse_m.apply)(params, feat, coords, vmask)
    assert out_s.shape == out_d.shape
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_d),
                               rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("unique_taps", [True, False])
def test_sparse_conv1_groupings_equal_dense_conv(unique_taps):
    import flax.linen as nn

    rng = np.random.default_rng(1)
    feat, coords, vmask = _scene(rng)
    kernel = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 16, 8)),
                         jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (8,)), jnp.float32)

    grid = jax.vmap(lambda f, c, m: scatter_voxels_to_grid(
        f, c, m, GRID))(feat, coords, vmask)
    ref = jax.lax.conv_general_dilated(
        grid, kernel, window_strides=(2, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC")) + bias

    out = jax.jit(jax.vmap(lambda f, c, m: sparse_conv3d_d2(
        f, c, m, kernel, bias, GRID, unique_taps=unique_taps)))(
        feat, coords, vmask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5)


def test_sparse_conv1_gradients_flow():
    rng = np.random.default_rng(2)
    feat, coords, vmask = _scene(rng, B=1, V=32)
    kernel = jnp.asarray(rng.normal(0, 0.1, (3, 3, 3, 16, 8)))
    bias = jnp.zeros((8,))

    def loss(k, f):
        out = jax.vmap(lambda a, c, m: sparse_conv3d_d2(
            a, c, m, k, bias, GRID))(f, coords, vmask)
        return jnp.sum(out ** 2)

    gk, gf = jax.grad(loss, argnums=(0, 1))(kernel, feat)
    assert np.isfinite(np.asarray(gk)).all()
    assert np.abs(np.asarray(gk)).sum() > 0
    # padded rows receive zero gradient (their index is the dump row)
    gf = np.asarray(gf)
    assert np.abs(gf[~np.asarray(vmask)]).sum() == 0


def test_scatter_backend_pallas_matches_xla_and_trains():
    """models.voxelnet._scatter: the pallas backend must match the XLA
    backend in value AND gradient (custom VJP = row gather)."""
    from mvxnet_makise_tpu.models.voxelnet import _scatter

    rng = np.random.default_rng(5)
    feat, coords, vmask = _scene(rng, B=1)
    f, c, m = feat[0], coords[0], vmask[0]

    out_x = _scatter(f, c, m, GRID, "xla")
    out_p = _scatter(f, c, m, GRID, "pallas")
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=1e-6)

    w = jnp.asarray(np.random.default_rng(6).normal(
        0, 1, out_x.shape).astype(np.float32))

    def loss(feats, backend):
        return jnp.sum(_scatter(feats, c, m, GRID, backend) * w)

    gx = jax.grad(lambda z: loss(z, "xla"))(f)
    gp = jax.grad(lambda z: loss(z, "pallas"))(f)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=1e-6)
