"""Banded-scatter conv1 (ops/scatter.scatter_voxels_to_conv1_bands +
models/voxelnet.MiddleConvLayersBanded) must be numerically identical to
the classic scatter + strided-3D-conv CML — same math, same parameter
tree, only the dataflow differs (reference semantics: VoxelNet.py:16-22
reindex then Pipe.py:33 conv1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.models.voxelnet import (
    MiddleConvLayers,
    MiddleConvLayersBanded,
    VoxelNetBranch,
)
from mvxnet_makise_tpu.ops.scatter import (
    scatter_voxels_to_conv1_bands,
    scatter_voxels_to_grid,
)

GRID = (16, 24, 10)


def _scene(seed, B=2, V=40, C=16):
    rng = np.random.default_rng(seed)
    feats = jnp.asarray(rng.normal(size=(B, V, C)), jnp.float32)
    nx, ny, nz = GRID
    cells = np.stack([rng.choice(nx * ny * nz, V, replace=False)
                      for _ in range(B)])
    coords = jnp.asarray(np.stack(
        [cells // (ny * nz), (cells // nz) % ny, cells % nz],
        axis=2).astype(np.int32))
    mask = jnp.asarray(rng.random((B, V)) < 0.8)
    return feats, coords, mask


def test_banded_scatter_matches_dense_conv_input():
    """The banded layout is exactly the depth-im2col of the dense grid."""
    feats, coords, mask = _scene(0)
    nx, ny, nz = GRID
    d_out = (nz - 1) // 2 + 1
    for b in range(2):
        dense = np.asarray(scatter_voxels_to_grid(
            feats[b], coords[b], mask[b], GRID))        # (nz, nx, ny, C)
        banded = np.asarray(scatter_voxels_to_conv1_bands(
            feats[b], coords[b], mask[b], GRID))        # (d, nx, ny, 3C)
        C = feats.shape[-1]
        for d in range(d_out):
            for kd in range(3):
                z = 2 * d - 1 + kd
                want = (dense[z] if 0 <= z < nz
                        else np.zeros_like(dense[0]))
                got = banded[d, :, :, kd * C:(kd + 1) * C]
                np.testing.assert_array_equal(got, want)


def test_banded_cml_matches_dense3d():
    feats, coords, mask = _scene(1, C=16)
    dense_in = jax.vmap(lambda f, c, m: scatter_voxels_to_grid(
        f, c, m, GRID))(feats, coords, mask)

    ref_mod = MiddleConvLayers()
    params = ref_mod.init(jax.random.key(0), dense_in)
    ref = ref_mod.apply(params, dense_in)

    banded_mod = MiddleConvLayersBanded(grid_shape=GRID)
    got = banded_mod.apply(params, feats, coords, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_branch_modes_match_forward_and_grad():
    """Full LiDAR branch: cml_mode='banded' == 'dense3d' (fwd + grads).

    Runs in float64: the stateless norms over a nearly-empty test grid
    are ill-conditioned in f32 (the SAME formulation's grads move by
    ~1% across XLA CPU configs), so only f64 makes the equivalence
    check meaningful.
    """
    with jax.enable_x64(True):
        rng = np.random.default_rng(2)
        B, V, T = 2, 40, 5
        vox = jnp.asarray(rng.normal(size=(B, V, T, 7)), jnp.float64)
        _, coords, mask = _scene(3, B=B, V=V)
        coords = coords.astype(jnp.int64)

        b_dense = VoxelNetBranch(grid_shape=GRID, cml_mode="dense3d")
        b_band = VoxelNetBranch(grid_shape=GRID, cml_mode="banded")
        params = jax.tree.map(
            lambda x: x.astype(jnp.float64),
            b_dense.init(jax.random.key(1), vox, coords, mask))

        sd, rd = b_dense.apply(params, vox, coords, mask)
        sb, rb = b_band.apply(params, vox, coords, mask)
        np.testing.assert_allclose(np.asarray(sb), np.asarray(sd),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(rb), np.asarray(rd),
                                   rtol=1e-8, atol=1e-8)

        def loss(p, mod):
            s, r = mod.apply(p, vox, coords, mask)
            return jnp.sum(s ** 2) + jnp.sum(r ** 2)

        gd = jax.grad(loss)(params, b_dense)
        gb = jax.grad(loss)(params, b_band)
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gb)):
            scale = float(jnp.max(jnp.abs(a)))
            diff = float(jnp.max(jnp.abs(a - b)))
            assert diff <= 1e-7 * scale + 1e-7, (diff, scale)
