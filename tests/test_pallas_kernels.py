"""Pallas kernel tests (interpreter mode on CPU) vs XLA reference ops."""

import numpy as np
import jax.numpy as jnp

from mvxnet_makise_tpu.ops.pallas_scatter import pallas_scatter_to_grid
from mvxnet_makise_tpu.ops.scatter import scatter_voxels_to_grid

GRID = (16, 20, 4)


def make_case(rng, V=64, C=8):
    feats = rng.normal(size=(V, C)).astype(np.float32)
    flat = rng.choice(GRID[0] * GRID[1] * GRID[2], V, replace=False)
    coords = np.stack([flat // (GRID[1] * GRID[2]) % GRID[0],
                       (flat // GRID[2]) % GRID[1],
                       flat % GRID[2]], axis=1).astype(np.int32)
    # decode differently: coords layout is (ix, iy, iz)
    coords = np.stack([flat // (GRID[1] * GRID[2]),
                       (flat // GRID[2]) % GRID[1],
                       flat % GRID[2]], axis=1).astype(np.int32)
    mask = np.ones(V, dtype=bool)
    mask[-8:] = False
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask)


def test_pallas_scatter_matches_xla(rng):
    feats, coords, mask = make_case(rng)
    ref = np.asarray(scatter_voxels_to_grid(feats, coords, mask, GRID))
    out = np.asarray(pallas_scatter_to_grid(feats, coords, mask, GRID,
                                            interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_pallas_scatter_all_masked(rng):
    feats, coords, mask = make_case(rng)
    mask = jnp.zeros_like(mask)
    out = np.asarray(pallas_scatter_to_grid(feats, coords, mask, GRID,
                                            interpret=True))
    assert np.all(out == 0)
