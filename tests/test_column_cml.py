"""Column-compacted conv1 (ops/column_conv.py +
models/voxelnet.MiddleConvLayersColumn) must be numerically equivalent
to the classic scatter + strided-3D-conv CML — same math, same parameter
tree, only the dataflow differs (reference semantics: VoxelNet.py:16-22
reindex then Pipe.py:33 conv1)."""

import numpy as np

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.models.voxelnet import (
    MiddleConvLayers,
    MiddleConvLayersColumn,
    VoxelNetBranch,
)
from mvxnet_makise_tpu.ops.column_conv import (
    column_conv1_d2,
    compact_columns,
)
from mvxnet_makise_tpu.ops.scatter import scatter_voxels_to_grid

GRID = (16, 24, 10)


def _scene(seed, B=2, V=40, C=16, sort=False):
    rng = np.random.default_rng(seed)
    feats = np.asarray(rng.normal(size=(B, V, C)), np.float32)
    nx, ny, nz = GRID
    cells = np.stack([np.sort(rng.choice(nx * ny * nz, V, replace=False))
                      if sort else rng.choice(nx * ny * nz, V,
                                              replace=False)
                      for _ in range(B)])
    coords = np.stack(
        [cells // (ny * nz), (cells // nz) % ny, cells % nz],
        axis=2).astype(np.int32)
    mask = rng.random((B, V)) < 0.8
    if sort:
        # voxelizer invariant: dead rows trail, coords there are -1
        for b in range(B):
            keep = np.flatnonzero(mask[b])
            n = len(keep)
            feats[b, :n], coords[b, :n] = feats[b, keep], coords[b, keep]
            feats[b, n:], coords[b, n:] = 0.0, -1
            mask[b] = np.arange(V) < n
    return jnp.asarray(feats), jnp.asarray(coords), jnp.asarray(mask)


def _dense_conv1(feats, coords, mask, kernel):
    """Oracle: scatter to dense grid + lax 3D conv, per frame."""
    dense = scatter_voxels_to_grid(feats, coords, mask, GRID)
    out = jax.lax.conv_general_dilated(
        dense[None].astype(jnp.float32), kernel.astype(jnp.float32),
        window_strides=(2, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
    return out[0]


def test_compact_columns_roundtrip():
    feats, coords, mask = _scene(0)
    nx, ny, nz = GRID
    for b in range(2):
        cols, col_xy, col_mask = jax.jit(
            lambda f, c, m: compact_columns(f, c, m, GRID))(
            feats[b], coords[b], mask[b])
        dense = np.asarray(scatter_voxels_to_grid(
            feats[b], coords[b], mask[b], GRID))       # (nz, nx, ny, C)
        cols, col_xy, col_mask = map(np.asarray, (cols, col_xy, col_mask))
        n = int(col_mask.sum())
        # each active column's stack equals the dense grid's z-column
        seen = set()
        for c in range(n):
            x, y = col_xy[c]
            seen.add((x, y))
            np.testing.assert_array_equal(
                cols[c], dense[:, x, y, :])
        # every nonzero dense column is covered
        nonzero = {(x, y) for x in range(nx) for y in range(ny)
                   if np.any(dense[:, x, y, :])}
        assert nonzero <= seen
        # dead slots are zero
        assert not np.any(cols[n:])


def test_compact_columns_assume_sorted_matches():
    feats, coords, mask = _scene(1, sort=True)
    for b in range(2):
        a = compact_columns(feats[b], coords[b], mask[b], GRID,
                            assume_sorted=True)
        c = compact_columns(feats[b], coords[b], mask[b], GRID,
                            assume_sorted=False)
        for x, y in zip(a, c):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_column_conv1_matches_dense_conv():
    feats, coords, mask = _scene(2, C=8)
    rng = np.random.default_rng(7)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, 8, 12)) * 0.1,
                         jnp.float32)
    for b in range(2):
        ref = _dense_conv1(feats[b], coords[b], mask[b], kernel)
        cols, col_xy, col_mask = compact_columns(
            feats[b], coords[b], mask[b], GRID)
        got = column_conv1_d2(cols, col_xy, col_mask, kernel, GRID)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


def test_folded_taps_matmul_matches_im2col():
    """The depth-unrolled folded matmul (one dot, merge-ready layout)
    must equal the im2col tap matmul up to f32 summation order — the
    unrolled kernel's zero entries contribute exactly zero."""
    from mvxnet_makise_tpu.ops.column_conv import (
        column_taps_matmul, column_taps_matmul_folded)

    rng = np.random.default_rng(11)
    nz, Cin, Cout = GRID[2], 8, 12
    cols = jnp.asarray(rng.normal(size=(40, nz, Cin)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 3, Cin, Cout)) * 0.1,
                         jnp.float32)
    ref = column_taps_matmul(cols, kernel)           # (V, d, 9, Co)
    d_out = ref.shape[1]
    ref = jnp.transpose(ref, (0, 2, 1, 3)).reshape(40, 9, d_out * Cout)
    got = column_taps_matmul_folded(cols, kernel, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_banded_conv_matches_dlast():
    """ConvReluNormBanded ((D, C)-folded 2D conv) == ConvReluNormDLast
    (NHWDC 3D conv) for the CML conv2 and conv3 geometries — same
    parameter tree, same math; only zero-block FLOPs differ."""
    from mvxnet_makise_tpu.models.voxelnet import (
        ConvReluNormBanded, ConvReluNormDLast)

    rng = np.random.default_rng(5)
    for D, strides, padding in [
        (5, (1, 1, 1), ((0, 0), (1, 1), (1, 1))),   # conv2: D 5->3
        (3, (2, 1, 1), ((1, 1), (1, 1), (1, 1))),   # conv3: D 3->2
        (4, (2, 1, 1), ((1, 0), (1, 1), (1, 1))),   # asymmetric depth pad
    ]:
        x = jnp.asarray(rng.normal(size=(2, 9, 11, D, 16)), jnp.float32)
        ref_mod = ConvReluNormDLast(12, strides, padding)
        params = ref_mod.init(jax.random.key(1), x)
        ref = ref_mod.apply(params, x)
        got = ConvReluNormBanded(12, strides, padding).apply(params, x)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_column_cml_matches_dense3d():
    # sort=True: the module path sets assume_sorted (voxelizer invariant)
    feats, coords, mask = _scene(3, C=16, sort=True)
    dense_in = jax.vmap(lambda f, c, m: scatter_voxels_to_grid(
        f, c, m, GRID))(feats, coords, mask)

    ref_mod = MiddleConvLayers()
    params = ref_mod.init(jax.random.key(0), dense_in)
    ref = ref_mod.apply(params, dense_in)

    col_mod = MiddleConvLayersColumn(grid_shape=GRID)
    # the column module emits the depth-minor layout (B, H, W, D, C)
    got = jnp.transpose(col_mod.apply(params, feats, coords, mask),
                        (0, 3, 1, 2, 4))
    # f32 tolerance: the fused merge computes the standardize variance
    # one-pass (E[x^2] - mean^2 from kernel-emitted sums) vs the dense
    # path's two-pass form — ~1e-4 divergence on normalized outputs in
    # f32; exact agreement is checked at 1e-9 under x64 in
    # test_branch_column_matches_dense3d_forward_and_grad
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_branch_column_matches_dense3d_forward_and_grad():
    """Full LiDAR branch: cml_mode='column' == 'dense3d' (fwd + grads).

    float64 for the same conditioning reason as the banded twin
    (tests/test_banded_cml.py): stateless norms over a nearly-empty test
    grid amplify f32 noise beyond comparability.
    """
    with jax.enable_x64(True):
        rng = np.random.default_rng(4)
        B, V, T = 2, 40, 5
        vox = jnp.asarray(rng.normal(size=(B, V, T, 7)), jnp.float64)
        _, coords, mask = _scene(5, B=B, V=V, sort=True)
        coords = coords.astype(jnp.int64)

        b_dense = VoxelNetBranch(grid_shape=GRID, cml_mode="dense3d")
        b_col = VoxelNetBranch(grid_shape=GRID, cml_mode="column")
        params = jax.tree.map(
            lambda x: x.astype(jnp.float64),
            b_dense.init(jax.random.key(1), vox, coords, mask))

        sd, rd = b_dense.apply(params, vox, coords, mask)
        sc, rc = b_col.apply(params, vox, coords, mask)
        np.testing.assert_allclose(np.asarray(sc), np.asarray(sd),
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(rc), np.asarray(rd),
                                   rtol=1e-8, atol=1e-8)

        def loss(p, mod):
            s, r = mod.apply(p, vox, coords, mask)
            return jnp.sum(s ** 2) + jnp.sum(r ** 2)

        gd = jax.grad(loss)(params, b_dense)
        gc = jax.grad(loss)(params, b_col)
        for a, b in zip(jax.tree.leaves(gd), jax.tree.leaves(gc)):
            scale = float(jnp.max(jnp.abs(a)))
            diff = float(jnp.max(jnp.abs(a - b)))
            assert diff <= 1e-7 * scale + 1e-7, (diff, scale)
