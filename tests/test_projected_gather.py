"""Projected FPN gather: fcn1 commutes with the bilinear gather.

The fusion MLP's first linear layer (768 -> 128) applied to gathered
features equals gathering *pre-projected* (128-wide) maps and summing the
levels (linearity of bilinear interpolation), so the head can shrink
every gathered row 2x and fold all levels into one patch-table gather —
``gather_backend="projected"`` (models/image_head.py).  Reference
semantics under test: featureMaping + the first fusion layer,
/root/reference/modules/imhead/Pipe.py:23-82 + Head.py:14-20.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.ops.gather import (
    bilinear_gather_fpn,
    projected_bilinear_gather_fpn,
)

IMG = (32, 48)
# exactly-halving pyramid, as the real 416x1344 transform produces
SHAPES = [(8, 12), (4, 6), (2, 3)]


def _pyramid(rng, C, dtype):
    return [jnp.asarray(rng.normal(size=(h, w, C)), dtype)
            for (h, w) in SHAPES]


def _points(rng, P, dtype):
    rc = jnp.asarray(np.stack([rng.uniform(0, IMG[0], P),
                               rng.uniform(0, IMG[1], P)], -1), dtype)
    ok = jnp.asarray(rng.random(P) < 0.8)
    return rc, ok


@pytest.mark.parametrize("swapped", [False, True])
def test_projected_equals_per_level_sum_x64(swapped):
    """Fused-one-gather path == per-level gather+sum (same proj maps)."""
    with jax.enable_x64(True):
        rng = np.random.default_rng(0)
        proj = _pyramid(rng, 16, jnp.float64)
        rc, ok = _points(rng, 200, jnp.float64)

        got = projected_bilinear_gather_fpn(
            proj, rc, ok, IMG, swapped_weights=swapped)

        want = sum(
            bilinear_gather_fpn([f], rc, ok, IMG, swapped_weights=swapped)
            for f in proj)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)

        # the capped (per-level) route — what KITTI-sized pyramids take,
        # where the combined table would overflow HBM — must agree too
        capped = projected_bilinear_gather_fpn(
            proj, rc, ok, IMG, swapped_weights=swapped,
            fuse_table_limit=0)
        np.testing.assert_allclose(np.asarray(capped), np.asarray(want),
                                   rtol=1e-12, atol=1e-12)


def test_projection_commutes_with_gather_x64():
    """W^T gather(f) == projected-gather(f @ W_l) + bias, exactly."""
    with jax.enable_x64(True):
        rng = np.random.default_rng(1)
        C, K = 24, 10
        feats = _pyramid(rng, C, jnp.float64)
        rc, ok = _points(rng, 150, jnp.float64)
        W = jnp.asarray(rng.normal(size=(3 * C, K)), jnp.float64)
        b = jnp.asarray(rng.normal(size=(K,)), jnp.float64)

        gathered = bilinear_gather_fpn(feats, rc, ok, IMG)
        want = gathered @ W + b

        proj = [f @ W[l * C:(l + 1) * C] for l, f in enumerate(feats)]
        s = projected_bilinear_gather_fpn(proj, rc, ok, IMG)
        got = s + b
        # invalid rows: gathered == 0 -> want == bias; projected path
        # zeroes s and re-adds bias — identical by construction
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-10, atol=1e-10)


def test_projected_gather_grads():
    """Grads flow to the projected maps (i.e. to fcn1's kernel upstream)."""
    rng = np.random.default_rng(2)
    proj = _pyramid(rng, 8, jnp.float32)
    rc, ok = _points(rng, 64, jnp.float32)

    def loss(maps):
        return jnp.sum(projected_bilinear_gather_fpn(
            maps, rc, ok, IMG) ** 2)

    grads = jax.grad(loss)(proj)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in grads)
    assert any(np.any(np.asarray(g) != 0) for g in grads)


@pytest.mark.slow
def test_point_image_head_projected_equivalence():
    """Full head (ResNet-FPN + gather + fusion): projected == xla."""
    from mvxnet_makise_tpu.models.image_head import PointImageHead

    rng = np.random.default_rng(5)
    B, P = 2, 96
    img_size = (64, 96)
    images = jnp.asarray(rng.uniform(0, 1, (B, *img_size, 3)), jnp.float32)
    rc = jnp.asarray(np.stack(
        [rng.uniform(0, img_size[0], (B, P)),
         rng.uniform(0, img_size[1], (B, P))], -1), jnp.float32)
    kept = jnp.asarray(rng.random((B, P)) < 0.8)
    n_virtual = jnp.asarray(37.0)

    hx = PointImageHead(img_size, gather_backend="xla")
    hp = PointImageHead(img_size, gather_backend="projected")
    params = hx.init(jax.random.key(0), images, rc, kept, n_virtual)
    # identical parameter trees: projected mode loads the same checkpoints
    pp = hp.init(jax.random.key(0), images, rc, kept, n_virtual)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pp))
    ox, zx = hx.apply(params, images, rc, kept, n_virtual)
    op, zp = hp.apply(params, images, rc, kept, n_virtual)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(op), atol=2e-4)
    np.testing.assert_allclose(np.asarray(zx), np.asarray(zp), atol=1e-4)

    def loss(p, head):
        o, z = head.apply(p, images, rc, kept, n_virtual)
        return jnp.sum(o ** 2) + jnp.sum(z ** 2)

    gx = jax.grad(loss)(params, hx)
    gp = jax.grad(loss)(params, hp)
    # fusion grads must agree (frozen extractor carries no grads)
    fx = jax.tree.leaves(gx["params"]["fusion"])
    fp = jax.tree.leaves(gp["params"]["fusion"])
    for a, b in zip(fx, fp):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1e-3)
        assert np.max(np.abs(a - b)) < 5e-3 * scale
