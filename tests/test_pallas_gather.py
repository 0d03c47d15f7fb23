"""Tests for ops/pallas_gather — the banded selector-matmul FPN gather.

Reference semantics under test: featureMaping
(/root/reference/modules/imhead/Pipe.py:23-82) as already captured by
ops/gather.bilinear_gather_fpn (itself oracle-tested in test_ops.py);
here we prove the Pallas reformulation is numerically identical,
differentiable, and that its band/window layout invariants hold.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn
from mvxnet_makise_tpu.ops.pallas_gather import (
    fpn_gather_banded,
    fpn_gather_banded_diff,
    plan_band_layout,
)

IMG = (37, 122)
SHAPES = [(16, 24, 8), (8, 12, 8), (4, 6, 8)]


def _data(seed, B=2, P=64, clustered=False):
    rng = np.random.default_rng(seed)
    feats = [jnp.asarray(rng.normal(size=(B, *s)), jnp.float32)
             for s in SHAPES]
    if clustered:
        # many points in few image rows — exercises multi-window bands
        r = rng.choice([3.0, 3.5, 30.0], (B, P), p=[0.5, 0.4, 0.1])
        r = r + rng.uniform(0, 0.4, (B, P))
    else:
        r = rng.uniform(0, IMG[0], (B, P))
    rc = jnp.asarray(np.stack([r, rng.uniform(0, IMG[1], (B, P))], -1),
                     jnp.float32)
    ok = jnp.asarray(rng.random((B, P)) < 0.8)
    return feats, rc, ok


def _ref(feats, rc, ok, swapped=False):
    return jax.vmap(lambda f0, f1, f2, r, o: bilinear_gather_fpn(
        [f0, f1, f2], r, o, IMG, swapped_weights=swapped))(
        feats[0], feats[1], feats[2], rc, ok)


@pytest.mark.parametrize("window", [8, 16])
@pytest.mark.parametrize("clustered", [False, True])
def test_kernel_matches_xla_gather(window, clustered):
    feats, rc, ok = _data(0, clustered=clustered)
    ref = _ref(feats, rc, ok)
    got, pos, padmask = fpn_gather_banded(
        feats, rc, ok, IMG, window=window, interpret=True)
    out = jnp.take_along_axis(got, pos[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)
    # padding rows are exactly zero and the padmask mirrors validity
    assert float(jnp.max(jnp.abs(
        jnp.where(padmask[..., None], 0.0, got)))) == 0.0
    for b in range(2):
        pm = np.zeros(padmask.shape[1], bool)
        pm[np.asarray(pos)[b]] = np.asarray(ok)[b]
        assert (pm == np.asarray(padmask)[b]).all()


def test_kernel_matches_swapped_variant():
    feats, rc, ok = _data(1)
    ref = _ref(feats, rc, ok, swapped=True)
    got, pos, _ = fpn_gather_banded(
        feats, rc, ok, IMG, swapped_weights=True, window=8,
        interpret=True)
    out = jnp.take_along_axis(got, pos[..., None], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-6)


def test_gradients_match_xla_path():
    feats, rc, ok = _data(2, P=48)
    feats = tuple(feats)
    tgt = jnp.asarray(np.random.default_rng(3).normal(size=(2, 48, 24)),
                      jnp.float32)

    def loss_ref(fs):
        return jnp.sum((_ref(list(fs), rc, ok) - tgt) ** 2)

    def loss_pl(fs):
        got, pos, _ = fpn_gather_banded_diff(
            fs, rc, ok, IMG, 1e-6, False, 8, True)
        out = jnp.take_along_axis(got, pos[..., None], axis=1)
        return jnp.sum((out - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(feats)
    g_pl = jax.grad(loss_pl)(feats)
    for a, b in zip(g_ref, g_pl):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


def test_band_layout_invariants():
    rng = np.random.default_rng(4)
    P, n_bands, window = 300, 20, 16
    n_windows = P // window + n_bands
    band = jnp.asarray(rng.integers(0, n_bands, P), jnp.int32)
    order, pos, bow = plan_band_layout(band, n_bands, window, n_windows)
    pos_np, order_np = np.asarray(pos), np.asarray(order)
    band_np = np.asarray(band)

    # positions are unique and within capacity
    assert len(set(pos_np.tolist())) == P
    assert pos_np.max() < n_windows * window
    # every point's window is attributed to the point's own band
    bow_np = np.asarray(bow)
    for j in range(P):
        assert bow_np[pos_np[j] // window] == band_np[order_np[j]]


@pytest.mark.slow
def test_point_image_head_backend_equivalence():
    """Full head (ResNet-FPN + gather + fusion): pallas == xla."""
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
    hp = PointImageHead(img_size, gather_backend="pallas")
    params = hx.init(jax.random.key(0), images, rc, kept, n_virtual)
    ox, zx = hx.apply(params, images, rc, kept, n_virtual)
    op, zp = hp.apply(params, images, rc, kept, n_virtual)
    np.testing.assert_allclose(np.asarray(ox), np.asarray(op), atol=1e-4)
    np.testing.assert_allclose(np.asarray(zx), np.asarray(zp), atol=1e-5)


def test_raw4_fused_coarse_matches_per_level(rng):
    """raw4f (one combined wide-row gather for the coarse levels) must
    match the per-level raw4 gather (floor-identity exactness; see
    ops/gather.bilinear_gather_fpn_batch)."""
    import jax.numpy as jnp

    from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn_batch

    B, P = 3, 257
    shapes = [(12, 16, 8), (6, 8, 8), (3, 4, 8)]
    pyr = tuple(jnp.asarray(rng.standard_normal((B, *s)), jnp.float32)
                for s in shapes)
    im = (48.0, 64.0)
    pts = jnp.asarray(np.stack([
        rng.uniform(0, im[0] - 1e-3, (B, P)),
        rng.uniform(0, im[1] - 1e-3, (B, P))], axis=-1), jnp.float32)
    ok = jnp.asarray(rng.random((B, P)) < 0.8)
    a = bilinear_gather_fpn_batch(pyr, pts, ok, im)
    b = bilinear_gather_fpn_batch(pyr, pts, ok, im, fuse_coarse=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-5)

    # swapped weights must silently fall back to per-level (exactness
    # argument doesn't hold there) and still agree with itself
    c = bilinear_gather_fpn_batch(pyr, pts, ok, im, swapped_weights=True,
                                  fuse_coarse=True)
    d = bilinear_gather_fpn_batch(pyr, pts, ok, im, swapped_weights=True)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_raw4_fused_coarse_gradients_match(rng):
    """raw4f must also agree with raw4 under differentiation (its
    backward runs repeat-reduce + scatter-add through the combined
    table)."""
    import jax
    import jax.numpy as jnp

    from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn_batch

    B, P = 2, 64
    shapes = [(8, 12, 4), (4, 6, 4), (2, 3, 4)]
    pyr = tuple(jnp.asarray(rng.standard_normal((B, *s)), jnp.float32)
                for s in shapes)
    im = (32.0, 48.0)
    pts = jnp.asarray(np.stack([
        rng.uniform(0, im[0] - 1e-3, (B, P)),
        rng.uniform(0, im[1] - 1e-3, (B, P))], axis=-1), jnp.float32)
    ok = jnp.asarray(rng.random((B, P)) < 0.8)
    w = jnp.asarray(rng.standard_normal((B, P, 12)), jnp.float32)

    def loss(pyr_, fuse):
        g = bilinear_gather_fpn_batch(pyr_, pts, ok, im, fuse_coarse=fuse)
        return jnp.sum(g * w)

    g0 = jax.grad(lambda p: loss(p, False))(pyr)
    g1 = jax.grad(lambda p: loss(p, True))(pyr)
    for a, b in zip(g0, g1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
