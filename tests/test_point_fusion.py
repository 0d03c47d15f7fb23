"""Point-fusion fast path: exact equivalence with the slot-based model.

MVXNetPointFusion must reproduce MVXNet (slot-grid dataflow, the
reference's semantics) bit-for-bit up to float tolerance — same params,
same outputs — while doing ~13x less image-branch work.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.models import MVXNet, MVXNetPointFusion
from mvxnet_makise_tpu.ops.voxelize import voxelize

CFG = Config(
    velo_range=(0.0, -8.0, -3.0, 12.8, 8.0, 1.0),
    voxel_shape=(16, 16, 10),
    image_size=(64, 96),
    max_points=256, max_voxels=64, max_boxes=4,
    samples_per_voxel=4)


def make_scene(rng, n_points=200, B=1):
    P = CFG.max_points
    pts = np.zeros((B, P, 6), np.float32)
    for b in range(B):
        pts[b, :n_points, 0] = rng.uniform(0.5, 12.0, n_points)
        pts[b, :n_points, 1] = rng.uniform(-7.5, 7.5, n_points)
        pts[b, :n_points, 2] = rng.uniform(-2.5, 0.5, n_points)
        pts[b, :n_points, 3] = rng.uniform(0, 1, n_points)
        pts[b, :n_points, 4] = rng.uniform(0, 63, n_points)   # row
        pts[b, :n_points, 5] = rng.uniform(0, 95, n_points)   # col
    nums = np.full((B,), n_points, np.int32)
    imgs = rng.uniform(0, 1, (B, 64, 96, 3)).astype(np.float32)
    return jnp.asarray(pts), jnp.asarray(nums), jnp.asarray(imgs)


def voxelize_batch(pts, nums):
    return jax.vmap(lambda p, n: voxelize(
        p, n, velo_range=CFG.velo_range, voxel_size=CFG.voxel_size,
        grid_shape=CFG.voxel_shape, max_voxels=CFG.max_voxels,
        samples_per_voxel=CFG.samples_per_voxel))(pts, nums)


def test_voxelize_point_slots_roundtrip(rng):
    pts, nums, _ = make_scene(rng)
    g = jax.tree.map(np.asarray, voxelize_batch(pts, nums))
    slots = g.point_slots[0]
    T = CFG.samples_per_voxel
    kept = slots >= 0
    assert kept.sum() == int(g.num_kept[0])
    assert int(g.num_kept[0]) == int(g.counts[0].sum())
    # each kept point's xyz appears at its slot
    feats = g.features[0].reshape(-1, 9)
    pts_np = np.asarray(pts[0])
    for i in np.nonzero(kept)[0][:50]:
        np.testing.assert_allclose(feats[slots[i]][0:3], pts_np[i, 0:3],
                                   rtol=1e-6)
        np.testing.assert_allclose(feats[slots[i]][6:9], pts_np[i, 3:6],
                                   rtol=1e-6)
    # padding rows never land in a slot
    assert np.all(slots[int(nums[0]):] == -1)


@pytest.mark.slow
def test_point_fusion_matches_slot_model(rng):
    pts, nums, imgs = make_scene(rng)
    g = voxelize_batch(pts, nums)

    slot_model = MVXNet(grid_shape=CFG.voxel_shape,
                        image_size=CFG.image_size)
    pf_model = MVXNetPointFusion(grid_shape=CFG.voxel_shape,
                                 image_size=CFG.image_size)

    slot_args = (g.features, g.coords, g.mask, imgs)
    pf_args = (g.features, g.coords, g.mask, imgs, pts, g.point_slots)

    params = slot_model.init(jax.random.key(0), *slot_args)
    # identical parameter trees: the fast path loads the same checkpoints
    pf_params = pf_model.init(jax.random.key(0), *pf_args)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pf_params))

    s_score, s_reg = slot_model.apply(params, *slot_args)
    p_score, p_reg = pf_model.apply(params, *pf_args)

    # the paths agree to ~4e-5 at the fused image features; the
    # backbone's stacked small-sample normalizations amplify that float
    # drift, so check near-perfect correlation + a modest absolute bound
    s_score, p_score = np.asarray(s_score), np.asarray(p_score)
    s_reg, p_reg = np.asarray(s_reg), np.asarray(p_reg)
    assert np.corrcoef(p_score.ravel(), s_score.ravel())[0, 1] > 0.9999
    assert np.corrcoef(p_reg.ravel(), s_reg.ravel())[0, 1] > 0.9999
    assert np.max(np.abs(p_score - s_score)) < 0.01
    assert np.max(np.abs(p_reg - s_reg)) < 0.05


@pytest.mark.slow
def test_point_fusion_gradients(rng):
    pts, nums, imgs = make_scene(rng)
    g = voxelize_batch(pts, nums)
    model = MVXNetPointFusion(grid_shape=CFG.voxel_shape,
                              image_size=CFG.image_size)
    args = (g.features, g.coords, g.mask, imgs, pts, g.point_slots)
    params = model.init(jax.random.key(0), *args)

    def loss(p):
        s, r = model.apply(p, *args)
        return jnp.sum(s) + jnp.sum(r ** 2)

    grads = jax.grad(loss)(params)
    # fusion MLP gets gradients through the scatter
    fusion_grads = jax.tree.leaves(grads["params"]["head"]["fusion"])
    assert all(np.all(np.isfinite(np.asarray(x))) for x in fusion_grads)
    assert any(np.any(np.asarray(x) != 0) for x in fusion_grads)


@pytest.mark.slow
def test_voxel_fusion_variant(rng):
    """MVXNetVoxelFusion (paper's second fusion mode) runs end to end."""
    from mvxnet_makise_tpu.models import MVXNetVoxelFusion

    pts, nums, imgs = make_scene(rng)
    g = voxelize_batch(pts, nums)
    model = MVXNetVoxelFusion(grid_shape=CFG.voxel_shape,
                              image_size=CFG.image_size)
    args = (g.features, g.coords, g.mask, imgs)
    params = model.init(jax.random.key(0), *args)
    score, reg = model.apply(params, *args)
    assert score.shape == (1, 8, 8, 2)
    assert reg.shape == (1, 8, 8, 14)
    s = np.asarray(score)
    assert np.all(np.isfinite(s)) and np.all((s >= 0) & (s <= 1))

    def loss(p):
        sc, rg = model.apply(p, *args)
        return jnp.sum(sc) + jnp.sum(rg ** 2)

    grads = jax.grad(loss)(params)
    assert all(np.all(np.isfinite(np.asarray(x)))
               for x in jax.tree.leaves(grads))


def test_fusion_full_stats_matches_masked(rng):
    """DenseReluNormVirtualFull's plain-reduction statistics must equal
    the masked formulation under the stack invariant (invalid rows are
    exact zeros at input, like the virtual row)."""
    import jax
    import jax.numpy as jnp

    from mvxnet_makise_tpu.models.image_head import PointImageFusion

    B, P, C = 2, 64, 768
    mask = rng.random((B, P)) < 0.7
    x = rng.standard_normal((B, P, C)).astype(np.float32)
    x = jnp.asarray(np.where(mask[..., None], x, 0.0))
    n_virtual = jnp.asarray(37.0)

    ref = PointImageFusion(1e-6, "masked")
    params = ref.init(jax.random.PRNGKey(0), x, jnp.asarray(mask),
                      n_virtual)
    y0, z0 = ref.apply(params, x, jnp.asarray(mask), n_virtual)
    y1, z1 = PointImageFusion(1e-6, "full").apply(
        params, x, jnp.asarray(mask), n_virtual)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(z0), np.asarray(z1),
                               rtol=2e-4, atol=2e-4)
