"""Point-major VoxelNet branch: exact equivalence with the slot path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.models import VoxelNetBranch
from mvxnet_makise_tpu.models.voxelnet_pm import (
    VoxelNetBranchPM,
    point_lidar_features,
)
from mvxnet_makise_tpu.ops.voxelize import voxelize

CFG = Config(
    velo_range=(0.0, -8.0, -3.0, 12.8, 8.0, 1.0),
    voxel_shape=(16, 16, 10),
    max_points=256, max_voxels=64, max_boxes=4,
    samples_per_voxel=4)


def make_grid(rng, n_points=220, B=2):
    P = CFG.max_points
    pts = np.zeros((B, P, 6), np.float32)
    for b in range(B):
        pts[b, :n_points, 0] = rng.uniform(0.5, 12.0, n_points)
        pts[b, :n_points, 1] = rng.uniform(-7.5, 7.5, n_points)
        pts[b, :n_points, 2] = rng.uniform(-2.5, 0.5, n_points)
        pts[b, :n_points, 3] = rng.uniform(0, 1, n_points)
    nums = np.full((B,), n_points, np.int32)
    grid = jax.vmap(lambda p, n: voxelize(
        p, n, velo_range=CFG.velo_range, voxel_size=CFG.voxel_size,
        grid_shape=CFG.voxel_shape, max_voxels=CFG.max_voxels,
        samples_per_voxel=CFG.samples_per_voxel))(
        jnp.asarray(pts), jnp.asarray(nums))
    return grid


def test_point_lidar_features_match_slot_channels(rng):
    grid = make_grid(rng)
    pf = jax.vmap(point_lidar_features)(
        grid.sorted_points, grid.sorted_seg, grid.sorted_kept, grid.counts)
    pf = np.asarray(pf)
    feats = np.asarray(grid.features)
    T = CFG.samples_per_voxel
    seg = np.asarray(grid.sorted_seg)
    kept = np.asarray(grid.sorted_kept)
    # for each kept point, its 7 channels must equal its slot row
    slot_rows = feats.reshape(feats.shape[0], -1, 9)
    slots = np.asarray(grid.point_slots)  # original order!
    s2o = np.asarray(grid.sorted_to_orig)
    for b in range(pf.shape[0]):
        for i in np.nonzero(kept[b])[0][:60]:
            slot = slots[b, s2o[b, i]]
            np.testing.assert_allclose(pf[b, i], slot_rows[b, slot][:7],
                                       rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_point_major_branch_matches_slot_branch(rng):
    grid = make_grid(rng)
    slot = VoxelNetBranch(grid_shape=CFG.voxel_shape)
    pm = VoxelNetBranchPM(grid_shape=CFG.voxel_shape,
                          samples_per_voxel=CFG.samples_per_voxel)

    slot_args = (grid.features[..., :7], grid.coords, grid.mask)
    pf = jax.vmap(point_lidar_features)(
        grid.sorted_points, grid.sorted_seg, grid.sorted_kept, grid.counts)
    pm_args = (pf, grid.sorted_kept, grid.sorted_seg, grid.counts,
               grid.coords, grid.mask)

    params = slot.init(jax.random.key(0), *slot_args)
    pm_params = pm.init(jax.random.key(0), *pm_args)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pm_params))

    s_score, s_reg = slot.apply(params, *slot_args)
    p_score, p_reg = pm.apply(params, *pm_args)
    s_score, p_score = np.asarray(s_score), np.asarray(p_score)
    s_reg, p_reg = np.asarray(s_reg), np.asarray(p_reg)
    assert np.corrcoef(p_score.ravel(), s_score.ravel())[0, 1] > 0.9999
    assert np.max(np.abs(p_score - s_score)) < 0.01
    assert np.corrcoef(p_reg.ravel(), s_reg.ravel())[0, 1] > 0.9999
    assert np.max(np.abs(p_reg - s_reg)) < 0.05


def test_point_major_gradients(rng):
    grid = make_grid(rng, B=1)
    pm = VoxelNetBranchPM(grid_shape=CFG.voxel_shape,
                          samples_per_voxel=CFG.samples_per_voxel)
    pf = jax.vmap(point_lidar_features)(
        grid.sorted_points, grid.sorted_seg, grid.sorted_kept, grid.counts)
    args = (pf, grid.sorted_kept, grid.sorted_seg, grid.counts,
            grid.coords, grid.mask)
    params = pm.init(jax.random.key(0), *args)

    def loss(p):
        s, r = pm.apply(p, *args)
        return jnp.sum(s) + jnp.sum(r ** 2)

    grads = jax.grad(loss)(params)
    leaves = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
    nonzero = sum(bool(np.any(np.asarray(g) != 0)) for g in leaves)
    assert nonzero > len(leaves) * 0.8


@pytest.mark.slow
def test_mvxnet_pm_matches_slot_model(rng):
    """MVXNetPM (fully point-major) == MVXNet (slot path), same params."""
    from mvxnet_makise_tpu.models import MVXNet, MVXNetPM

    B = 1
    P = CFG.max_points
    n_points = 200
    pts = np.zeros((B, P, 6), np.float32)
    pts[0, :n_points, 0] = rng.uniform(0.5, 12.0, n_points)
    pts[0, :n_points, 1] = rng.uniform(-7.5, 7.5, n_points)
    pts[0, :n_points, 2] = rng.uniform(-2.5, 0.5, n_points)
    pts[0, :n_points, 3] = rng.uniform(0, 1, n_points)
    pts[0, :n_points, 4] = rng.uniform(0, 63, n_points)
    pts[0, :n_points, 5] = rng.uniform(0, 95, n_points)
    nums = np.full((B,), n_points, np.int32)
    imgs = jnp.asarray(rng.uniform(0, 1, (B, 64, 96, 3)).astype(np.float32))
    grid = jax.vmap(lambda p, n: voxelize(
        p, n, velo_range=CFG.velo_range, voxel_size=CFG.voxel_size,
        grid_shape=CFG.voxel_shape, max_voxels=CFG.max_voxels,
        samples_per_voxel=CFG.samples_per_voxel))(
        jnp.asarray(pts), jnp.asarray(nums))

    slot = MVXNet(grid_shape=CFG.voxel_shape, image_size=(64, 96))
    pm = MVXNetPM(grid_shape=CFG.voxel_shape, image_size=(64, 96),
                  samples_per_voxel=CFG.samples_per_voxel)

    slot_args = (grid.features, grid.coords, grid.mask, imgs)
    pm_args = (grid.sorted_points, grid.sorted_kept, grid.sorted_seg,
               grid.counts, grid.coords, grid.mask, imgs)

    params = slot.init(jax.random.key(0), *slot_args)
    pm_params = pm.init(jax.random.key(0), *pm_args)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(pm_params))

    s_score, s_reg = slot.apply(params, *slot_args)
    p_score, p_reg = pm.apply(params, *pm_args)
    s_score, p_score = np.asarray(s_score), np.asarray(p_score)
    s_reg, p_reg = np.asarray(s_reg), np.asarray(p_reg)
    assert np.corrcoef(p_score.ravel(), s_score.ravel())[0, 1] > 0.9999
    assert np.max(np.abs(p_score - s_score)) < 0.01
    assert np.corrcoef(p_reg.ravel(), s_reg.ravel())[0, 1] > 0.9999
    assert np.max(np.abs(p_reg - s_reg)) < 0.05
