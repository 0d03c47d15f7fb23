"""Train-step + multi-device sharding tests (8 virtual CPU devices)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.models import VoxelNetBranch
from mvxnet_makise_tpu.ops import create_anchors
from mvxnet_makise_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_sharding,
    shard_batch,
    shard_params,
)
from mvxnet_makise_tpu.train.state import TrainState, make_optimizer
from mvxnet_makise_tpu.train.step import Batch, make_train_step

# small scene: 12.8 x 16 m, 32x32x10 voxels, 16x16 anchor grid
CFG = Config(
    velo_range=(0.0, -8.0, -3.0, 12.8, 8.0, 1.0),
    voxel_shape=(32, 32, 10),
    max_points=512, max_voxels=64, max_boxes=4,
    samples_per_voxel=8, assign_window=6, batch_size=2)


def make_batch(rng, B):
    V, T = CFG.max_voxels, CFG.samples_per_voxel
    voxels = rng.normal(size=(B, V, T, 9)).astype(np.float32)
    coords = np.stack([
        rng.integers(0, 32, (B, V)), rng.integers(0, 32, (B, V)),
        rng.integers(0, 10, (B, V))], axis=-1).astype(np.int32)
    vmask = np.ones((B, V), dtype=bool)
    vmask[:, 48:] = False
    G = CFG.max_boxes
    gt = np.zeros((B, G, 7), dtype=np.float32)
    gt[..., 0] = rng.uniform(2, 10, (B, G))
    gt[..., 1] = rng.uniform(-6, 6, (B, G))
    gt[..., 2] = -1.0
    gt[..., 3:6] = CFG.car_size
    gt[..., 6] = rng.uniform(-np.pi, np.pi, (B, G))
    gt_mask = np.ones((B, G), dtype=bool)
    gt_mask[:, 2:] = False
    return Batch(voxels=jnp.asarray(voxels), coords=jnp.asarray(coords),
                 vmask=jnp.asarray(vmask),
                 images=jnp.zeros((B, 1, 1, 3), jnp.float32),
                 gt_boxes=jnp.asarray(gt), gt_mask=jnp.asarray(gt_mask))


def make_state(batch):
    model = VoxelNetBranch(grid_shape=CFG.voxel_shape)
    params = model.init(jax.random.key(0), batch.voxels[..., :7],
                        batch.coords, batch.vmask)
    tx = make_optimizer(CFG)
    return TrainState.create(model.apply, params, tx)


ANCHORS = create_anchors(CFG.feature_map_shape, CFG.velo_range, CFG.car_size)


def test_train_step_runs_and_learns(rng):
    batch = make_batch(rng, 2)
    state = make_state(batch)
    step = jax.jit(make_train_step(CFG, ANCHORS, with_images=False))

    cls_losses, totals = [], []
    for _ in range(15):
        state, metrics = step(state, batch)
        cls_losses.append(float(metrics["cls_loss"]))
        totals.append(float(metrics["total_loss"]))
    assert all(np.isfinite(totals))
    # overfits a fixed batch: classification loss decreases steadily
    assert cls_losses[-1] < cls_losses[0] * 0.8
    assert np.mean(totals[-3:]) < np.mean(totals[:3])
    assert int(state.step) == 15
    assert float(metrics["num_pos"]) > 0


def test_train_step_no_gt(rng):
    batch = make_batch(rng, 2)
    batch = batch._replace(gt_mask=jnp.zeros_like(batch.gt_mask))
    state = make_state(batch)
    step = jax.jit(make_train_step(CFG, ANCHORS, with_images=False))
    state, metrics = step(state, batch)
    assert np.isfinite(float(metrics["total_loss"]))
    assert float(metrics["reg_loss"]) == 0.0
    assert float(metrics["num_pos"]) == 0


@pytest.mark.slow
def test_multi_device_data_parallel_matches_single(rng):
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    batch = make_batch(rng, 4)
    state = make_state(batch)
    step_fn = make_train_step(CFG, ANCHORS, with_images=False)

    # single device: two steps
    s1, m1a = jax.jit(step_fn)(state, batch)
    _, m1b = jax.jit(step_fn)(s1, batch)

    # data-parallel over a (4, 1) mesh
    mesh = make_mesh((4, 1), jax.devices()[:4])
    sharded_batch = shard_batch(batch, mesh)
    sstate = state.replace(params=shard_params(state.params, mesh))
    s2, m2a = jax.jit(step_fn)(sstate, sharded_batch)
    _, m2b = jax.jit(step_fn)(s2, sharded_batch)

    # step-1 loss identical (same params), step-2 loss close (the update
    # itself — including the XLA-inserted gradient psum — must agree; a
    # loose tolerance absorbs AdamW's sign-normalization of ~0 grads)
    np.testing.assert_allclose(float(m1a["total_loss"]),
                               float(m2a["total_loss"]), rtol=1e-4)
    np.testing.assert_allclose(float(m1b["total_loss"]),
                               float(m2b["total_loss"]), rtol=5e-2)
    np.testing.assert_allclose(float(m1a["num_pos"]),
                               float(m2a["num_pos"]))


@pytest.mark.slow
def test_model_parallel_mesh_runs(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    batch = make_batch(rng, 4)
    state = make_state(batch)
    mesh = make_mesh((4, 2))
    sharded_batch = shard_batch(batch, mesh)
    sstate = state.replace(params=shard_params(state.params, mesh))
    # some RPN kernels actually shard over the model axis
    specs = param_sharding(state.params, mesh)
    sharded_any = any(
        s.spec != jax.sharding.PartitionSpec()
        for s in jax.tree.leaves(specs))
    assert sharded_any
    step = jax.jit(make_train_step(CFG, ANCHORS, with_images=False))
    s2, m2 = step(sstate, sharded_batch)
    assert np.isfinite(float(m2["total_loss"]))
