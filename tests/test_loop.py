"""End-to-end training-loop tests: loop, checkpoint resume, eval path."""

import os

import numpy as np
import pytest

import jax

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.kitti import KittiFrame
from mvxnet_makise_tpu.data.synthetic import synthetic_frame
from mvxnet_makise_tpu.train import checkpoint as ckpt
from mvxnet_makise_tpu.train.loop import (
    build_model_and_state,
    preprocess_train_frame,
    train,
)
from mvxnet_makise_tpu.utils.metrics import LossTracker, PhaseTimer


def small_cfg(tmp_path):
    return Config(
        velo_range=(0.0, -8.0, -3.0, 12.8, 8.0, 1.0),
        voxel_shape=(32, 32, 10),
        max_points=1024, max_voxels=128, max_boxes=4,
        samples_per_voxel=8, assign_window=6, batch_size=2,
        num_epochs=1, checkpoint_dir=str(tmp_path / "ckpts"),
        num_workers=2)


def make_frames(cfg, n, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for i in range(n):
        pts, calib, _, boxes = synthetic_frame(rng, cfg, num_cars=2,
                                               num_points=1500)
        frames.append(KittiFrame(
            frame_id=f"s{i}", points=pts, image=None, calib=calib,
            boxes={"Car": boxes},
            bbox2d={"Car": np.zeros((len(boxes), 4), np.float32)},
            difficulty={"Car": np.ones(len(boxes), np.int32)}))
    return frames


@pytest.mark.slow
def test_train_loop_runs_and_checkpoints(tmp_path):
    cfg = small_cfg(tmp_path)
    frames = make_frames(cfg, 4)
    state = train(cfg, frames, with_images=False, num_epochs=2,
                  log_every=1, workers=1)
    assert int(state.step) == 4  # 4 frames / batch 2 * 2 epochs
    assert ckpt.latest_epoch(cfg.checkpoint_dir) == 2

    # resume from epoch 2 and continue
    state2 = train(cfg, frames, with_images=False, resume_epoch=2,
                   num_epochs=1, log_every=10, workers=1)
    assert int(state2.step) == 6
    assert ckpt.latest_epoch(cfg.checkpoint_dir) == 3


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path):
    cfg = small_cfg(tmp_path)
    _, state = build_model_and_state(cfg, with_images=False)
    path = ckpt.save_checkpoint(cfg.checkpoint_dir, 5, state)
    assert os.path.isdir(path)

    _, fresh = build_model_and_state(cfg, with_images=False, rng_seed=1)
    l0 = jax.tree.leaves(fresh.params)[0]
    restored = ckpt.restore_checkpoint(cfg.checkpoint_dir, 5, fresh)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert ckpt.latest_epoch(cfg.checkpoint_dir) == 5


@pytest.mark.slow
def test_eval_path_runs(tmp_path):
    from mvxnet_makise_tpu.tools.evaluate import run_eval

    cfg = small_cfg(tmp_path)
    frames = make_frames(cfg, 2, seed=3)
    model, state = build_model_and_state(cfg, with_images=False)
    res = run_eval(cfg, frames, state.params, model, with_images=False,
                   score_threshold=0.05, batch_size=2)
    assert set(res) == {"Car"}
    car = res["Car"]
    assert set(car) == {"all", "easy", "moderate", "hard"}
    assert car["all"]["num_gt"] == 4
    # synthetic frames carry difficulty 1 -> excluded from "easy"
    assert car["easy"]["num_gt"] == 0
    assert car["moderate"]["num_gt"] == 4
    assert 0.0 <= car["all"]["ap"] <= 1.0


def test_preprocess_train_frame_no_augment(tmp_path):
    cfg = small_cfg(tmp_path)
    frames = make_frames(cfg, 1)
    rng = np.random.default_rng(0)
    fa, gcls = preprocess_train_frame(frames[0], cfg, None, rng)
    assert fa.points.shape == (cfg.max_points, 6)
    assert fa.gt_mask.sum() == 2
    assert int(fa.num_points) > 0
    assert gcls.shape == (cfg.max_boxes,)
    assert np.all(gcls[fa.gt_mask] == 0)  # single-class config


@pytest.mark.slow
def test_train_loop_deterministic(tmp_path):
    """Same seed -> identical loss trajectory (per-frame seeded RNGs make
    the threaded prefetch pipeline deterministic)."""
    cfg = small_cfg(tmp_path)
    frames = make_frames(cfg, 4)

    def losses_of(run_dir):
        c = cfg.replace(checkpoint_dir=str(tmp_path / run_dir))
        state = train(c, frames, with_images=False, num_epochs=1,
                      log_every=100, workers=4)
        return state

    s1 = losses_of("a")
    s2 = losses_of("b")
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nonfinite_update_guard(tmp_path):
    """A batch that produces a non-finite loss must not move parameters."""
    import jax.numpy as jnp

    from mvxnet_makise_tpu.ops import create_anchors
    from mvxnet_makise_tpu.train.step import Batch, make_train_step

    cfg = small_cfg(tmp_path).replace(fusion_mode="slot")
    V, T = cfg.max_voxels, cfg.samples_per_voxel
    B = 1
    voxels = np.full((B, V, T, 9), np.nan, np.float32)  # poison
    batch = Batch(
        voxels=jnp.asarray(voxels),
        coords=jnp.zeros((B, V, 3), jnp.int32),
        vmask=jnp.ones((B, V), bool),
        images=jnp.zeros((B, 1, 1, 3)),
        gt_boxes=jnp.zeros((B, cfg.max_boxes, 7)),
        gt_mask=jnp.zeros((B, cfg.max_boxes), bool))
    _, state = build_model_and_state(cfg, with_images=False)
    anchors = create_anchors(cfg.feature_map_shape, cfg.velo_range,
                             cfg.anchor_sizes)
    step = jax.jit(make_train_step(cfg, anchors, with_images=False))
    new_state, metrics = step(state, batch)
    assert int(metrics["skipped_nonfinite"]) == 1
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new_state.step) == int(state.step)


def test_loss_tracker_nan_filtering():
    t = LossTracker()
    t.update({"cls_loss": 1.0})
    t.update({"cls_loss": float("nan")})
    t.update({"cls_loss": 3.0})
    assert t.average("cls_loss") == 2.0
    assert t.maximum("cls_loss") == 3.0
    assert t.nan_count["cls_loss"] == 1
    assert t.total_seen == 3


def test_phase_timer():
    import time

    t = PhaseTimer()
    with t.phase("a"):
        time.sleep(0.01)
    with t.phase("a"):
        time.sleep(0.01)
    assert t.totals["a"] >= 0.02
    assert t.counts["a"] == 2
    assert "a:" in t.report()


@pytest.mark.slow
def test_train_loop_with_periodic_eval(tmp_path):
    cfg = small_cfg(tmp_path)
    frames = make_frames(cfg, 2)
    val = make_frames(cfg, 2, seed=9)
    state = train(cfg, frames, with_images=False, num_epochs=1,
                  log_every=10, workers=1, eval_frames=val)
    assert int(state.step) == 1
