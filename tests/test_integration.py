"""Full-workflow integration test on a synthesized on-disk KITTI tree:
cropdata -> create_gtdatabase -> train (with paste augmentation) ->
checkpoint -> evaluate.  Mirrors the reference's end-user workflow
(README.md usage) minus the image branch (CPU test budget)."""

import numpy as np
import pytest

import jax

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.gt_database import build_database, load_database
from mvxnet_makise_tpu.data.kitti import load_dataset
from mvxnet_makise_tpu.tools.cropdata import main as cropdata_main
from mvxnet_makise_tpu.train import checkpoint as ckpt
from mvxnet_makise_tpu.train.loop import build_model_and_state, train
from test_data import write_mini_kitti


@pytest.mark.slow
def test_full_kitti_workflow(tmp_path, rng):
    # full KITTI scene extent (the mini tree's labels live there) but a
    # coarse voxel grid — CPU test budget
    cfg = Config(
        voxel_shape=(96, 96, 10),   # RPN needs dims divisible by 8
        max_points=8192, max_voxels=1024, max_boxes=8,
        samples_per_voxel=8, batch_size=1, assign_window=6,
        checkpoint_dir=str(tmp_path / "ckpts"),
        augment_fill_to=(5,), num_workers=2)

    root, _ = write_mini_kitti(tmp_path, rng, n_frames=3)

    # 1. offline crop
    assert cropdata_main([root, "native"]) == 0

    # 2. GT database (rectangular-mask mode)
    counts = build_database(root, cfg, kins_json=None)
    assert counts["Car"] > 0

    # 3. load dataset + DB, train one epoch with augmentation
    frames = load_dataset(root, "train", cfg, load_images=False)
    assert all(len(f.points) > 500 for f in frames)
    gt_db = load_database(root, cfg.target_classes)
    state = train(cfg, frames, gt_db=gt_db, with_images=False,
                  num_epochs=1, log_every=1, workers=2)
    assert int(state.step) == 3
    assert ckpt.latest_epoch(cfg.checkpoint_dir) == 1

    # 4. evaluate the checkpoint on the val split
    from mvxnet_makise_tpu.tools.evaluate import run_eval

    model, fresh = build_model_and_state(cfg, with_images=False)
    restored = ckpt.restore_checkpoint(cfg.checkpoint_dir, 1, fresh)
    val = load_dataset(root, "val", cfg, load_images=False)
    res = run_eval(cfg, val, restored.params, model, with_images=False,
                   score_threshold=0.05, batch_size=1)
    assert res["Car"]["all"]["num_gt"] >= 1
    assert 0.0 <= res["Car"]["all"]["ap"] <= 1.0
