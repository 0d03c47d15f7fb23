"""Batch-inference CLI (tools/detect): KITTI tree in, KITTI-format
result files out — the serving counterpart of the training CLI (the
reference ships no inference script; SURVEY.md §6)."""

import os

import numpy as np
import pytest
import yaml

from mvxnet_makise_tpu.tools.detect import main as detect_main

from tests.test_data import write_mini_kitti


@pytest.mark.slow
def test_detect_cli_writes_kitti_results(tmp_path, rng):
    root, frames = write_mini_kitti(tmp_path, rng, n_frames=2)
    ids = sorted(frames)
    cfgfile = str(tmp_path / "tiny.yaml")
    with open(cfgfile, "w") as f:
        yaml.safe_dump({
            "velorange": [0.0, -8.0, -3.0, 12.8, 8.0, 1.0],
            "voxelshape": [32, 32, 10],
            "imsize": [64, 96],
            "samplenum": 8,
            "max_points": 1024, "max_voxels": 128, "max_boxes": 8,
            "assign_window": 6,
            "checkpoint_dir": str(tmp_path / "ckpts"),
        }, f)
    outdir = str(tmp_path / "results")

    # no checkpoint exists -> untrained params; threshold 0 so the file
    # format (not learning) is what's under test
    rc = detect_main([root, "-o", outdir, "--config", cfgfile,
                      "--split", "train", "--batch", "2",
                      "--lidar-only", "--score-threshold", "0.0"])
    assert rc == 0

    files = sorted(os.listdir(outdir))
    assert files == [f"{i}.txt" for i in ids]
    for name in files:
        with open(os.path.join(outdir, name)) as f:
            lines = [ln.split() for ln in f.read().strip().splitlines()
                     if ln]
        for ln in lines:
            assert ln[0] == "Car"
            vals = np.asarray(ln[1:], np.float64)
            assert len(vals) == 15          # KITTI result record
            assert np.isfinite(vals).all()
            assert 0.0 <= vals[-1] <= 1.0   # score
