"""Config tests incl. loading a reference-format config.yml."""

import numpy as np
import pytest

from mvxnet_makise_tpu.config import Config, load_config, parse_cli
from mvxnet_makise_tpu.utils.logging import MetricsLogger


def test_derived_fields_match_reference_math():
    cfg = Config()
    # Config.py:7 voxelsize derivation
    np.testing.assert_allclose(cfg.voxel_size, (0.2, 0.2, 0.4), rtol=1e-6)
    assert cfg.feature_map_shape == (176, 200)
    assert cfg.eps == 1e-6
    assert Config(use_bf16=True).eps == 1e-3  # Config.py:8-13 half branch


def test_load_reference_yaml_keys(tmp_path):
    """A reference-format config.yml (its key names) loads directly."""
    p = tmp_path / "config.yml"
    p.write_text(
        "device: cuda\n"            # ignored (no torch devices here)
        "half: False\n"             # ignored (bf16 flag covers it)
        "velorange: [0.0, -40.0, -3.0, 70.4, 40.0, 1.0]\n"
        "voxelshape: [352, 400, 10]\n"
        "carsize: [3.9, 1.6, 1.56]\n"
        "batchsize: 2\n"
        "samplenum: 35\n"
        "imsize: [370, 1224]\n")
    cfg = load_config(str(p))
    assert cfg.voxel_shape == (352, 400, 10)
    assert cfg.samples_per_voxel == 35
    assert cfg.batch_size == 2
    assert cfg.image_size == (370, 1224)
    np.testing.assert_allclose(cfg.voxel_size, (0.2, 0.2, 0.4), rtol=1e-6)


def test_cli_mirrors_reference_surface():
    cfg, args = parse_cli(["/data/kitti", "-n", "5", "-r", "3"])
    assert cfg.data_root == "/data/kitti"
    assert cfg.num_epochs == 5
    assert args.resume == 3


def test_config_hashable_for_jit():
    cfg = Config()
    assert hash(cfg) == hash(Config())
    assert hash(cfg) != hash(cfg.replace(batch_size=4))


def test_metrics_logger_jsonl(tmp_path):
    import json

    path = str(tmp_path / "log" / "metrics.jsonl")
    with MetricsLogger(path, echo=False) as log:
        log.log(1, {"loss": 0.5, "num_pos": 3})
        log.log(2, {"loss": np.float32(0.25)})
    lines = [json.loads(line) for line in open(path)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 0.5
    assert lines[1]["loss"] == 0.25


def test_shipped_baseline_configs_load():
    """The five BASELINE.json configs ship as YAML in configs/ and load
    through the real --config path (VERDICT r1 missing #5)."""
    import glob
    import os

    from mvxnet_makise_tpu.config import load_config

    root = os.path.join(os.path.dirname(__file__), "..", "configs")
    files = sorted(glob.glob(os.path.join(root, "*.yaml")))
    assert len(files) >= 5, files
    by_name = {os.path.basename(f): load_config(f) for f in files}

    lidar = by_name["lidar_only.yaml"]
    assert lidar.target_classes == ("Car",)
    assert lidar.voxel_shape == (352, 400, 10)
    assert lidar.use_bf16 and lidar.fusion_mode == "pm"

    fusion = by_name["full_fusion.yaml"]
    assert fusion.remat and fusion.batch_size == 4
    np.testing.assert_allclose(fusion.voxel_size, (0.2, 0.2, 0.4),
                               rtol=1e-6)

    multi = by_name["multiclass.yaml"]
    assert multi.target_classes == ("Car", "Pedestrian", "Cyclist")
    assert multi.augment_fill_to == (12, 8, 8)
    assert multi.anchors_per_loc == 6
    # per-class thresholds derived (Ped/Cyc use the smaller conventions)
    assert multi.class_pos_thresholds == (0.6, 0.5, 0.5)


def test_norm_scope_validated():
    """Typos like 'Sample' must fail loudly at config time instead of
    silently falling through make_apply's == 'sample' check to batch
    statistics (ADVICE r3)."""
    import pytest

    from mvxnet_makise_tpu.config import Config

    with pytest.raises(ValueError, match="norm_scope"):
        Config(norm_scope="Sample")
    Config(norm_scope="batch")  # both legal values construct
    Config(norm_scope="sample")
