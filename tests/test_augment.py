"""GT database build/load + paste augmentation tests."""

import json
import os

import numpy as np
import pytest

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.augment import (
    SceneAugmenter,
    assemble_augmented_cloud,
    ground_height_grid,
)
from mvxnet_makise_tpu.data.gt_database import (
    build_database,
    load_database,
    polygons_to_mask,
)
from mvxnet_makise_tpu.geometry.boxes_np import iou_bev
from test_data import CFG, write_mini_kitti


def test_polygons_to_mask_square():
    mask = polygons_to_mask([[10, 10, 30, 10, 30, 20, 10, 20]], 40, 50)
    assert mask.shape == (40, 50)
    assert mask[15, 20] == 1
    assert mask[5, 5] == 0
    assert mask.sum() > 150


def test_uncompressed_rle_mask():
    # 4x3 (h x w), column-major runs: 2 off, 3 on, 7 off
    mask = polygons_to_mask({"counts": [2, 3, 7], "size": [4, 3]}, 4, 3)
    expect = np.zeros((4, 3), np.uint8)
    # column-major positions 2, 3, 4 -> (r, c) = (2,0), (3,0), (0,1)
    expect[2, 0] = expect[3, 0] = expect[0, 1] = 1
    np.testing.assert_array_equal(mask, expect)


def test_ground_height_grid(rng):
    pts = np.zeros((100, 4), np.float32)
    pts[:, 0] = 10.0
    pts[:, 1] = 0.0
    pts[:, 2] = np.linspace(-2, -1, 100)
    grid = ground_height_grid(pts, CFG.velo_range)
    gx = int((10.0 - CFG.velo_range[0]) / 0.1)
    gy = int((0.0 - CFG.velo_range[1]) / 0.1)
    np.testing.assert_allclose(grid[gx, gy], -1.0, atol=1e-6)
    # empty cells: z_min - 1
    np.testing.assert_allclose(grid[0, 0], CFG.velo_range[2] - 1.0)


@pytest.fixture
def mini_db(tmp_path, rng):
    root, frames = write_mini_kitti(tmp_path, rng, n_frames=3)
    counts = build_database(root, CFG, kins_json=None)
    return root, counts


def test_build_database_no_kins(mini_db):
    root, counts = mini_db
    assert counts["Car"] > 0
    gtroot = os.path.join(root, "training", "gtdatabase")
    assert os.path.exists(os.path.join(gtroot, "gtinfo.pkl"))
    files = os.listdir(os.path.join(gtroot, "Car"))
    assert len(files) == counts["Car"] * 3  # velo + img + mask each


def test_load_database_and_contents(mini_db):
    root, counts = mini_db
    db = load_database(root, ["Car"])
    assert len(db["Car"]) == counts["Car"]
    s = db["Car"][0]
    assert s["velo"].ndim == 2 and s["velo"].shape[1] == 4
    assert s["bbox3d"].shape == (7,)
    assert s["mask"].ndim == 2
    assert s["image"].ndim == 3
    # cropped object points lie near the box centre
    if len(s["velo"]):
        d = np.linalg.norm(s["velo"][:, :2] - s["bbox3d"][:2], axis=1)
        assert d.max() < np.linalg.norm(s["bbox3d"][3:5]) / 2 + 0.5


def test_build_database_with_kins(tmp_path, rng):
    root, frames = write_mini_kitti(tmp_path, rng, n_frames=2)
    # fabricate a KINS-style json whose a_bboxes coincide with the KITTI
    # 2D boxes (written as 100 100 200 150 in the labels)
    images, anns = [], []
    for i, fid in enumerate(sorted(frames)):
        images.append({"id": i, "file_name": fid + ".png"})
        n_cars = len(frames[fid][1])
        for k in range(n_cars):
            anns.append({
                "image_id": i, "category_id": 4,
                "a_bbox": [100, 100, 100, 50],  # xywh == label xyxy box
                "i_segm": [[110, 110, 180, 110, 180, 140, 110, 140]],
            })
    kins_path = str(tmp_path / "kins.json")
    with open(kins_path, "w") as f:
        json.dump({"images": images, "annotations": anns}, f)
    counts = build_database(root, CFG, kins_json=kins_path)
    assert counts["Car"] > 0
    db = load_database(root, ["Car"])
    s = db["Car"][0]
    # polygon mask, not the full rectangle
    assert 0 < s["mask"].sum() < s["mask"].size


def test_scene_augmenter_fills_and_respects_gates(mini_db, rng):
    root, _ = mini_db
    db = load_database(root, ["Car"])
    if len(db["Car"]) < 4:
        pytest.skip("not enough DB samples")
    from mvxnet_makise_tpu.data.kitti import KittiPaths, load_frame

    frame = load_frame(KittiPaths.from_root(root), "000000", CFG,
                       use_cropped=False)
    aug = SceneAugmenter(CFG, db, rng=np.random.default_rng(0))
    orig_boxes = frame.boxes["Car"]
    fill_to = 6
    pasted, image, boxes, bevs = aug(
        frame.points, frame.image, frame.bbox2d, frame.boxes,
        ["Car"], [fill_to])
    out = boxes["Car"]
    assert len(out) >= len(orig_boxes)
    assert len(out) <= fill_to
    assert len(pasted) == len(out) - len(orig_boxes)
    # gate: pairwise BEV IoU of final scene stays tiny
    if len(out) > 1:
        iou = iou_bev(out, out)
        np.fill_diagonal(iou, 0)
        assert iou.max() <= 0.05 + 1e-5

    cloud = assemble_augmented_cloud(frame.points, frame.calib, pasted)
    expect_n = len(frame.points) + sum(len(v) for v, _ in pasted)
    assert cloud.shape == (expect_n, 6)


def test_augmenter_no_scene_boxes(mini_db, rng):
    root, _ = mini_db
    db = load_database(root, ["Car"])
    aug = SceneAugmenter(CFG, db, rng=np.random.default_rng(1))
    pts = np.zeros((100, 4), np.float32)
    pts[:, 0] = np.linspace(1, 60, 100)
    pts[:, 2] = -1.8
    img = np.zeros((*CFG.image_size, 3), np.float32)
    pasted, image, boxes, bevs = aug(pts, img, {}, {}, ["Car"], [4])
    assert boxes["Car"].shape[1] == 7
    assert len(boxes["Car"]) == len(pasted)
