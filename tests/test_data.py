"""Data layer tests on a synthesized on-disk mini KITTI tree."""

import os

import numpy as np
import pytest

from mvxnet_makise_tpu.config import Config
from mvxnet_makise_tpu.data.kitti import (
    KittiPaths,
    load_dataset,
    load_frame,
    read_labels,
)
from mvxnet_makise_tpu.data.pipeline import collate, preprocess_frame
from mvxnet_makise_tpu.data.synthetic import synthetic_frame, toy_calib
from mvxnet_makise_tpu.geometry.boxes import boxes_lidar_to_cam
from mvxnet_makise_tpu.tools.cropdata import crop_frame, main as cropdata_main

CFG = Config(max_points=32768, max_boxes=8)


def write_mini_kitti(tmp_path, rng, n_frames=2):
    """Create a minimal KITTI training tree with synthetic content."""
    root = str(tmp_path / "kitti")
    p = KittiPaths.from_root(root)
    for d in [p.velodyne, p.label, p.calib, p.image,
              os.path.dirname(p.train_split)]:
        os.makedirs(d, exist_ok=True)

    calib = toy_calib(CFG.image_size)
    ids = []
    frames = {}
    for i in range(n_frames):
        fid = f"{i:06d}"
        ids.append(fid)
        pts, _, image, boxes = synthetic_frame(rng, CFG, num_cars=3,
                                               num_points=4000)
        # raw (uncropped) scan: add out-of-range points
        extra = rng.uniform(-1, 1, (500, 4)).astype(np.float32)
        extra[:, 0] -= 20  # behind sensor
        raw = np.concatenate([pts, extra])
        raw.astype(np.float32).tofile(os.path.join(p.velodyne, fid + ".bin"))

        with open(os.path.join(p.calib, fid + ".txt"), "w") as f:
            f.write("P0: " + " ".join(["0"] * 12) + "\n")
            f.write("P1: " + " ".join(["0"] * 12) + "\n")
            f.write("P2: " + " ".join(
                str(x) for x in np.asarray(calib.P2)[:3].ravel()) + "\n")
            f.write("P3: " + " ".join(["0"] * 12) + "\n")
            f.write("R0_rect: " + " ".join(
                str(x) for x in np.asarray(calib.R0)[:3, :3].ravel()) + "\n")
            f.write("Tr_velo_to_cam: " + " ".join(
                str(x) for x in np.asarray(
                    calib.velo_to_cam)[:3].ravel()) + "\n")
            f.write("Tr_imu_to_velo: " + " ".join(["0"] * 12) + "\n")

        cam = np.asarray(boxes_lidar_to_cam(
            boxes, np.asarray(calib.velo_to_cam)))
        with open(os.path.join(p.label, fid + ".txt"), "w") as f:
            for b in cam:
                f.write("Car 0.0 0 0.0 100 100 200 150 "
                        + " ".join(f"{x:.4f}" for x in b) + "\n")
            f.write("DontCare -1 -1 -10 0 0 50 50 -1 -1 -1 -1000 -1000 "
                    "-1000 -10\n")

        import cv2 as cv

        cv.imwrite(os.path.join(p.image, fid + ".png"),
                   (image * 255).astype(np.uint8))
        frames[fid] = (pts, boxes)

    with open(p.train_split, "w") as f:
        f.write("\n".join(ids) + "\n")
    with open(p.val_split, "w") as f:
        f.write(ids[0] + "\n")
    return root, frames


def test_read_labels_parses_classes(tmp_path, rng):
    root, _ = write_mini_kitti(tmp_path, rng)
    p = KittiPaths.from_root(root)
    labels = read_labels(os.path.join(p.label, "000000.txt"))
    assert np.sum(labels["type"] == "Car") == 3
    assert np.sum(labels["type"] == "DontCare") == 1
    assert labels["cam_box"].shape[1] == 7


def test_load_frame_boxes_roundtrip(tmp_path, rng):
    root, frames = write_mini_kitti(tmp_path, rng)
    p = KittiPaths.from_root(root)
    frame = load_frame(p, "000000", CFG, use_cropped=False)
    orig = frames["000000"][1]
    got = frame.boxes["Car"]
    assert got.shape == orig.shape
    # cam->label->cam->lidar roundtrip reproduces the planted boxes
    a = got[np.argsort(got[:, 0])]
    b = orig[np.argsort(orig[:, 0])]
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=2e-3)
    assert frame.image is not None
    assert frame.image.shape == (*CFG.image_size, 3)
    assert frame.image.max() <= 1.0


def test_load_dataset_split(tmp_path, rng):
    root, _ = write_mini_kitti(tmp_path, rng)
    ds = load_dataset(root, "train", CFG, load_images=False)
    assert len(ds) == 2
    ds_val = load_dataset(root, "val", CFG, load_images=False)
    assert len(ds_val) == 1


def test_cropdata_modes_agree(tmp_path, rng):
    root, _ = write_mini_kitti(tmp_path, rng)
    p = KittiPaths.from_root(root)
    pts = np.fromfile(os.path.join(p.velodyne, "000000.bin"),
                      dtype=np.float32).reshape(-1, 4)
    from mvxnet_makise_tpu.geometry.calib import read_calib

    calib = read_calib(os.path.join(p.calib, "000000.txt"))
    outs = {m: crop_frame(pts, calib, CFG, m)
            for m in ["numpy", "native", "jax"]}
    n = len(outs["numpy"])
    assert n > 1000
    for m, o in outs.items():
        assert len(o) == n, m
        a = o[np.lexsort(o.T)]
        b = outs["numpy"][np.lexsort(outs["numpy"].T)]
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


def test_cropdata_cli_writes_files(tmp_path, rng):
    root, _ = write_mini_kitti(tmp_path, rng)
    assert cropdata_main([root, "numpy"]) == 0
    p = KittiPaths.from_root(root)
    cropped = np.fromfile(
        os.path.join(p.velodyne_cropped, "000000.bin"),
        dtype=np.float32).reshape(-1, 4)
    raw = np.fromfile(os.path.join(p.velodyne, "000000.bin"),
                      dtype=np.float32).reshape(-1, 4)
    assert 0 < len(cropped) < len(raw)
    # loading now picks the cropped file
    frame = load_frame(p, "000000", CFG, use_cropped=True, load_image=False)
    assert len(frame.points) == len(cropped)


def test_preprocess_and_collate(tmp_path, rng):
    pts, calib, image, boxes = synthetic_frame(rng, CFG)
    fa = preprocess_frame(pts, calib, image, boxes, CFG)
    assert fa.points.shape == (CFG.max_points, 6)
    assert fa.gt_boxes.shape == (CFG.max_boxes, 7)
    assert fa.gt_mask.sum() == len(boxes)
    assert int(fa.num_points) == min(len(pts), CFG.max_points)
    # projection columns are plausible image coords
    rows = fa.points[:int(fa.num_points), 4]
    assert rows.min() >= -200 and rows.max() <= CFG.image_size[0] + 200

    batch = collate([fa, fa])
    assert batch.points.shape == (2, CFG.max_points, 6)
    assert batch.image.shape == (2, *CFG.image_size, 3)
