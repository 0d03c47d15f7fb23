"""Batch-inference CLI: KITTI frames in, KITTI-format results out.

The reference ships no inference script at all (its eval scripts are
gitignored — SURVEY.md §6); this is the production counterpart of
``tools/train``: load a checkpoint, stream a KITTI directory (or an
explicit id list) through serve.Detector in batches, and write one
KITTI result file per frame (``type ... bbox hwl xyz_cam ry score``),
the format the official KITTI devkit consumes.

Usage:
  python -m mvxnet_makise_tpu.tools.detect <dataroot> -o results/ \
      [-r EPOCH] [--config C] [--split val] [--batch 8] [--limit N]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        usage="python -m mvxnet_makise_tpu.tools.detect <dataroot> "
              "-o OUTDIR [options]")
    p.add_argument("dataroot")
    p.add_argument("-o", "--outdir", required=True)
    p.add_argument("-r", "--epoch", type=int, default=None,
                   help="checkpoint epoch (default: latest)")
    p.add_argument("--config", default=None)
    p.add_argument("--split", default="val",
                   choices=["train", "val", "trainval", "test"])
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--lidar-only", action="store_true")
    p.add_argument("--score-threshold", type=float, default=0.3)
    p.add_argument("--image-min-side", type=float, default=None,
                   help="serving-economy transform resolution (e.g. "
                        "400 = the benchmarked configuration; default: "
                        "config value, reference 800).  Checkpoints "
                        "interchange across settings — docs/DESIGN.md")
    args = p.parse_args(argv)

    from mvxnet_makise_tpu.config import load_config
    from mvxnet_makise_tpu.data.kitti import load_dataset
    from mvxnet_makise_tpu.geometry.boxes import (
        boxes3d_to_corners3d,
        boxes_lidar_to_cam,
    )
    from mvxnet_makise_tpu.geometry.calib import lidar_to_image
    from mvxnet_makise_tpu.serve import Detector

    cfg = load_config(args.config, data_root=args.dataroot)
    if args.image_min_side is not None:
        cfg = cfg.replace(image_min_side=args.image_min_side)
    frames = load_dataset(cfg.data_root, args.split, cfg,
                          load_images=not args.lidar_only,
                          limit=args.limit)
    if not frames:
        p.error(f"no frames for split '{args.split}' under {cfg.data_root}")

    det = Detector.create(cfg, checkpoint_epoch=args.epoch,
                          with_images=not args.lidar_only,
                          score_threshold=args.score_threshold)
    det.warm((args.batch,))

    os.makedirs(args.outdir, exist_ok=True)
    n_done = 0
    for i in range(0, len(frames), args.batch):
        chunk = frames[i:i + args.batch]
        results = det.detect_frames(
            [(f.points, f.calib, f.image) for f in chunk])
        for frame, r in zip(chunk, results):
            path = os.path.join(args.outdir, f"{frame.frame_id}.txt")
            with open(path, "w") as fh:
                for box, score, ci in zip(r.boxes, r.scores, r.classes):
                    cname = cfg.target_classes[int(ci)]
                    # lidar xyzlwhr -> cam hwlxyzr (KITTI label frame)
                    cam = np.asarray(boxes_lidar_to_cam(
                        np.asarray(box)[None],
                        np.asarray(frame.calib.velo_to_cam)))[0]
                    h, w, l, cx, cy, cz, ry = cam
                    # 2D bbox: image-plane bounds of the projected
                    # 3D corners
                    corners = np.asarray(
                        boxes3d_to_corners3d(np.asarray(box)))
                    uv = np.asarray(lidar_to_image(
                        corners, frame.calib.to_numpy()))
                    bbox = (uv[:, 0].min(), uv[:, 1].min(),
                            uv[:, 0].max(), uv[:, 1].max())
                    fh.write(
                        f"{cname} 0.0 0 0.0 "
                        f"{bbox[0]:.2f} {bbox[1]:.2f} {bbox[2]:.2f} "
                        f"{bbox[3]:.2f} "
                        f"{h:.2f} {w:.2f} {l:.2f} "
                        f"{cx:.2f} {cy:.2f} {cz:.2f} {ry:.2f} "
                        f"{float(score):.4f}\n")
            n_done += 1
        print(f"{n_done}/{len(frames)} frames", flush=True)
    print(f"wrote {n_done} result files to {args.outdir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
