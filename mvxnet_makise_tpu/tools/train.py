"""Training CLI — mirrors the reference surface:
``python -m mvxnet_makise_tpu.tools.train <dataroot> [-n N] [-r EPOCH]``
(/root/reference/train.py:182-189 + modules/config/Parser.py), plus
framework extras (--lidar-only, --synthetic, --image-weights, --bf16).
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(
        usage="python -m mvxnet_makise_tpu.tools.train <dataroot> "
              "[-n NUMEPOCHS] [-r RESUME] [options]")
    p.add_argument("dataroot", nargs="?", default=None)
    p.add_argument("-n", "--numepochs", type=int, default=10)
    p.add_argument("-r", "--resume", type=int, default=0)
    p.add_argument("--config", default=None)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--lidar-only", action="store_true",
                   help="train the VoxelNet branch without the image head")
    p.add_argument("--no-augment", action="store_true")
    p.add_argument("--synthetic", type=int, default=0, metavar="N",
                   help="train on N synthetic frames (no dataset needed)")
    p.add_argument("--limit", type=int, default=None,
                   help="cap the number of dataset frames loaded")
    p.add_argument("--eval-every", type=int, default=0, metavar="N",
                   help="run val-split AP every N epochs (0 = off)")
    p.add_argument("--eval-limit", type=int, default=None)
    p.add_argument("--max-seconds", type=float, default=None,
                   help="stop cleanly after the last full epoch once "
                        "this wall-clock budget is spent")
    p.add_argument("--image-weights", default=None,
                   help="torch state_dict file for the ResNet50-FPN "
                        "extractor (torchvision fasterrcnn_resnet50_fpn_v2)")
    p.add_argument("--keep-last", type=int, default=None, metavar="N",
                   help="prune all but the newest N epoch checkpoints "
                        "after each save (default: keep all)")
    args = p.parse_args(argv)

    from mvxnet_makise_tpu.config import load_config
    from mvxnet_makise_tpu.utils.compile_cache import (
        enable_persistent_cache)

    enable_persistent_cache()

    overrides = {"num_epochs": args.numepochs}
    if args.dataroot:
        overrides["data_root"] = args.dataroot
    if args.batch_size:
        overrides["batch_size"] = args.batch_size
    if args.bf16:
        overrides["use_bf16"] = True
    if args.keep_last is not None:
        overrides["checkpoint_keep_last"] = args.keep_last
    cfg = load_config(args.config, **overrides)

    from mvxnet_makise_tpu.train.loop import train

    if args.synthetic:
        from mvxnet_makise_tpu.data.kitti import KittiFrame
        from mvxnet_makise_tpu.data.synthetic import (
            synthetic_frame,
            synthetic_frame_multiclass,
        )

        multiclass = len(cfg.target_classes) > 1
        rng = np.random.default_rng(cfg.seed)

        def make(i):
            if multiclass:
                pts, calib, image, by_cls = synthetic_frame_multiclass(
                    rng, cfg)
            else:
                pts, calib, image, boxes = synthetic_frame(rng, cfg)
                by_cls = {"Car": boxes}
            return KittiFrame(
                frame_id=f"synth{i:06d}", points=pts, image=image,
                calib=calib, boxes=by_cls,
                bbox2d={c: np.zeros((len(b), 4), np.float32)
                        for c, b in by_cls.items()},
                difficulty={c: np.ones(len(b), np.int32)
                            for c, b in by_cls.items()})

        frames = [make(i) for i in range(args.synthetic)]
        # a held-out synthetic val split so --eval-every works without
        # a dataset (same generator, fresh draws)
        eval_frames = None
        if args.eval_every:
            n_eval = args.eval_limit or max(args.synthetic // 4, 2)
            frames_off = len(frames)
            eval_frames = [make(frames_off + i) for i in range(n_eval)]
        gt_db = None
    else:
        if not args.dataroot or not os.path.isdir(args.dataroot):
            p.error("dataroot missing (or use --synthetic N)")
        from mvxnet_makise_tpu.data.kitti import load_dataset

        frames = load_dataset(cfg.data_root, "train", cfg,
                              load_images=not args.lidar_only,
                              limit=args.limit)
        eval_frames = None
        if args.eval_every:
            eval_frames = load_dataset(cfg.data_root, "val", cfg,
                                       load_images=not args.lidar_only,
                                       limit=args.eval_limit)
        gt_db = None
        if not args.no_augment:
            from mvxnet_makise_tpu.data.gt_database import load_database

            gtroot = os.path.join(cfg.data_root, "training", "gtdatabase")
            if os.path.isdir(gtroot):
                gt_db = load_database(cfg.data_root, cfg.target_classes)
            else:
                print("no gtdatabase found — training without paste "
                      "augmentation (build one with "
                      "tools/create_gtdatabase.py)")

    image_weights = None
    if args.image_weights:
        import torch

        image_weights = torch.load(args.image_weights, map_location="cpu")
        if hasattr(image_weights, "state_dict"):
            image_weights = image_weights.state_dict()

    train(cfg, frames, gt_db=gt_db, with_images=not args.lidar_only,
          resume_epoch=args.resume, image_weights=image_weights,
          eval_frames=eval_frames if args.eval_every else None,
          eval_every=max(args.eval_every, 1),
          time_budget_s=args.max_seconds)
    return 0


if __name__ == "__main__":
    sys.exit(main())
