"""Evaluation CLI: checkpoint -> KITTI Car 3D AP@0.7 on the val split.

No reference counterpart exists (its Test.py is gitignored —
SURVEY.md §6); this closes that gap.

``python -m mvxnet_makise_tpu.tools.evaluate <dataroot> -r EPOCH
[--lidar-only] [--synthetic N]``
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


from mvxnet_makise_tpu.eval.runner import run_eval  # noqa: E402,F401


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("dataroot", nargs="?", default=None)
    p.add_argument("-r", "--epoch", type=int, required=False, default=None)
    p.add_argument("--lidar-only", action="store_true")
    p.add_argument("--synthetic", type=int, default=0)
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--score-threshold", type=float, default=0.05,
                   help="decode threshold for AP (low: AP needs the "
                        "full score ranking; 0.3 is a SERVING choice)")
    args = p.parse_args(argv)

    from mvxnet_makise_tpu.config import load_config
    from mvxnet_makise_tpu.train import checkpoint as ckpt
    from mvxnet_makise_tpu.train.loop import build_model_and_state

    overrides = {}
    if args.dataroot:
        overrides["data_root"] = args.dataroot
    cfg = load_config(None, **overrides)
    with_images = not args.lidar_only
    model, state = build_model_and_state(cfg, with_images)

    epoch = args.epoch
    if epoch is None:
        epoch = ckpt.latest_epoch(cfg.checkpoint_dir)
    if epoch:
        state = ckpt.restore_checkpoint(cfg.checkpoint_dir, epoch, state)
        print(f"restored epoch {epoch}")

    if args.synthetic:
        from mvxnet_makise_tpu.data.kitti import KittiFrame
        from mvxnet_makise_tpu.data.synthetic import synthetic_frame

        rng = np.random.default_rng(1)
        frames = []
        for i in range(args.synthetic):
            pts, calib, image, boxes = synthetic_frame(rng, cfg)
            frames.append(KittiFrame(
                frame_id=f"synth{i:06d}", points=pts, image=image,
                calib=calib, boxes={"Car": boxes},
                bbox2d={"Car": np.zeros((len(boxes), 4), np.float32)},
                difficulty={"Car": np.ones(len(boxes), np.int32)}))
    else:
        from mvxnet_makise_tpu.data.kitti import load_dataset

        frames = load_dataset(cfg.data_root, "val", cfg,
                              load_images=with_images, limit=args.limit)

    res = run_eval(cfg, frames, state.params, model, with_images,
                   score_threshold=args.score_threshold)
    for cname, buckets in res.items():
        for bname, r in buckets.items():
            print(f"{cname} {bname}: AP={r['ap']:.4f} "
                  f"P={r['precision']:.4f} R={r['recall']:.4f} "
                  f"gt={r['num_gt']} det={r['num_det']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
