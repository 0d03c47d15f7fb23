"""Export one of our orbax checkpoints as a reference-layout PyTorch
state_dict file, so models trained here load into the PyTorch reference
(`MVXNet().load_state_dict(torch.load(out.pkl))`) — the reverse of
``--image-weights`` / import_reference_checkpoint.

Usage: python -m mvxnet_makise_tpu.tools.export_checkpoint -r EPOCH
           [--lidar-only] [-o out.pkl]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("-r", "--epoch", type=int, default=None)
    p.add_argument("-o", "--output", default="exported_reference.pkl")
    p.add_argument("--lidar-only", action="store_true")
    p.add_argument("--checkpoint-dir", default="./checkpoints")
    args = p.parse_args(argv)

    import torch

    from mvxnet_makise_tpu.config import load_config
    from mvxnet_makise_tpu.models.import_reference import (
        export_reference_checkpoint)
    from mvxnet_makise_tpu.train import checkpoint as ckpt
    from mvxnet_makise_tpu.train.loop import build_model_and_state

    cfg = load_config(None, checkpoint_dir=args.checkpoint_dir)
    with_images = not args.lidar_only
    _, state = build_model_and_state(cfg, with_images)
    epoch = args.epoch or ckpt.latest_epoch(cfg.checkpoint_dir)
    if not epoch:
        p.error("no checkpoint found")
    state = ckpt.restore_checkpoint(cfg.checkpoint_dir, epoch, state)

    sd = export_reference_checkpoint(state.params, with_images=with_images)
    torch.save({k: torch.from_numpy(v.copy()) if hasattr(v, "copy")
                else torch.tensor(v) for k, v in sd.items()}, args.output)
    print(f"exported epoch {epoch} -> {args.output} ({len(sd)} tensors)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
