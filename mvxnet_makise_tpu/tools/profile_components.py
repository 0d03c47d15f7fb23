"""Per-component wall-clock profile of the inference pipeline.

Times each stage in isolation (separate jits, forced host-readback sync)
on the attached accelerator — the decomposition the reference kept as
forward/loss/backward counters (train.py:74-77), extended to the stages
that actually matter here.  Profiles the pm flagship dataflow
(MVXNetPM); ``--fusion-mode point`` profiles the slot-based point-fusion
model instead.

Usage: python -m mvxnet_makise_tpu.tools.profile_components [--batch N]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--fusion-mode", default="pm",
                   choices=["pm", "point"])
    p.add_argument("--cml-mode", default=None,
                   choices=["dense3d", "banded", "column"],
                   help="override the CML first-layer formulation "
                        "(default: config default)")
    args = p.parse_args(argv)
    B = args.batch

    from mvxnet_makise_tpu.utils.compile_cache import (
        enable_persistent_cache)

    enable_persistent_cache()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from mvxnet_makise_tpu.config import Config
    from mvxnet_makise_tpu.data.pipeline import collate, preprocess_frame
    from mvxnet_makise_tpu.data.synthetic import synthetic_frame
    from mvxnet_makise_tpu.models.image_head import (
        PointImageHead, detection_transform)
    from mvxnet_makise_tpu.models.resnet_fpn import ResNet50FPN
    from mvxnet_makise_tpu.train.loop import build_model_and_state
    from mvxnet_makise_tpu.train.state import cast_for_compute
    from mvxnet_makise_tpu.train.step import (_model_inputs,
                                              cast_batch_for_compute,
                                              frames_to_batch)

    ckw = {}
    if args.cml_mode:
        ckw["cml_mode"] = args.cml_mode
    cfg = Config(use_bf16=True, batch_size=B, fusion_mode=args.fusion_mode,
                 **ckw)
    rng = np.random.default_rng(0)
    frames = [preprocess_frame(*synthetic_frame(rng, cfg), cfg)
              for _ in range(B)]
    fb = collate(frames)
    points = jnp.asarray(fb.points)
    nums = jnp.asarray(fb.num_points)
    images = jnp.asarray(fb.image)

    def sync(x):
        return float(jnp.sum(jax.tree.leaves(x)[0].astype(jnp.float32)))

    def _flops(fn, *a) -> float:
        """XLA-counted FLOPs of the jitted stage (issued, not useful)."""
        try:
            ca = fn.lower(*a).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            return float(ca.get("flops", 0.0))
        except Exception:
            return 0.0

    def bench(name, fn, *a):
        # pass big arrays as explicit jit ARGUMENTS, never closures — a
        # closed-over concrete array becomes an HLO constant and XLA
        # will happily constant-fold a whole gather at compile time
        # (measured: 314 s compile for the closure form of the raw4
        # gather stage)
        t0 = time.perf_counter()
        out = fn(*a)
        sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        gf = _flops(fn, *a) / 1e9
        rec = {"stage": name, "ms_per_batch": round(dt * 1e3, 2),
               "ms_per_frame": round(dt * 1e3 / B, 3),
               "compile_s": round(compile_s, 1)}
        if gf:
            rec["gflop_per_batch"] = round(gf, 1)
            rec["gflop_per_frame"] = round(gf / B, 1)
            rec["tflops"] = round(gf / 1e3 / dt, 1)
        print(json.dumps(rec), flush=True)

    zero_gt = (jnp.zeros((B, 1, 7)), jnp.zeros((B, 1), bool))
    bench("voxelize", jax.jit(
        lambda: frames_to_batch(points, nums, images, *zero_gt,
                                cfg).coords))

    batch = frames_to_batch(points, nums, images, *zero_gt, cfg)
    jax.block_until_ready(batch.coords)
    model, state = build_model_and_state(cfg, with_images=True)
    params = state.params
    del state
    cparams = cast_for_compute(params, True)
    cbatch = cast_batch_for_compute(batch, True)
    bimg = images.astype(jnp.bfloat16)

    rp = cast_for_compute(
        {"params": params["params"]["head"]["extractor"]}, True)
    bench("resnet_fpn", jax.jit(
        lambda: ResNet50FPN().apply(
            rp, jax.vmap(detection_transform)(bimg))[0]))

    hp = cast_for_compute({"params": params["params"]["head"]}, True)
    head = PointImageHead(cfg.image_size)
    if args.fusion_mode == "pm":
        kept = batch.sorted_kept
        rc = batch.sorted_points[..., 4:6]
        nv = (jnp.sum(batch.vmask) * cfg.samples_per_voxel
              - jnp.sum(kept))
    else:
        kept = batch.point_slots >= 0
        rc = batch.points[..., 4:6]
        nv = (jnp.sum(batch.vmask) * cfg.samples_per_voxel
              - jnp.sum(kept))
    bench("image_head_total", jax.jit(
        lambda: head.apply(hp, bimg, rc, kept, nv)[0]))

    # sub-stages of the head: gather alone, fusion MLP alone (the
    # ledger's worst-intensity row — VERDICT r4 ask #5).  The fusion is
    # profiled in both statistics formulations (models/blocks.py
    # DenseReluNormVirtual vs ...Full).
    from mvxnet_makise_tpu.models.image_head import (PointImageFusion,
                                                     gather_image_size)
    from mvxnet_makise_tpu.ops.gather import bilinear_gather_fpn_batch

    pyr = jax.block_until_ready(jax.jit(
        lambda im: tuple(ResNet50FPN().apply(
            rp, jax.vmap(detection_transform)(im))))(bimg))
    gsize = gather_image_size(cfg.image_size, cfg.image_min_side)
    for fuse in (False, True):
        gather_fn = jax.jit(
            lambda pyr_, rc_, ok_, fuse=fuse: bilinear_gather_fpn_batch(
                pyr_, rc_, ok_, gsize, fuse_coarse=fuse))
        bench("fpn_gather_raw4" + ("_fused" if fuse else ""),
              gather_fn, pyr, rc, kept)
    g = jax.block_until_ready(gather_fn(pyr, rc, kept))
    fp = {"params": params["params"]["head"]["fusion"]}
    for fstats in ("masked", "full"):
        bench(f"fusion_mlp_{fstats}", jax.jit(
            lambda g_, ok_, nv_, fstats=fstats: PointImageFusion(
                cfg.eps, fstats).apply(fp, g_, ok_, nv_)[0]),
              g, kept, nv)

    # LiDAR branch in the flagship dataflow (image features zeroed)
    if args.fusion_mode == "pm":
        from mvxnet_makise_tpu.models.voxelnet_pm import (
            VoxelNetBranchPM, point_lidar_features)

        pf7 = jax.vmap(point_lidar_features)(
            batch.sorted_points, batch.sorted_seg, batch.sorted_kept,
            batch.counts)
        x23 = jnp.concatenate(
            [pf7.astype(jnp.bfloat16),
             jnp.zeros((*pf7.shape[:2], 16), jnp.bfloat16)], -1)
        z0 = jnp.zeros((B, cfg.max_voxels, 23), jnp.bfloat16)
        vb = VoxelNetBranchPM(grid_shape=cfg.voxel_shape,
                              samples_per_voxel=cfg.samples_per_voxel,
                              cml_mode=cfg.cml_mode)
        vbp = cast_for_compute(
            {"params": params["params"]["backbone"]}, True)
        bench("voxelnet_branch", jax.jit(
            lambda: vb.apply(vbp, x23, batch.sorted_kept,
                             batch.sorted_seg, batch.counts, batch.coords,
                             batch.vmask, z0)[0]))
    else:
        from mvxnet_makise_tpu.models import VoxelNetBranch

        vb = VoxelNetBranch(grid_shape=cfg.voxel_shape)
        bvox = batch.voxels.astype(jnp.bfloat16)
        fused = jnp.concatenate(
            [bvox[..., :7],
             jnp.zeros((*bvox.shape[:3], 16), jnp.bfloat16)], -1)
        vbp = cast_for_compute(
            {"params": params["params"]["backbone"]}, True)
        bench("voxelnet_branch", jax.jit(
            lambda: vb.apply(vbp, fused, batch.coords, batch.vmask)[0]))

    bench("full_model", jax.jit(
        lambda: model.apply(cparams,
                            *_model_inputs(cbatch, True))[0]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())