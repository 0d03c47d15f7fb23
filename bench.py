"""End-to-end throughput benchmark — prints ONE JSON line.

Headline metric (default mode): KITTI-shaped frames/sec/chip for the
FULL detection path — host feed (fused C++ crop+project+pad), device
voxelization, MVXNet point-fusion forward, box decode and rotated NMS,
detections back on host (serve.Detector) — bf16 compute, batched.  The
line also carries ``raw_forward_fps`` (device voxelize+fuse+infer only,
the r01 headline) for continuity.

Baseline: the reference publishes no numbers (BASELINE.md); the
driver-set north star is 500 frames/s/chip end-to-end on TPU v5e, so
``vs_baseline`` = value / 500.

Run: python bench.py [--batch N] [--iters N] [--lidar-only]
                     [--raw-only] [--train]

Resilience (VERDICT r4 ask #3): the measurement runs in a supervised
child.  Each stage (setup / compile / measure / serve) has its own
SIGALRM budget so a wedged relay link is diagnosed by stage; measured
numbers are flushed to a partials side-file the moment they exist; the
supervisor retries a failed child once and, if the retry also dies,
prints the newest salvaged partial instead of a 0.0 — one flaky link
event can no longer erase the round's headline
(utils/watchdog.py; mirrors __graft_entry__'s multichip hardening).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np


def _metric_name(args) -> str:
    if args.train:
        return ("kitti_train_frames_per_sec_per_chip"
                + ("_lidar_only" if args.lidar_only else ""))
    if args.raw_only:
        return ("kitti_frames_per_sec_per_chip_raw_forward"
                + ("_lidar_only" if args.lidar_only else ""))
    return ("kitti_frames_per_sec_per_chip_e2e_detection"
            + ("_lidar_only" if args.lidar_only else ""))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--lidar-only", action="store_true")
    ap.add_argument("--raw-only", action="store_true",
                    help="measure only the raw device forward (r01 "
                         "headline) instead of the full detection path")
    ap.add_argument("--train", action="store_true",
                    help="measure the fused training step instead of "
                         "inference")
    ap.add_argument("--max-points", type=int, default=0,
                    help="override Config.max_points (capacity sizing "
                         "A/B; 0 = keep the default)")
    ap.add_argument("--norm-scope", default="",
                    choices=["", "sample", "batch"],
                    help="override Config.norm_scope ('sample' | "
                         "'batch') to A/B the per-sample vmap wrapper")
    ap.add_argument("--image-min-side", type=float, default=400.0,
                    help="Config.image_min_side for the BENCHMARKED "
                         "serving configuration (default 400: measured "
                         "AP-neutral-or-better on the held-out protocol "
                         "— best AP@0.5 0.342 vs 0.159 at the reference "
                         "scale, GEN_PROTOCOL.jsonl — and 1.17x faster; "
                         "800 = reference-parity transform semantics, "
                         "0 = native scale, -1 = Config default)")
    ap.add_argument("--fusion-stats", default="",
                    choices=["", "masked", "full"],
                    help="override Config.fusion_stats (fusion-MLP "
                         "statistics formulation A/B)")
    ap.add_argument("--gather-backend", default="",
                    choices=["", "raw4", "raw4f", "xla", "xla_fused",
                             "pallas"],
                    help="override Config.gather_backend (FPN gather "
                         "formulation A/B)")
    ap.add_argument("--rpn", default="half",
                    help="RPN trunk variant (tools/probe.RPN_VARIANTS) "
                         "for the BENCHMARKED configuration.  Default "
                         "'half' (64,64,128)/128: 1.46x faster RPN "
                         "stage AND the best held-out protocol AP of "
                         "any configuration (0.577 vs the full trunk's "
                         "0.341, GEN_PROTOCOL.jsonl) — it forfeits "
                         "reference-RPN-checkpoint interchange, so "
                         "pass 'reference' for the parity trunk")
    ap.add_argument("--max-seconds", type=int, default=1500,
                    help="hard cap per supervised attempt; stages also "
                         "carry individual watchdog budgets")
    ap.add_argument("--child", action="store_true",
                    help=argparse.SUPPRESS)  # internal: supervised child
    args = ap.parse_args()

    from mvxnet_makise_tpu.utils.watchdog import (PartialWriter,
                                                  StageWatchdog, supervise)

    if not args.child:
        cmd = ([sys.executable, os.path.abspath(__file__)]
               + sys.argv[1:] + ["--child"])
        rec = supervise(cmd, metric=_metric_name(args),
                        attempt_timeout=args.max_seconds, retries=1)
        print(json.dumps(rec), flush=True)
        return 0 if rec.get("value", 0.0) > 0.0 else 2

    partials = PartialWriter(os.environ.get("BENCH_PARTIALS"))
    wd = StageWatchdog(
        {"setup": 420, "compile_raw": 600, "measure_raw": 240,
         "compile_train": 600, "measure_train": 300, "serve_setup": 300,
         "serve_compile": 400, "serve_measure": 240},
        metric=_metric_name(args))
    wd.enter("setup")

    import jax
    import jax.numpy as jnp

    from mvxnet_makise_tpu.utils.compile_cache import (
        enable_persistent_cache)

    enable_persistent_cache()

    from mvxnet_makise_tpu.config import Config
    from mvxnet_makise_tpu.data.pipeline import collate, preprocess_frame
    from mvxnet_makise_tpu.data.synthetic import synthetic_frame
    from mvxnet_makise_tpu.train.loop import build_model_and_state
    from mvxnet_makise_tpu.train.state import cast_for_compute
    from mvxnet_makise_tpu.train.step import frames_to_batch

    rpn_kw = {}
    if args.rpn:
        from mvxnet_makise_tpu.tools.probe import RPN_VARIANTS

        ch, ex, dc = RPN_VARIANTS[args.rpn]
        rpn_kw = dict(rpn_channels=ch, rpn_extra=ex,
                      rpn_deconv_channels=dc)
    cfg = Config(use_bf16=True, batch_size=args.batch,
                 **({"max_points": args.max_points}
                    if args.max_points else {}),
                 **({"norm_scope": args.norm_scope}
                    if args.norm_scope else {}),
                 **({"image_min_side": args.image_min_side}
                    if args.image_min_side >= 0 else {}),
                 **({"fusion_stats": args.fusion_stats}
                    if args.fusion_stats else {}),
                 **({"gather_backend": args.gather_backend}
                    if args.gather_backend else {}),
                 **rpn_kw)
    rng = np.random.default_rng(0)

    # host-side: synthesize + pad a batch of KITTI-like frames
    frames = []
    for _ in range(args.batch):
        pts, calib, image, boxes = synthetic_frame(rng, cfg)
        frames.append(preprocess_frame(pts, calib, image, boxes, cfg))
    fb = collate(frames)

    with_images = not args.lidar_only
    model, state = build_model_and_state(cfg, with_images)
    init_params = state.params
    del state

    from mvxnet_makise_tpu.train.step import _model_inputs

    # params are jit constants, matching the serving path (serve.py
    # _pipeline): inference weights are frozen, so per-call pytree-arg
    # marshaling is pure dispatch overhead
    cparams0 = cast_for_compute(init_params, cfg.use_bf16)

    def infer(points, num_points, images):
        batch = frames_to_batch(points, num_points, images,
                                jnp.zeros((args.batch, 1, 7)),
                                jnp.zeros((args.batch, 1), bool), cfg)
        from mvxnet_makise_tpu.train.state import make_apply
        from mvxnet_makise_tpu.train.step import (
            cast_batch_for_compute)

        cbatch = cast_batch_for_compute(batch, cfg.use_bf16)
        score, reg = make_apply(model, cfg)(
            cparams0, *_model_inputs(cbatch, with_images))
        return score.astype(jnp.float32), reg.astype(jnp.float32)

    points = jnp.asarray(fb.points)
    num_points = jnp.asarray(fb.num_points)
    images = jnp.asarray(fb.image)

    if args.train:
        from mvxnet_makise_tpu.ops import create_anchors
        from mvxnet_makise_tpu.train.loop import make_full_train_step
        from mvxnet_makise_tpu.train.state import TrainState, make_optimizer

        anchors = create_anchors(cfg.feature_map_shape, cfg.velo_range,
                                 cfg.anchor_sizes)
        from mvxnet_makise_tpu.train.state import make_apply

        tstate = TrainState.create(make_apply(model, cfg), init_params,
                                   make_optimizer(cfg))
        tstep = make_full_train_step(cfg, anchors, with_images)
        gts = jnp.asarray(fb.gt_boxes)
        gms = jnp.asarray(fb.gt_mask)
        gcs = jnp.zeros(gms.shape, jnp.int32)
        key = jax.random.key(0)

        def sync_t(s):
            return float(jnp.sum(jax.tree.leaves(s.params)[0]
                                 .astype(jnp.float32).ravel()[:4]))

        wd.enter("compile_train")
        for _ in range(args.warmup):
            tstate, m = tstep(tstate, points, num_points, images, gts,
                              gms, gcs, key)
            sync_t(tstate)
        wd.enter("measure_train")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            tstate, m = tstep(tstate, points, num_points, images, gts,
                              gms, gcs, key)
        sync_t(tstate)
        dt = time.perf_counter() - t0
        wd.cancel()
        fps = args.batch * args.iters / dt
        print(json.dumps({
            "metric": "kitti_train_frames_per_sec_per_chip"
                      + ("_lidar_only" if args.lidar_only else ""),
            "value": round(fps, 2), "unit": "frames/s",
            "vs_baseline": round(fps / 500.0, 4)}))
        return

    step = jax.jit(infer)

    def sync(o):
        # force a real device sync: block_until_ready is not a reliable
        # execution barrier on relayed/remote backends, so read a reduced
        # scalar back to the host (cheap: one f32)
        return float(jnp.sum(o[0][:, 0, 0, 0]))

    wd.enter("compile_raw")
    for _ in range(args.warmup):
        out = step(points, num_points, images)
        sync(out)

    wd.enter("measure_raw")
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(points, num_points, images)
    checksum = sync(out)
    dt = time.perf_counter() - t0
    assert np.isfinite(checksum), "non-finite benchmark output"

    raw_fps = args.batch * args.iters / dt
    raw_record = {
        "metric": "kitti_frames_per_sec_per_chip_raw_forward"
                  + ("_lidar_only" if args.lidar_only else ""),
        "value": round(raw_fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(raw_fps / 500.0, 4),
    }
    # the raw number exists NOW — flush it so a later serve-stage stall
    # can only degrade the headline to this, never to 0.0
    partials.emit(raw_record)

    if args.raw_only:
        wd.cancel()
        print(json.dumps(raw_record))
        return

    # ---- headline: full detection path through the PACKAGED serving
    # loop (serve.Detector.stream_batches, the double-buffered core of
    # detect_stream): host feed (fused C++ crop+project+pad), compiled
    # voxelize -> fuse -> decode -> NMS, detections pulled back to host.
    # The host assemble runs inside the timed loop and overlaps device
    # execution (dispatch is async), so the measurement is the true
    # overlapped steady state, not host+device summed.  One caveat
    # stands: the batch arrays fed to the device are pre-uploaded and
    # reused, because on this relayed test rig the tunnel moves
    # ~36 MB/s — including the upload would benchmark the relay, not
    # the chip.  On local hardware the ~50 MB/batch upload rides PCIe/
    # HBM at sub-ms cost and SHOULD be included (upload_excluded flags
    # this in the JSON).
    from mvxnet_makise_tpu.data import native
    from mvxnet_makise_tpu.serve import Detector

    wd.enter("serve_setup")
    det = Detector(cfg, model, init_params, with_images=with_images)
    rng2 = np.random.default_rng(1)
    raw_frames = []
    for _ in range(args.batch):
        fpts, fcalib, fimage, _ = synthetic_frame(rng2, cfg)
        raw_frames.append((fpts, fcalib, fimage))

    # host-feed cost (per batch), reported for the breakdown — warm up
    # first so the lazy ctypes extension build (g++, ~seconds) happens
    # outside any timed region
    native.assemble_frame(raw_frames[0][0], raw_frames[0][1],
                          cfg.velo_range, cfg.image_size, cfg.max_points,
                          seed=0)
    t0 = time.perf_counter()
    host_reps = max(args.iters // 4, 1)
    for _ in range(host_reps):
        det._assemble(raw_frames, args.batch)
    host_dt = (time.perf_counter() - t0) / host_reps

    def batches(n):
        # real per-batch host assemble inside the loop (its cost must
        # overlap device execution, as in production), device arrays
        # pre-uploaded (see upload_excluded note above)
        for _ in range(n):
            det._assemble(raw_frames, args.batch)
            yield points, num_points, images, args.batch

    # warm: compile the serve pipeline + first readback
    wd.enter("serve_compile")
    for _ in det.stream_batches(batches(2), args.batch):
        pass

    wd.enter("serve_measure")
    t0 = time.perf_counter()
    last = None
    for d in det.stream_batches(batches(args.iters), args.batch):
        last = d
    dt = time.perf_counter() - t0
    wd.cancel()
    # scores are sigmoid-bounded; boxes may overflow under random
    # init-weight deltas (exp of an untrained reg head) — not a timing
    # concern
    assert np.isfinite(last.scores).all()

    fps = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "kitti_frames_per_sec_per_chip_e2e_detection"
                  + ("_lidar_only" if args.lidar_only else ""),
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 500.0, 4),
        "raw_forward_fps": round(raw_fps, 2),
        "host_feed_ms_per_batch": round(host_dt * 1e3, 2),
        "serve_loop_ms_per_batch": round(dt / args.iters * 1e3, 2),
        "pipelined_serve_loop": True,
        "image_min_side": cfg.image_min_side,
        "gather_backend": cfg.gather_backend,
        "fusion_stats": cfg.fusion_stats,
        "rpn": args.rpn or "reference",
        "upload_excluded": True,
    }))


if __name__ == "__main__":
    main()
