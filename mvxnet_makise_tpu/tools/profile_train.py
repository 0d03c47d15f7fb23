"""Per-component wall-clock profile of the TRAINING step.

Companion to tools/profile_components.py (inference): decomposes the
fused fwd+bwd+AdamW step the way the reference kept forward/loss/
backward counters (/root/reference/train.py:74-77,124-164), plus an
isolated probe of the column-merge kernel's forward vs its XLA-gather
backward (ops/pallas_column_merge._merge_taps_bwd — the "future
optimization" named in VERDICT r3 ask #7).

Stages (each its own jit, forced host-readback sync):
  * voxelize_assign — frames_to_batch + anchor target assignment
  * loss_value      — forward + loss, no grad
  * loss_grad       — value_and_grad of the same
  * full_step       — the production fused step (grad + AdamW + update)
  * merge_fwd / merge_bwd — merge_taps_fused at flagship shapes with a
    KITTI-like active-column count (isolated vjp probe)

Usage: python -m mvxnet_makise_tpu.tools.profile_train [--batch N]
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--active-cols", type=int, default=10_500,
                   help="active BEV columns per frame for the isolated "
                        "merge probe (KITTI-shaped measurement: 10.5k, "
                        "tools/probe.py occupancy)")
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
    from mvxnet_makise_tpu.ops import create_anchors
    from mvxnet_makise_tpu.train.loop import (build_model_and_state,
                                              make_full_train_step)
    from mvxnet_makise_tpu.train.state import (TrainState, make_apply,
                                               make_optimizer)
    from mvxnet_makise_tpu.train.step import (_assign_batch, compute_loss,
                                              frames_to_batch)

    cfg = Config(use_bf16=True, batch_size=B)
    rng = np.random.default_rng(0)
    frames = [preprocess_frame(*synthetic_frame(rng, cfg), cfg)
              for _ in range(B)]
    fb = collate(frames)
    points = jnp.asarray(fb.points)
    nums = jnp.asarray(fb.num_points)
    images = jnp.asarray(fb.image)
    gts = jnp.asarray(fb.gt_boxes)
    gms = jnp.asarray(fb.gt_mask)
    gcs = jnp.zeros(gms.shape, jnp.int32)
    key = jax.random.key(0)

    anchors = create_anchors(cfg.feature_map_shape, cfg.velo_range,
                             cfg.anchor_sizes)
    model, state = build_model_and_state(cfg, with_images=True)
    apply_fn = make_apply(model, cfg)
    tstate = TrainState.create(apply_fn, state.params, make_optimizer(cfg))
    del state

    def sync(x):
        leaf = jax.tree.leaves(x)[0]
        flat = leaf.reshape(-1)[:4].astype(jnp.float32)
        return float(jnp.sum(flat))

    def bench(name, fn, jfn=None, jargs=()):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn()
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters
        rec = {"stage": name, "ms_per_batch": round(dt * 1e3, 2),
               "ms_per_frame": round(dt * 1e3 / B, 3),
               "compile_s": round(compile_s, 1)}
        try:
            ca = (jfn or fn).lower(*jargs).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            gf = float(ca.get("flops", 0.0)) / 1e9
            if gf:
                rec["gflop_per_batch"] = round(gf, 1)
                rec["tflops"] = round(gf / 1e3 / dt, 1)
        except Exception:
            pass
        print(json.dumps(rec), flush=True)
        return dt

    # ---- stage 1: device input pipeline (voxelize + anchor targets)
    def vox_assign():
        batch = frames_to_batch(points, nums, images, gts, gms, cfg,
                                shuffle_key=key, gt_classes=gcs)
        return _assign_batch(batch, cfg), batch.coords

    bench("voxelize_assign", jax.jit(vox_assign))

    # materialize one batch + targets for the loss probes
    batch = frames_to_batch(points, nums, images, gts, gms, cfg,
                            shuffle_key=key, gt_classes=gcs)
    targets = _assign_batch(batch, cfg)
    jax.block_until_ready(batch.coords)

    def loss_value(params):
        # compute_loss casts params + batch for compute internally
        return compute_loss(params, batch, targets, anchors, apply_fn,
                            cfg, with_images=True)[0]

    bench("loss_value", jax.jit(
        lambda: loss_value(tstate.params)))

    gfn = jax.jit(jax.value_and_grad(loss_value))
    bench("loss_grad", lambda: gfn(tstate.params),
          jfn=gfn, jargs=(tstate.params,))

    # ---- production fused step (voxelize+assign+grad+AdamW)
    step = make_full_train_step(cfg, anchors, with_images=True)

    holder = {"s": tstate}

    def full():
        s, m = step(holder["s"], points, nums, images, gts, gms, gcs, key)
        holder["s"] = s
        return m

    bench("full_step", full, jfn=step,
          jargs=(tstate, points, nums, images, gts, gms, gcs, key))

    # ---- isolated merge kernel: fwd vs XLA-gather bwd at real shapes
    from mvxnet_makise_tpu.ops.pallas_column_merge import merge_taps_fused

    V = cfg.max_voxels
    nx, ny, nz = cfg.voxel_shape
    R = 64 * (nz // 2)    # packed conv1 output: 64 ch x 5 depths
    nact = min(args.active_cols, V)
    rj = np.random.default_rng(1)
    # sorted active (cx, cy) per frame, then padded
    cys, bnds = [], []
    for _ in range(B):
        lin = np.sort(rj.choice(nx * ny, size=nact, replace=False))
        cx = np.full(V, nx, np.int32)
        cy = np.zeros(V, np.int32)
        cx[:nact] = lin // ny
        cy[:nact] = lin % ny
        cys.append(cy)
        bnds.append(np.searchsorted(cx, np.arange(nx + 1), side="left"))
    col_cy = jnp.asarray(np.stack(cys), jnp.int32)
    bounds = jnp.asarray(np.stack(bnds), jnp.int32)
    y = jnp.asarray(rj.standard_normal((B, V, 9, R)), jnp.bfloat16)
    bias = jnp.zeros((R,), jnp.float32)

    def merge_fwd(yv):
        out, stats = merge_taps_fused(yv, col_cy, bounds, bias,
                                      cfg.voxel_shape)
        return out

    fwd = jax.jit(merge_fwd)
    bench("merge_fwd", lambda: fwd(y), jfn=fwd, jargs=(y,))

    def merge_bwd_probe(yv):
        out, vjp = jax.vjp(merge_fwd, yv)
        return vjp(jnp.ones_like(out))[0]

    bwdp = jax.jit(merge_bwd_probe)
    bench("merge_fwd_plus_bwd", lambda: bwdp(y), jfn=bwdp, jargs=(y,))
    print(json.dumps({"note": "merge_bwd ms = fwd_plus_bwd - fwd"}),
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
