"""Measurement probes (subcommands) — the re-runnable decision harness.

Consolidates the round-3/4 one-shot probe scripts (probe_r4*.py,
probe_conv23.py, probe_conv_forms.py, probe_int8.py — deleted in round
5; every conclusion they produced is recorded in docs/DESIGN.md's
winner/loser table and FLOP ledger).  What stays here is the machinery
someone will run twice:

  occupancy   BEV column occupancy + 3x3 dilation per CML/RPN stage on
              KITTI-shaped synthetic frames — the go/no-go input for any
              sparse/compacted formulation (the sparsity is born at the
              voxelizer, reference cpp/voxelutil.cpp:325-360, and spent
              dense at modules/voxelnet/Pipe.py:31-43).
  tablecost   XLA TPU gather cost vs source-table row count (ns/row,
              GB/s) — the physics behind the raw4 gather choice.
  rpn         time the RPN stage (reference modules/voxelnet/Pipe.py:
              45-75) across trunk shapes (Config.rpn_channels /
              rpn_extra / rpn_deconv_channels) — the measured half of
              the "cheaper dense trunk" surgery route; the AP half runs
              on tools/gen_experiment.py.

Run:  python -m mvxnet_makise_tpu.tools.probe <occupancy|tablecost|rpn>
"""

from __future__ import annotations

import argparse
import time

import numpy as np

from mvxnet_makise_tpu.utils.compile_cache import enable_persistent_cache


def _timeit(name, fn, *a, iters=20):
    import jax
    import jax.numpy as jnp

    f = jax.jit(fn)
    out = jax.tree.leaves(f(*a))[0]
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*a)
    out = jax.tree.leaves(out)[0]
    float(jnp.sum(out[:1, :1].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:58s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def _kitti_batch(B: int):
    import jax.numpy as jnp

    from mvxnet_makise_tpu.config import Config
    from mvxnet_makise_tpu.data.pipeline import collate, preprocess_frame
    from mvxnet_makise_tpu.data.synthetic import synthetic_frame
    from mvxnet_makise_tpu.train.step import frames_to_batch

    cfg = Config(use_bf16=True, batch_size=B)
    rng = np.random.default_rng(0)
    frames = [preprocess_frame(*synthetic_frame(rng, cfg), cfg)
              for _ in range(B)]
    fb = collate(frames)
    batch = frames_to_batch(jnp.asarray(fb.points),
                            jnp.asarray(fb.num_points),
                            jnp.asarray(fb.image), jnp.asarray(fb.gt_boxes),
                            jnp.asarray(fb.gt_mask), cfg)
    return cfg, batch


def cmd_occupancy(args):
    cfg, batch = _kitti_batch(args.frames)
    nx, ny, _ = cfg.voxel_shape
    coords = np.asarray(batch.coords)
    vmask = np.asarray(batch.vmask)

    def dilate(occ):
        p = np.pad(occ, 1)
        out = np.zeros_like(occ)
        for dx in range(3):
            for dy in range(3):
                out |= p[dx:dx + occ.shape[0], dy:dy + occ.shape[1]]
        return out

    def downsample2(occ):
        h, w = occ.shape
        return occ[:h - h % 2, :w - w % 2].reshape(
            h // 2, 2, w // 2, 2).any(axis=(1, 3))

    print(f"== BEV column occupancy (B={args.frames}, KITTI-shaped) ==")
    rows = []
    for b in range(args.frames):
        occ = np.zeros((nx, ny), bool)
        c = coords[b][vmask[b]]
        occ[c[:, 0], c[:, 1]] = True
        stages = [("A0 active cols", occ)]
        for i, name in enumerate(["A1 after conv1", "A2 after conv2",
                                  "A3 after conv3"]):
            occ = dilate(occ)
            stages.append((name, occ))
        # RPN footprint: stride-2 blocks dilate at successively coarser
        # grids (each block = 1 down conv + extras, all 3x3)
        rocc = occ
        for i, n_extra in enumerate(cfg.rpn_extra):
            rocc = downsample2(dilate(rocc))
            for _ in range(n_extra):
                rocc = dilate(rocc)
            stages.append((f"RPN blk{i + 1} ({rocc.shape[0]}x"
                           f"{rocc.shape[1]})", rocc))
        rows.append([(n, o.sum(), o.size) for n, o in stages])
    for i in range(len(rows[0])):
        name, _, tot = rows[0][i]
        m = np.mean([r[i][1] for r in rows])
        print(f"  {name:26s} {m:8.0f}  = {100 * m / tot:5.1f}% of {tot}")


def cmd_tablecost(args):
    import jax
    import jax.numpy as jnp

    print(f"== gather vs table size (backend={jax.default_backend()}) ==")
    n_idx = args.frames * 24576
    key = jax.random.PRNGKey(0)
    for rows in (2184, 8736, 34944, 139776):
        for width in (512, 1024):
            tab = jax.random.normal(key, (rows, width), jnp.bfloat16)
            idx = jax.random.randint(key, (n_idx,), 0, rows, jnp.int32)
            dt = _timeit(f"gather {n_idx} rows from ({rows:6d},{width})",
                         lambda t, i: t[i], tab, idx)
            print(f"    -> {dt / n_idx * 1e9:6.1f} ns/row, "
                  f"{n_idx * width * 2 / dt / 1e9:6.1f} GB/s")


# trunk variants for the cheaper-RPN sweep: name -> (channels, extra,
# deconv_ch).  The reference trunk is ~101 GFLOP/frame issued (ledger);
# each variant's parity story must be re-earned on gen_experiment.
RPN_VARIANTS = {
    "reference": ((128, 128, 256), (3, 5, 5), 256),
    "extra333": ((128, 128, 256), (3, 3, 3), 256),
    "narrow96": ((96, 96, 192), (3, 5, 5), 192),
    "half": ((64, 64, 128), (3, 5, 5), 128),
    "half-extra333": ((64, 64, 128), (3, 3, 3), 128),
}


def cmd_rpn(args):
    import jax
    import jax.numpy as jnp

    from mvxnet_makise_tpu.models.voxelnet import RPN

    B = args.frames
    H, W, C = 352, 400, 640  # CML output fed to the RPN (C*D = 128*5)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C),
                          jnp.bfloat16)
    print(f"== RPN trunk variants (B={B}, input {H}x{W}x{C}, "
          f"backend={jax.default_backend()}) ==")
    base = None
    for name, trunk in RPN_VARIANTS.items():
        model = RPN(trunk=trunk)
        params = jax.eval_shape(lambda: model.init(
            jax.random.PRNGKey(0), x))  # shapes only, for the count
        n_params = sum(int(np.prod(l.shape)) for l in
                       jax.tree.leaves(params))
        params = model.init(jax.random.PRNGKey(0), x)
        cparams = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
        flops = jax.jit(model.apply).lower(
            cparams, x).compile().cost_analysis()["flops"]
        dt = _timeit(f"{name:14s} ch={trunk[0]} extra={trunk[1]} "
                     f"dc={trunk[2]} ({n_params / 1e6:.1f}M par)",
                     model.apply, cparams, x, iters=args.iters)
        gf = flops / B / 1e9
        print(f"    -> {gf:6.1f} GFLOP/frame issued, "
              f"{flops / dt / 1e12:5.1f} TFLOP/s"
              + (f", {base / dt:.2f}x vs reference" if base else ""))
        if base is None:
            base = dt


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=("occupancy", "tablecost", "rpn"))
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--iters", type=int, default=20)
    args = p.parse_args(argv)
    enable_persistent_cache()
    {"occupancy": cmd_occupancy, "tablecost": cmd_tablecost,
     "rpn": cmd_rpn}[args.cmd](args)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
