"""Host-pipeline micro-benchmarks (CPU): native C++ vs numpy feed path.

Measures the per-frame host work that runs every training/inference
step: fused range+frustum crop + projection (+ shuffle + pad).  The
reference spends this time in numba JIT kernels and a C++ extension per
sample (SURVEY.md §3.2); these numbers document our host budget.

Usage: python -m mvxnet_makise_tpu.tools.bench_host [--iters N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--points", type=int, default=120000,
                   help="raw scan size (KITTI full scans are ~120k)")
    p.add_argument("--batch", type=int, default=8,
                   help="also bench the batch-N serve-time assemble, "
                        "serial vs thread-pooled (0 = skip)")
    p.add_argument("--busy", type=int, default=0,
                   help="spawn N CPU-burner threads during the batch "
                        "bench to emulate a contended host")
    args = p.parse_args(argv)

    from mvxnet_makise_tpu.config import Config
    from mvxnet_makise_tpu.data import native
    from mvxnet_makise_tpu.data.synthetic import toy_calib

    cfg = Config()
    rng = np.random.default_rng(0)
    pts = np.zeros((args.points, 4), np.float32)
    pts[:, 0] = rng.uniform(-10, 80, args.points)
    pts[:, 1] = rng.uniform(-50, 50, args.points)
    pts[:, 2] = rng.uniform(-4, 2, args.points)
    pts[:, 3] = rng.uniform(0, 1, args.points)
    calib = toy_calib(cfg.image_size)

    def timeit(fn):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fn()
        return (time.perf_counter() - t0) / args.iters

    if native.available():
        dt = timeit(lambda: native.crop_project(
            pts, calib, cfg.velo_range, cfg.image_size))
        print(json.dumps({"bench": "crop_project_native",
                          "ms": round(dt * 1e3, 3),
                          "Mpts_per_s": round(args.points / dt / 1e6, 1)}))
        dt = timeit(lambda: native.assemble_frame(
            pts, calib, cfg.velo_range, cfg.image_size,
            cfg.max_points, seed=0))
        print(json.dumps({"bench": "assemble_frame_native",
                          "ms": round(dt * 1e3, 3),
                          "Mpts_per_s": round(args.points / dt / 1e6, 1)}))
    dt = timeit(lambda: native.crop_project_numpy(
        pts, calib, cfg.velo_range, cfg.image_size))
    print(json.dumps({"bench": "crop_project_numpy",
                      "ms": round(dt * 1e3, 3),
                      "Mpts_per_s": round(args.points / dt / 1e6, 1)}))

    if args.batch:
        _bench_batch_assemble(args, cfg, calib, pts)
    return 0


def _bench_batch_assemble(args, cfg, calib, pts):
    """Batch-8 serve-time host feed: serial vs thread-pooled
    (VERDICT r4 ask #7).  --busy spawns CPU-burner threads to emulate
    the contended host the round-4 review measured (71 ms/batch serial
    vs the builder's idle-host 14)."""
    import os
    import threading
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    from mvxnet_makise_tpu.data import native

    rng = np.random.default_rng(1)
    image = rng.uniform(0, 255, (*cfg.image_size, 3)).astype(np.float32)
    frames = [(pts, calib, image) for _ in range(args.batch)]

    stop = threading.Event()
    burners = []
    if args.busy:
        def burn():
            x = np.random.default_rng(2).random((512, 512))
            while not stop.is_set():
                x = x @ x * 1e-3
        burners = [threading.Thread(target=burn, daemon=True)
                   for _ in range(args.busy)]
        for b in burners:
            b.start()

    def timeit(fn, iters):
        fn()
        t0 = _time.perf_counter()
        for _ in range(iters):
            fn()
        return (_time.perf_counter() - t0) / iters

    try:
        serial = timeit(lambda: native.assemble_batch(
            frames, cfg.velo_range, cfg.image_size, cfg.max_points,
            args.batch), args.iters)
        with ThreadPoolExecutor(
                max_workers=min(8, os.cpu_count() or 1)) as pool:
            pooled = timeit(lambda: native.assemble_batch(
                frames, cfg.velo_range, cfg.image_size, cfg.max_points,
                args.batch, pool=pool), args.iters)
    finally:
        stop.set()
    print(json.dumps({
        "bench": "assemble_batch",
        "batch": args.batch,
        "busy_threads": args.busy,
        "serial_ms": round(serial * 1e3, 2),
        "pooled_ms": round(pooled * 1e3, 2),
        "speedup": round(serial / pooled, 2)}))


if __name__ == "__main__":
    raise SystemExit(main())
