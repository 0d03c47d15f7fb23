"""Probe: zero-block-free forms for CML conv2/conv3.

The shipped banded (D, C)-folded 2D conv (models/voxelnet.py
ConvReluNormBanded) feeds the MXU wide lanes but issues zero-block
FLOPs: conv2 computes 5/3x and conv3 3/2x the useful MACs.  This probe
measures, at CML shapes (batch 8, 352x400, bf16):

  banded   — one (3,3, D*C, D_out*O) conv with zero blocks (shipped)
  dlast    — NHWDC 3D conv (XLA's native form, the oracle)
  perdin   — one 2D conv per INPUT depth slice, kernel
             (3,3,C, len(dos)*O), outputs added into the right output
             depths: issues exactly the useful MACs, but some convs
             have only-64-wide outputs (MXU lane stranding)
  perkd    — one 2D conv per kd tap over a (B*d_out) folded batch:
             issues useful MACs with 64-wide outputs

Numbers feed DESIGN.md's winner/loser table; run AFTER the round-4
bf16 fix (earlier in-model conv numbers were silently f32).
"""
from __future__ import annotations

import time

from mvxnet_makise_tpu.utils.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32).ravel()[:4]))


def bench(name, f, *args, macs, iters=20):
    jf = jax.jit(f)
    out = jf(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:18s} {dt * 1e3:8.2f} ms  "
          f"{2 * macs / dt / 1e12:6.1f} TFLOP/s(useful)", flush=True)
    return out


def forms(D, d_out, sd, pd0, C, O, H, W, B, kern):
    """Return dict name -> fn(x (B,H,W,D,C)) -> (B,H,W,d_out,O)."""
    dn2 = ("NHWC", "HWIO", "NHWC")

    def banded(x):
        kb = jnp.zeros((3, 3, D * C, d_out * O), x.dtype)
        for do in range(d_out):
            for kd in range(3):
                din = do * sd + kd - pd0
                if 0 <= din < D:
                    kb = kb.at[:, :, din * C:(din + 1) * C,
                               do * O:(do + 1) * O].set(
                        kern[kd].astype(x.dtype))
        y = jax.lax.conv_general_dilated(
            x.reshape(B, H, W, D * C), kb, (1, 1),
            ((1, 1), (1, 1)), dimension_numbers=dn2)
        return y.reshape(B, H, W, d_out, O)

    def dlast(x):
        k = jnp.transpose(kern, (1, 2, 0, 3, 4)).astype(x.dtype)
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, sd), (((1, 1), (1, 1), (pd0, pd0))),
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"))

    def perdin(x):
        y = jnp.zeros((B, H, W, d_out, O), x.dtype)
        for din in range(D):
            dos = [do for do in range(d_out)
                   if 0 <= din - do * sd + pd0 < 3]
            if not dos:
                continue
            kd = jnp.concatenate(
                [kern[din - do * sd + pd0].astype(x.dtype) for do in dos],
                axis=-1)                               # (3,3,C,len*O)
            c = jax.lax.conv_general_dilated(
                x[:, :, :, din, :], kd, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn2)
            c = c.reshape(B, H, W, len(dos), O)
            for i, do in enumerate(dos):
                y = y.at[:, :, :, do, :].add(c[:, :, :, i, :])
        return y

    def perkd(x):
        # gather input slices per (do, kd) into a folded batch
        y = jnp.zeros((B, H, W, d_out, O), x.dtype)
        for kd in range(3):
            dins = [do * sd + kd - pd0 for do in range(d_out)]
            ok = [(do, di) for do, di in enumerate(dins) if 0 <= di < D]
            xs = jnp.stack([x[:, :, :, di, :] for _, di in ok], axis=1)
            c = jax.lax.conv_general_dilated(
                xs.reshape(B * len(ok), H, W, C),
                kern[kd].astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=dn2).reshape(B, len(ok), H, W, O)
            for i, (do, _) in enumerate(ok):
                y = y.at[:, :, :, do, :].add(c[:, i])
        return y

    return {"banded": banded, "dlast": dlast, "perdin": perdin,
            "perkd": perkd}


def main():
    B, H, W = 8, 352, 400
    rng = np.random.default_rng(0)

    for name, (D, d_out, sd, pd0, C, O) in {
            "conv2 (5->3)": (5, 3, 1, 0, 64, 64),
            "conv3 (3->2)": (3, 2, 2, 1, 64, 64)}.items():
        print(f"== {name}: D={D}->d_out={d_out} stride_d={sd} "
              f"pad_d={pd0} C={C}->O={O}", flush=True)
        x = jnp.asarray(rng.standard_normal((B, H, W, D, C)),
                        jnp.bfloat16)
        kern = jnp.asarray(rng.standard_normal((3, 3, 3, C, O)) * 0.05,
                           jnp.float32)
        # useful MACs: per output element, taps whose din is in range
        taps = sum(1 for do in range(d_out) for kd in range(3)
                   if 0 <= do * sd + kd - pd0 < D)
        macs = B * H * W * taps * 9 * C * O   # taps x (3x3 spatial) x C
        fs = forms(D, d_out, sd, pd0, C, O, H, W, B, kern)
        ref = None
        for fname, fn in fs.items():
            out = bench(f"{fname}", fn, x, macs=macs)
            o = np.asarray(out, np.float32)
            if ref is None:
                ref = o
            else:
                err = np.max(np.abs(o - ref)) / (np.max(np.abs(ref)) + 1e-9)
                print(f"   max rel err vs banded: {err:.4f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
