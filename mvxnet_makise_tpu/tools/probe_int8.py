"""Probe: does XLA:TPU emit fast int8 convolutions/matmuls on this chip?

VERDICT r3's north-star route names int8 on the frozen image branch as
a candidate (the branch is inference-only and frozen — reference
Head.py:9-11 — so quantization needs no QAT).  Before building a
quantized ResNet, measure whether the hardware path exists: v5e lists
2x int8 throughput over bf16 (394 vs 197 TOPS).  This probe times
  * a big square matmul: bf16 vs int8 (preferred_element_type=int32)
  * a ResNet-shaped 3x3 conv (104x336x256 -> 256, batch 8): bf16 vs int8
and prints ns-per-MAC-normalized TOPs for each.

Usage: python -m mvxnet_makise_tpu.tools.probe_int8
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


def bench(name, fn, *args, macs, iters=20):
    f = jax.jit(fn)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.3f} ms   "
          f"{2 * macs / dt / 1e12:7.1f} TOP/s", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # --- matmul: 4096 x 4096 x 4096
    n = 4096
    a16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    a8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    macs = n ** 3

    bench("matmul bf16", lambda x, y: x @ y, a16, b16, macs=macs)
    bench("matmul int8->int32",
          lambda x, y: jax.lax.dot(x, y,
                                   preferred_element_type=jnp.int32),
          a8, b8, macs=macs)

    # --- conv: FPN layer-0-shaped 3x3, batch 8
    B, H, W, C = 8, 104, 336, 256
    x16 = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.bfloat16)
    k16 = jnp.asarray(rng.standard_normal((3, 3, C, C)), jnp.bfloat16)
    x8 = jnp.asarray(rng.integers(-127, 127, (B, H, W, C)), jnp.int8)
    k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, C, C)), jnp.int8)
    cmacs = B * H * W * 9 * C * C

    dn = jax.lax.conv_dimension_numbers(x16.shape, k16.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(x, k, pet):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=pet)

    bench("conv3x3 256ch bf16",
          lambda x, k: conv(x, k, jnp.float32), x16, k16, macs=cmacs)
    try:
        bench("conv3x3 256ch int8->int32",
              lambda x, k: conv(x, k, jnp.int32), x8, k8, macs=cmacs)
    except Exception as e:  # pragma: no cover - probe
        print(f"conv int8: UNSUPPORTED ({type(e).__name__}: {e})",
              flush=True)

    # int8 conv via im2col matmul (fallback formulation if the direct
    # conv path is slow/unsupported): patches as int8 matmul
    def conv_im2col_i8(x, k):
        pad = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [pad[:, i:i + H, j:j + W, :]
                for i in range(3) for j in range(3)]
        xi = jnp.concatenate(cols, axis=-1).reshape(B * H * W, 9 * C)
        km = k.transpose(0, 1, 2, 3).reshape(9 * C, C)
        return jax.lax.dot(xi, km, preferred_element_type=jnp.int32)

    try:
        bench("conv3x3 int8 im2col-matmul", conv_im2col_i8, x8, k8,
              macs=cmacs)
    except Exception as e:  # pragma: no cover - probe
        print(f"conv int8 im2col: UNSUPPORTED ({type(e).__name__}: {e})",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
