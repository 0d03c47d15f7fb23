"""Persistent XLA compilation cache setup.

No reference counterpart (torch caches kernels per-process only).  The
first jit of the full fusion model costs minutes (and on remote-compile
relays, several minutes *per entry point*: init, train step, inference,
eval each compile separately).  JAX's persistent compilation cache
stores the compiled executables on disk keyed by HLO hash, so every CLI
(train, bench, serve, eval) after the first run — and every resumed /
chained run — loads its programs in seconds.

Enabled by the CLIs (tools/train.py, bench.py, serve.Detector.create);
opt out with MVXNET_TPU_NO_COMPILE_CACHE=1 or redirect the directory
with MVXNET_TPU_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "mvxnet_makise_tpu", "xla")

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 2.0) -> str | None:
    """Idempotently enable the on-disk compilation cache.

    Returns the cache directory, or None when disabled via env."""
    global _enabled
    if os.environ.get("MVXNET_TPU_NO_COMPILE_CACHE"):
        return None
    cache_dir = (cache_dir
                 or os.environ.get("MVXNET_TPU_COMPILE_CACHE_DIR")
                 or _DEFAULT_DIR)
    if _enabled:
        return cache_dir
    import jax

    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    _enabled = True
    return cache_dir
