"""Profiler integration.

The reference has no profiler hookup (SURVEY.md §5 — only perf_counter
accumulators).  Here: a context manager around ``jax.profiler`` producing
TensorBoard-compatible traces of the XLA timeline (compile, HBM traffic,
fusion boundaries), the tool actually used to chase the HBM-bound spots
this model family has (dense scatter + CML convs).
"""

from __future__ import annotations

import contextlib
import os


@contextlib.contextmanager
def trace_context(logdir: str = "/tmp/mvxnet_trace", enabled: bool = True):
    """``with trace_context('/tmp/trace'):`` profiles the enclosed steps."""
    if not enabled:
        yield
        return
    import jax

    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
