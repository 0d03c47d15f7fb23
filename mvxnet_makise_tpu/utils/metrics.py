"""Training observability: loss statistics and phase timing.

Reference behaviour (SURVEY.md §5): hand-rolled wall-clock accumulators
for forward/loss/backward (/root/reference/train.py:74-77, 124-164),
running avg/max classification & regression loss printed every 50
iterations with NaN exclusion (train.py:142-151, 170-174).  This module
keeps the same observable quantities behind structured APIs.

On TPU the forward/loss/backward phases fuse into one XLA program, so
:class:`PhaseTimer` tracks whatever phases the loop actually has (host
preprocess, device step, eval, checkpoint) via ``block_until_ready``
boundaries rather than pretending the fused step decomposes.
"""

from __future__ import annotations

import math
import time
from collections import defaultdict
from typing import Dict


class LossTracker:
    """Running avg/max with NaN filtering (train.py:142-151 semantics:
    NaN values are excluded from statistics but counted)."""

    def __init__(self):
        self.sum: Dict[str, float] = defaultdict(float)
        self.max: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)
        self.nan_count: Dict[str, int] = defaultdict(int)
        self.total_seen = 0

    def update(self, metrics: Dict[str, float]):
        self.total_seen += 1
        for k, v in metrics.items():
            v = float(v)
            if math.isnan(v) or math.isinf(v):
                self.nan_count[k] += 1
                continue
            self.sum[k] += v
            self.max[k] = max(self.max[k], v)
            self.count[k] += 1

    def average(self, key: str) -> float:
        c = self.count[key]
        return self.sum[key] / c if c else float("nan")

    def maximum(self, key: str) -> float:
        return self.max[key] if self.count[key] else float("nan")

    def summary(self) -> Dict[str, float]:
        out = {}
        for k in self.sum:
            out[f"avg_{k}"] = self.average(k)
            out[f"max_{k}"] = self.maximum(k)
        for k, v in self.nan_count.items():
            out[f"nan_{k}"] = v
        return out

    def reset(self):
        self.__init__()


class PhaseTimer:
    """Accumulating wall-clock timers per named phase.

    Usage: ``with timer.phase("device_step"): ...``.  Callers are
    responsible for putting ``jax.block_until_ready`` at phase edges when
    device work must be attributed correctly.
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    class _Ctx:
        def __init__(self, timer, name):
            self.timer, self.name = timer, name

        def __enter__(self):
            self.t0 = time.perf_counter()
            return self

        def __exit__(self, *exc):
            dt = time.perf_counter() - self.t0
            self.timer.totals[self.name] += dt
            self.timer.counts[self.name] += 1
            return False

    def phase(self, name: str) -> "_Ctx":
        return self._Ctx(self, name)

    def summary(self) -> Dict[str, float]:
        return {k: self.totals[k] for k in sorted(self.totals)}

    def report(self) -> str:
        parts = []
        for k in sorted(self.totals):
            c = max(self.counts[k], 1)
            parts.append(f"{k}: {self.totals[k]:.2f}s "
                         f"({self.totals[k] / c * 1e3:.1f} ms/it)")
        return " | ".join(parts)
