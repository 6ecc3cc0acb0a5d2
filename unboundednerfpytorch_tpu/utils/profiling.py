"""Tracing / profiling utilities (SURVEY.md §5: first-class on TPU).

The reference only prints wall-clock deltas (run_train.py:154,300-305). Here:
xprof trace capture around any region, a per-step timing aggregator with
percentile reporting, and a rays/s meter for the renderer.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler (xprof) trace for the enclosed region; view
    with tensorboard/xprof."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall-clock aggregator with percentile summaries; call
    ``tick`` around blocking step boundaries."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: list[float] = []
        self._last: float | None = None
        self._count = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self.times.append(now - self._last)
        self._last = now

    def summary(self) -> dict:
        if not self.times:
            return {}
        arr = np.asarray(self.times)
        return {
            "mean_s": float(arr.mean()),
            "p50_s": float(np.percentile(arr, 50)),
            "p90_s": float(np.percentile(arr, 90)),
            "p99_s": float(np.percentile(arr, 99)),
            "steps_per_s": float(1.0 / arr.mean()),
            "n": len(arr),
        }


class RaysPerSecond:
    """Throughput meter: accumulate (n_rays, seconds) pairs."""

    def __init__(self):
        self.rays = 0
        self.seconds = 0.0

    def add(self, n_rays: int, seconds: float) -> None:
        self.rays += n_rays
        self.seconds += seconds

    @property
    def value(self) -> float:
        return self.rays / self.seconds if self.seconds > 0 else 0.0
