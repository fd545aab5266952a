"""Tracing / profiling utilities (SURVEY.md §5: the reference only has
manual AverageMeter timers; here: jax.profiler integration + step timers).

- `annotate(name)`: context manager adding a named region to device traces
  (jax.profiler.TraceAnnotation) and accumulating host wall time.
- `StepTimer`: batch/data-time meters like the reference train loops.
- `trace(logdir)`: capture a full device profile for TensorBoard/perfetto
  (enable per run with MOTIONBERT_PROFILE_DIR=/path).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict


class _Accumulator:
    def __init__(self):
        self.total = defaultdict(float)
        self.count = defaultdict(int)

    def add(self, name, dt):
        self.total[name] += dt
        self.count[name] += 1

    def summary(self):
        return {
            name: {"total_s": self.total[name], "count": self.count[name],
                   "mean_ms": 1000.0 * self.total[name] / self.count[name]}
            for name in self.total
        }


REGIONS = _Accumulator()


@contextlib.contextmanager
def annotate(name: str):
    """Named region: shows up in device traces and host accounting."""
    import jax.profiler

    t0 = time.perf_counter()
    with jax.profiler.TraceAnnotation(name):
        yield
    REGIONS.add(name, time.perf_counter() - t0)


@contextlib.contextmanager
def trace(logdir: str | None = None):
    """Capture a device profile (viewable in TensorBoard / perfetto)."""
    import jax.profiler

    logdir = logdir or os.environ.get("MOTIONBERT_PROFILE_DIR")
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """data_time / step_time meters (reference train_action.py:167-188)."""

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.steps = 0
        self._last = time.perf_counter()

    def data_ready(self):
        now = time.perf_counter()
        self.data_time += now - self._last
        self._last = now

    def step_done(self):
        now = time.perf_counter()
        self.step_time += now - self._last
        self._last = now
        self.steps += 1

    def summary(self):
        n = max(self.steps, 1)
        return {"steps": self.steps,
                "data_ms": 1000.0 * self.data_time / n,
                "step_ms": 1000.0 * self.step_time / n}
