"""Tracing / profiling hooks (SURVEY.md section 5: the reference has none;
this is a new capability).

- ``trace(logdir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable XLA trace (op-level timeline incl. TPU kernels).
- ``StepTimer``: lightweight per-step wall-clock stats with warmup skip,
  for throughput accounting without the profiler overhead.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: list[float] = []
        self._count = 0
        self._last = None

    def start(self):
        self._last = time.perf_counter()

    def stop(self):
        dt = time.perf_counter() - self._last
        self._count += 1
        if self._count > self.warmup:
            self._times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def stats(self) -> dict:
        if not self._times:
            return {"steps": 0}
        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps_per_sec": float(1.0 / t.mean()),
        }
