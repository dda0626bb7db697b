"""Profiling / tracing utilities.

The reference's only instrumentation is wall-clock AverageMeters
(training.py:17-18,33,57) and the per-sample inference-time print
(evaluating.py:86-98). TPU-native equivalents:

  * `trace(logdir)` — context manager around `jax.profiler` producing a
    TensorBoard-viewable device trace (XLA op timeline, HBM usage);
  * `StepTimer` — wall-clock step timing that respects JAX async dispatch
    (block_until_ready on the watched value before stamping);
  * `annotate(name)` — TraceAnnotation for named regions in the trace.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace into `logdir` (view in TensorBoard)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region annotation inside an active trace."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Accurate per-step timing under async dispatch: call `stop(x)` with
    a value produced by the step; it blocks on it before stamping."""

    def __init__(self):
        self.times = []
        self._start: Optional[float] = None

    def start(self):
        self._start = time.perf_counter()

    def stop(self, value=None) -> float:
        if value is not None:
            jax.block_until_ready(value)
        dt = time.perf_counter() - (self._start or time.perf_counter())
        self.times.append(dt)
        return dt

    @property
    def mean(self) -> float:
        return sum(self.times) / max(len(self.times), 1)
