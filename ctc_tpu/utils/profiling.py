"""Profiling / tracing utilities (SURVEY.md §5.1 — the reference has only
AverageMeter wall-clock prints; here: real device traces + step timing).

* :func:`trace` — context manager around ``jax.profiler`` trace collection
  (view with TensorBoard / xprof).
* :class:`StepTimer` — batch/data time meters like the reference's
  ``batch_time``/``data_time`` (train.py:342-343) with throughput summary.
* :func:`annotate` — named trace region (``jax.profiler.TraceAnnotation``).
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Collect a device trace into ``logdir`` for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Tracks data-wait and step wall-clock; prints like the reference meters."""

    def __init__(self):
        self.data_time = 0.0
        self.step_time = 0.0
        self.steps = 0
        self._last = time.time()

    def data_ready(self):
        now = time.time()
        self.data_time += now - self._last
        self._last = now

    def step_done(self):
        now = time.time()
        self.step_time += now - self._last
        self._last = now
        self.steps += 1

    def summary(self) -> dict:
        n = max(self.steps, 1)
        return {
            "steps": self.steps,
            "data_s_per_step": self.data_time / n,
            "step_s_per_step": self.step_time / n,
        }
