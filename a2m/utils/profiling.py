"""Tracing / profiling hooks.

The reference's observability is print statements and tqdm (SURVEY.md §5).
Here: jax.profiler traces + named annotations around hot regions, usable as
context managers or decorators, and a tiny wall-clock timer registry.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region visible in xprof/TensorBoard traces."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a full device trace to ``logdir`` (open with xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timers:
    """Cumulative host-side wall-clock timers."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {k: dict(total_s=self.totals[k], count=self.counts[k],
                        mean_ms=1e3 * self.totals[k] / max(self.counts[k], 1))
                for k in self.totals}
