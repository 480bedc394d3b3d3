"""Profiling / tracing helpers (SURVEY.md §5: the reference has only ad-hoc
clock() prints; this is the jax.profiler-based observability surface).
"""
from __future__ import annotations

import contextlib
import json
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, repeats: int = 5, warmup: int = 1, **kwargs):
    """Median wall time of a jitted function with block_until_ready.

    Returns (median_seconds, last_output).
    """
    out = None
    for _ in range(max(warmup, 1)):
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


class StageTimer:
    """Accumulates named stage timings; prints a one-line JSON report."""

    def __init__(self):
        self.stages: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync: Any = None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            jax.block_until_ready(sync)
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def report(self) -> str:
        return json.dumps({k: round(v, 4) for k, v in self.stages.items()})
