"""Profiling / tracing helpers (new capability; the reference has none —
SURVEY.md section 5 notes only an unused `time` import)."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def xla_trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard / xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock EMA step timer with throughput helpers."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self.avg = None
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.avg = dt if self.avg is None else self.ema * self.avg + (1 - self.ema) * dt

    def rate(self, items_per_step: float) -> float:
        return items_per_step / self.avg if self.avg else 0.0


def block_and_time(fn, *args, iters: int = 10, warmup: int = 2, **kwargs):
    """Median wall time of `fn(*args)` with device sync (for bench.py)."""
    times = []
    for i in range(warmup + iters):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        if i >= warmup:
            times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out
