"""Tracing / profiling helpers (SURVEY.md §5).

The reference has no tracing beyond ``@debug`` logging; the TPU build ships
named-scope annotation, a step timer, and a thin ``jax.profiler`` wrapper so
hot kernels show up labelled in XProf."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Iterator

import jax

__all__ = ["named_scope", "StepTimer", "trace", "time_fn"]

named_scope = jax.named_scope  # re-export: label regions for XProf


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with device synchronisation.

    >>> timer = StepTimer()
    >>> for batch in range(3):      # ... each training step:
    ...     _ = timer.tick(out=None)   # pass the step output to sync on it
    >>> sorted(timer.summary())
    ['mean_ms', 'min_ms', 'n', 'p50_ms', 'steps_per_sec']
    """

    def __init__(self):
        self._t0 = None
        self.times: list[float] = []

    def tick(self, out=None) -> float:
        if out is not None:
            jax.block_until_ready(out)
        now = time.perf_counter()
        dt = 0.0 if self._t0 is None else now - self._t0
        if self._t0 is not None:
            self.times.append(dt)
        self._t0 = now
        return dt

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        mean = sum(ts) / len(ts)
        return {
            "mean_ms": mean * 1e3,
            "p50_ms": ts[len(ts) // 2] * 1e3,
            "min_ms": ts[0] * 1e3,
            "steps_per_sec": 1.0 / mean,
            "n": len(ts),
        }


def time_fn(fn: Callable, *args, warmup: int = 3, iters: int = 10) -> float:
    """Mean wall seconds per call of a (jitted) function, synchronised."""
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
