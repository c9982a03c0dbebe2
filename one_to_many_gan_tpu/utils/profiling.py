"""Profiling/observability helpers (SURVEY.md §5: the reference has none;
this is the rebuild's tracing subsystem)."""

from __future__ import annotations

import contextlib
import time
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: Path | str):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling wall-clock step timing with warmup exclusion."""

    def __init__(self, warmup: int = 3):
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

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def p50(self) -> float:
        if not self.times:
            return float("nan")
        s = sorted(self.times)
        return s[len(s) // 2]
