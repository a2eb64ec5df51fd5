"""Training observability: running averages, step timing, jax profiler hooks.

Parity: `RunningAverage` (`clip4cir/utils.py:70-91`) and the reference's
print/tqdm-postfix logging; extended with per-step wall timing and optional
`jax.profiler` traces (the reference has no tracing at all, SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import json
import sys
import time
from typing import Optional


class RunningAverage:
    """Streaming scalar mean (ref clip4cir/utils.py:70-91)."""

    def __init__(self):
        self.total = 0.0
        self.steps = 0

    def update(self, value: float):
        self.total += float(value)
        self.steps += 1

    def __call__(self) -> float:
        return self.total / max(self.steps, 1)


class MetricLogger:
    """Line-oriented metric printer with step timing; emits one JSON object
    per log call so downstream tooling can parse training curves."""

    def __init__(self, stream=None, prefix: str = ""):
        self.stream = stream or sys.stdout
        self.prefix = prefix
        self._last = time.monotonic()

    def log(self, step: int, **metrics):
        now = time.monotonic()
        payload = {"step": step, "dt_s": round(now - self._last, 4), **metrics}
        if self.prefix:
            payload["tag"] = self.prefix
        self.stream.write(json.dumps(payload) + "\n")
        self.stream.flush()
        self._last = now


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Wrap a region in a jax profiler trace when `logdir` is set."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling images/sec + step-time statistics for throughput benches."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t0 = None
        self._count = 0

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, items: int = 1) -> float:
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append((dt, items))
        return dt

    @property
    def mean_step_s(self) -> float:
        if not self.times:
            return float("nan")
        return sum(t for t, _ in self.times) / len(self.times)

    @property
    def items_per_s(self) -> float:
        if not self.times:
            return float("nan")
        total_items = sum(n for _, n in self.times)
        total_time = sum(t for t, _ in self.times)
        return total_items / total_time
