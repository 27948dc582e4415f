"""Profiling hooks: jax profiler traces + per-step wall timing.

The reference's only tracing is a wall-clock print around trainer.fit
(GAN_final.py:494-499). Here profiling is first-class (SURVEY.md §5): a
StepTimer aggregates step latencies/throughput, and `trace()` wraps a region
in a jax.profiler trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


class StepTimer:
    """Tracks step wall times; report() gives mean/p50/p95 excluding warmup."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @contextlib.contextmanager
    def step(self):
        self.start()
        yield
        self.stop()

    def report(self, items_per_step: float = 1.0) -> Dict[str, float]:
        ts = sorted(self.times[self.warmup :]) or sorted(self.times) or [0.0]
        n = len(ts)
        mean = sum(ts) / n
        return {
            "steps": n,
            "mean_s": mean,
            "p50_s": ts[n // 2],
            "p95_s": ts[min(n - 1, int(n * 0.95))],
            "items_per_s": items_per_step / mean if mean > 0 else 0.0,
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed region (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)
