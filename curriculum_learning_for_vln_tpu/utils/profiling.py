"""Tracing and step-timing utilities.

The reference has no profiling beyond wall-clock epoch timing (SURVEY §5).
Here: `jax.profiler` trace capture around any code region, named step
timers with device synchronization, and a phase-timer registry whose
summaries feed the scalar writer — first-class per-phase metrics.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Named wall-clock timers with optional device sync on stop."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self._starts: Dict[str, float] = {}

    @contextlib.contextmanager
    def time(self, name: str, sync: Optional[object] = None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def start(self, name: str) -> None:
        self._starts[name] = time.perf_counter()

    def stop(self, name: str, sync: Optional[object] = None) -> float:
        if sync is not None:
            jax.block_until_ready(sync)
        dt = time.perf_counter() - self._starts.pop(name)
        self.totals[name] += dt
        self.counts[name] += 1
        return dt

    def summary(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.totals[name],
                "count": self.counts[name],
                "mean_ms": 1000.0 * self.totals[name] / max(self.counts[name], 1),
            }
            for name in self.totals
        }

    def write_scalars(self, writer, step: int, prefix: str = "perf") -> None:
        for name, s in self.summary().items():
            writer.add_scalar(f"{prefix}/{name}_mean_ms", s["mean_ms"], step)

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()
        self._starts.clear()
