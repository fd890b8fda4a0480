"""Profiling / tracing hooks (a subsystem the reference lacks; SURVEY §5).

``trace(dir)`` wraps a region in a ``jax.profiler`` trace (viewable in
TensorBoard / Perfetto); ``Throughput`` tracks steps/sec counters — the
framework's north-star metrics.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """Steps/sec counter with exponential smoothing."""

    def __init__(self, smoothing: float = 0.9):
        self.smoothing = smoothing
        self._last_t: Optional[float] = None
        self._last_n = 0
        self.rate = 0.0

    def update(self, n_steps: int) -> float:
        now = time.perf_counter()
        if self._last_t is not None:
            dt = now - self._last_t
            inst = (n_steps - self._last_n) / max(dt, 1e-9)
            self.rate = (
                inst if self.rate == 0.0
                else self.smoothing * self.rate + (1 - self.smoothing) * inst
            )
        self._last_t, self._last_n = now, n_steps
        return self.rate

    def metrics(self, prefix: str = "") -> Dict[str, float]:
        return {f"{prefix}steps_per_sec": self.rate}
