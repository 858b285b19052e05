"""Tracing / profiling hooks.

The reference's only tracing is wall-clock per-epoch prints
(modelMF.cpp:126-133, SURVEY.md §5). Here: ``jax.profiler`` trace
capture around training windows plus a throughput meter
(ratings/sec/chip — the BASELINE.md primary metric).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture an XLA profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """ratings/sec/chip counter over epochs."""

    def __init__(self, nnz: int, n_chips: Optional[int] = None):
        self.nnz = nnz
        self.n_chips = n_chips or jax.device_count()
        self.reset()

    def reset(self):
        self._epochs = 0
        self._seconds = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._seconds += time.perf_counter() - self._t0
        self._epochs += 1
        self._t0 = None

    @property
    def ratings_per_sec(self) -> float:
        if self._seconds == 0:
            return 0.0
        return self.nnz * self._epochs / self._seconds

    @property
    def ratings_per_sec_per_chip(self) -> float:
        return self.ratings_per_sec / max(self.n_chips, 1)

    def summary(self) -> str:
        return (f"{self._epochs} epochs, "
                f"{self.ratings_per_sec / 1e6:.2f}M ratings/s "
                f"({self.ratings_per_sec_per_chip / 1e6:.2f}M/chip)")
