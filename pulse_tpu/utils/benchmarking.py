"""Profiling helpers (≙ phc/utils/benchmarking.py:9-71 timeit context
manager with running averages) plus a jax.profiler hook for device traces."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class Timer:
    """Accumulating named timer with running averages."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str, block: bool = False, result=None):
        t0 = time.perf_counter()
        yield
        if block and result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - t0
        self.totals[name] += dt
        self.counts[name] += 1

    def mean(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1)

    def report(self) -> str:
        lines = [
            f"{name}: total {self.totals[name]:.3f}s over {self.counts[name]} "
            f"calls (avg {self.mean(name)*1e3:.2f} ms)"
            for name in sorted(self.totals)
        ]
        return "\n".join(lines)


timeit = Timer()


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a TPU/XLA profile viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
