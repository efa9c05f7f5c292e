"""Per-phase timers and scalar metric aggregation.

The reference only wall-clocks whole epochs (train_aline.py:54,154-155);
here timing is a first-class subsystem: named phase timers (sample / rollout
/ loss / step), running statistics, and optional jax profiler traces.
"""
from __future__ import annotations

import collections
import contextlib
import math
import time
from typing import Dict

import jax


class PhaseTimer:
    """Wall-clock accumulator keyed by phase name.

    Use ``block_until_ready`` on device outputs before exiting a phase when
    accurate device timing is needed (JAX dispatch is async).
    """

    def __init__(self):
        self._totals: Dict[str, float] = collections.defaultdict(float)
        self._counts: Dict[str, int] = collections.defaultdict(int)
        self._sq: Dict[str, float] = collections.defaultdict(float)

    @contextlib.contextmanager
    def phase(self, name: str, sync: bool = False):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync:
                # Flush outstanding device work for honest timing.
                jax.effects_barrier()
            dt = time.perf_counter() - t0
            self._totals[name] += dt
            self._sq[name] += dt * dt
            self._counts[name] += 1

    def mean(self, name: str) -> float:
        c = self._counts[name]
        return self._totals[name] / c if c else 0.0

    def std(self, name: str) -> float:
        c = self._counts[name]
        if c < 2:
            return 0.0
        m = self.mean(name)
        return math.sqrt(max(self._sq[name] / c - m * m, 0.0))

    def total(self, name: str) -> float:
        return self._totals[name]

    def count(self, name: str) -> int:
        return self._counts[name]

    def summary(self) -> str:
        lines = []
        for name in sorted(self._totals):
            lines.append(
                f"{name}: total {self._totals[name]:.2f}s, "
                f"mean {self.mean(name)*1e3:.2f}ms ± {self.std(name)*1e3:.2f}ms "
                f"over {self._counts[name]} calls")
        return "\n".join(lines)


class Metrics:
    """Simple scalar metric store with last-value and running-mean access."""

    def __init__(self):
        self._last: Dict[str, float] = {}
        self._sums: Dict[str, float] = collections.defaultdict(float)
        self._counts: Dict[str, int] = collections.defaultdict(int)

    def log(self, **kwargs: float) -> None:
        for k, v in kwargs.items():
            v = float(v)
            self._last[k] = v
            self._sums[k] += v
            self._counts[k] += 1

    def last(self, name: str) -> float:
        return self._last[name]

    def mean(self, name: str) -> float:
        c = self._counts[name]
        return self._sums[name] / c if c else 0.0


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Optional ``jax.profiler`` trace context (no-op when log_dir is None)."""
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
