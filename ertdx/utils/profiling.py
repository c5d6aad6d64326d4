"""Profiling / timing hooks.

steps/sec/chip is the baseline metric (BASELINE.json); the reference has
only wall-clock ETA prints around PFLOTRAN runs (SURVEY.md §5.1).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


class StepTimer:
    """Wall-clock step timer with warmup exclusion and EMA rate."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.count = 0
        self.total = 0.0
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self.count += 1
        if self.count > self.warmup:
            self.total += dt

    @property
    def steps_per_sec(self) -> float:
        n = self.count - self.warmup
        return n / self.total if n > 0 and self.total > 0 else float("nan")


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (no-op if logdir is None)."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def block_until_ready(tree):
    return jax.block_until_ready(tree)
