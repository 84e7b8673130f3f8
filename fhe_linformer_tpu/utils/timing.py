"""Timing / metrics utilities.

Parity with src/Utils.h:21-59 (start_time/print_duration + the global
accumulator) and :105-125 (|log2| infinity-norm approximation error),
plus structured per-primitive counters the reference lacks (key-switch
count is a north-star metric — BASELINE.md)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import numpy as np


class Timers:
    """Named wall-clock accumulators + op counters."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def count(self, name: str, n: int = 1):
        self.counts[name] += n

    def report(self) -> dict:
        return {k: {"total_s": round(v, 4), "count": self.counts[k]}
                for k, v in sorted(self.totals.items())} | {
            k: {"count": v} for k, v in self.counts.items()
            if k not in self.totals}


GLOBAL_TIMERS = Timers()


def approx_error_log2(expected: np.ndarray, actual: np.ndarray) -> float:
    """-log2 of the infinity-norm error (Utils.h compute_approx_error
    parity) — higher is better precision.  NEGATIVE when the error
    exceeds 1: the old abs() reported a divergent output (err ~ 2^63,
    r128c at ring 2^16) as a spectacular '62.95 bits'."""
    err = np.max(np.abs(np.asarray(expected) - np.asarray(actual)))
    if err == 0:
        return float("inf")
    return float(-np.log2(err))
