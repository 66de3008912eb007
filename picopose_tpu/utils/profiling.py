"""Profiling / timing harness.

The reference's only instrumentation is wall-clock brackets with CUDA syncs
(run_test.py:142-216, SURVEY.md §5).  TPU-native equivalents:

  * `timed(fn)` — block_until_ready-bracketed wall time;
  * `trace(dir)` — jax.profiler context writing a TensorBoard-loadable trace
    (xplane) for per-op HLO analysis;
  * `stage_timer` — named accumulator for per-stage breakdowns.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


def timed(fn, *args, warmup: int = 1, iters: int = 5, **kwargs):
    """Returns (mean_seconds, last_result) with device-sync timing."""
    result = None
    for _ in range(warmup):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    t0 = time.perf_counter()
    for _ in range(iters):
        result = fn(*args, **kwargs)
    jax.block_until_ready(result)
    return (time.perf_counter() - t0) / iters, result


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulate named wall-time segments (host-side, device-synced)."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync: bool = True):
        t0 = time.perf_counter()
        yield
        if sync:
            # sync anything pending so the section charge is honest
            jax.effects_barrier()
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        return " | ".join(
            f"{k}: {self.totals[k]:.3f}s/{self.counts[k]}"
            for k in sorted(self.totals)
        )
