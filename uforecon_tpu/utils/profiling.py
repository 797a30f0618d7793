"""Profiling helpers: jax.profiler traces + phase timers.

The reference has no tracing (SURVEY.md §5); rays/sec/chip is this
framework's north-star metric, so the render loop is instrumented natively
(pipeline/extract.py reports rays/s) and deeper dives use these helpers.
"""
from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto.

    Note: unsupported on some remote/tunneled backends; falls back to a
    no-op with a warning rather than failing the run.
    """
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover - backend dependent
        print(f"[profiling] trace unavailable: {e}")
    try:
        yield
    finally:
        if started:
            jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates wall-clock per named phase; device-synced if arrays given.

    Usage:
        t = PhaseTimer()
        with t.phase("encode", sync=enc): ...
        print(t.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        yield
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            lines.append(f"{k:24s} {self.totals[k]:9.3f}s x{self.counts[k]}")
        return "\n".join(lines)
