"""Per-stage timing + profiler hooks.

The reference shipped no tracing (SURVEY.md §5 — only commented time.time()
deltas). Here: a StageTimer aggregates wall-time per named stage each epoch
and `trace` wraps a region in a jax.profiler trace (view with TensorBoard
or xprof)."""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator


class StageTimer:
    """Accumulates wall seconds per stage name."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> str:
        parts = []
        for name in sorted(self.totals):
            n = self.counts[name]
            tot = self.totals[name]
            parts.append(f"{name}: {tot:.2f}s/{n} "
                         f"({1000 * tot / max(n, 1):.1f}ms avg)")
        return " | ".join(parts)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace region; no-op when log_dir is falsy."""
    if not log_dir:
        yield
        return
    import jax

    with jax.profiler.trace(log_dir):
        yield
