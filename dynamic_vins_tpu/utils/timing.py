"""Per-stage timing instrumentation.

Capability parity with the reference's `TicToc` stopwatch + rolling
averages (`basic/def.h:70-94`, printouts at main.cpp:169,327 and
estimator.cpp:1854-1860), plus an optional hook into the JAX profiler.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)
        self.last: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            self.last[name] = dt

    def mean_ms(self, name: str) -> float:
        n = self.counts.get(name, 0)
        return 1000.0 * self.totals[name] / n if n else 0.0

    def summary(self) -> Dict[str, float]:
        return {k: round(self.mean_ms(k), 2) for k in self.totals}

    def report(self) -> str:
        parts = [f"{k}: {self.mean_ms(k):.1f} ms"
                 for k in sorted(self.totals)]
        return " | ".join(parts)


@contextlib.contextmanager
def jax_trace(path: str):
    """Wrap a block in a JAX profiler trace (view with TensorBoard)."""
    import jax

    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
