"""Tracing / profiling hooks.

The reference has no built-in profiling (SURVEY.md §5.1, tqdm timers only).
TPU-native equivalents:
  * `trace(logdir)` — jax.profiler device trace (view in TensorBoard/Perfetto),
  * `annotate(name)` — TraceAnnotation visible in device traces,
  * `StageTimer` — host wall-clock per stage with a printable report, the
    moral equivalent of the reference's tqdm chunk/step timing.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def trace(logdir: str):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def report(self) -> str:
        lines = ["stage                          total_s   calls   mean_ms"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, c = self.totals[name], self.counts[name]
            lines.append(f"{name:<30} {t:8.3f} {c:7d} {1e3 * t / c:9.2f}")
        return "\n".join(lines)
