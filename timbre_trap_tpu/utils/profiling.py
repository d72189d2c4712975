"""Profiling / tracing helpers (SURVEY.md §5.1 — the reference has none).

Thin wrappers over ``jax.profiler`` producing Perfetto/TensorBoard traces,
plus a simple wall-clock timer for per-section telemetry.
"""

import contextlib
import time

import jax

__all__ = ["trace", "annotate", "Timer"]


@contextlib.contextmanager
def trace(log_dir, create_perfetto_link=False):
    """Capture a device trace into ``log_dir`` (view in TensorBoard/Perfetto)."""
    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name):
    """Named region that shows up on the device timeline."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Accumulating wall-clock timer: ``with timer('fwd'): ...``."""

    def __init__(self):
        self.totals = {}
        self.counts = {}

    @contextlib.contextmanager
    def __call__(self, name):
        start = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - start
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self):
        return {name: {"total_s": round(self.totals[name], 4),
                       "count": self.counts[name],
                       "mean_ms": round(1e3 * self.totals[name]
                                        / self.counts[name], 3)}
                for name in self.totals}
