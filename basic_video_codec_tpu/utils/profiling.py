"""Profiling & tracing hooks.

The reference's observability is wall-clock timers persisted into metrics.csv
and results.csv (SURVEY.md section 5; reference encoder.py:76,102,132,159-169)
— this framework keeps those AND adds device-level tracing:

* :func:`trace` — context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace of the device programs,
* :class:`Timer` — lightweight named wall-clock accumulator for host-side
  stage breakdowns (dispatch / fetch / entropy / write),
* :func:`annotate` — ``jax.profiler.TraceAnnotation`` wrapper so host stages
  show up on the trace timeline.
"""

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax.profiler device trace into ``log_dir``."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Label a host-side region on the profiler timeline."""
    return jax.profiler.TraceAnnotation(name)


class Timer:
    """Named wall-clock accumulator: ``with timer("entropy"): ...``."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:24s} {t:8.3f}s total  {t / n * 1000:8.2f} ms/call  x{n}")
        return "\n".join(lines)
