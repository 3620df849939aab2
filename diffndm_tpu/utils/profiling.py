"""Structured tracing / profiling.

The reference has no structured profiling — wall-clock prints only
(test.py:151-176, lightning_modules.py:440-447).  Here:

- ``trace(outdir)`` captures a ``jax.profiler`` trace (TensorBoard /
  Perfetto format, includes XLA HLO + TPU hardware counters when run on
  device) around a block.  Enable globally for any CLI by setting
  ``DIFFNDM_TRACE_DIR=/path``.
- ``annotate(name)`` adds a named span visible in the trace timeline.
- ``StepTimer`` collects host-side per-step wall times with summary
  percentiles — the cheap always-on signal.
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Optional


@contextlib.contextmanager
def trace(outdir: Optional[str] = None):
    """Profile the enclosed block when outdir (or DIFFNDM_TRACE_DIR) is
    set; no-op otherwise."""
    outdir = outdir or os.environ.get("DIFFNDM_TRACE_DIR")
    if not outdir:
        yield
        return
    import jax

    jax.profiler.start_trace(outdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span for the profiler timeline (no-op overhead off-trace)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Host-side step timing with percentile summary."""

    def __init__(self):
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {
            "steps": n,
            "mean_s": sum(ts) / n,
            "p50_s": ts[n // 2],
            "p90_s": ts[min(n - 1, int(0.9 * n))],
            "min_s": ts[0],
            "max_s": ts[-1],
        }
