"""Profiling / tracing hooks (SURVEY.md §5.1 — absent in the reference).

  * :class:`StepTimer` — per-step wall-clock + throughput with running
    percentiles, designed for async dispatch (synchronises via a tiny
    device->host fetch on demand, not per step).
  * :func:`trace` — context manager around ``jax.profiler`` emitting a
    TensorBoard-compatible trace directory.
  * :func:`annotate` — named trace region for host-side phases.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import numpy as np


class StepTimer:
    def __init__(self, batch_size: int, window: int = 200):
        self.batch_size = batch_size
        self.window = window
        self.times: List[float] = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self.times.append(now - self._last)
            if len(self.times) > self.window:
                self.times.pop(0)
        self._last = now

    def stats(self) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "step_ms_p50": float(np.median(t)) * 1e3,
            "step_ms_p90": float(np.percentile(t, 90)) * 1e3,
            "crops_per_sec": self.batch_size / float(np.median(t)),
        }


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str):
    import jax

    with jax.profiler.TraceAnnotation(name):
        yield
