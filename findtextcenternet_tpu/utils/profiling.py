"""Profiling & tracing helpers (the reference has none — SURVEY.md §5).

* :func:`trace` — context manager around ``jax.profiler`` producing
  Perfetto/XPlane traces viewable in TensorBoard or ui.perfetto.dev.
* :class:`StepTimer` — wall-clock step timing with device sync, robust to
  async remote dispatch (syncs through a scalar readback).
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import numpy as np


@contextlib.contextmanager
def trace(logdir: str = "/tmp/jax-trace"):
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def sync(tree) -> None:
    """Force completion of queued device work by reading back one scalar.

    ``jax.block_until_ready`` does not wait for remote completion on
    tunneled platforms; a host readback does.
    """
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(jax.tree_util.tree_map(lambda x: x, leaves[0])).ravel()[:1]


class StepTimer:
    """Rolling step-time statistics for training loops."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self, sync_tree=None):
        if sync_tree is not None:
            sync(sync_tree)
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_ms(self) -> float:
        return 1000 * float(np.mean(self._times)) if self._times else 0.0

    @property
    def p50_ms(self) -> float:
        return 1000 * float(np.median(self._times)) if self._times else 0.0

    def summary(self):
        return {"step_time_ms": self.mean_ms, "step_time_p50_ms": self.p50_ms}
