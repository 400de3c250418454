"""Profiling / tracing helpers.

The reference has no profiling at all (SURVEY.md §5).  TPU-native
observability: ``jax.profiler`` traces viewable in TensorBoard's profile
plugin, plus a simple step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(logdir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into ``logdir`` (no-op when None)."""
    if not logdir:
        yield
        return
    import jax
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling steps/sec + examples/sec."""

    def __init__(self, window: int = 50):
        self.window = window
        self.t0 = time.time()
        self.steps = 0
        self.examples = 0

    def tick(self, batch_size: int) -> Optional[dict]:
        self.steps += 1
        self.examples += batch_size
        if self.steps % self.window:
            return None
        dt = time.time() - self.t0
        out = {"perf/steps_per_sec": self.steps / dt,
               "perf/examples_per_sec": self.examples / dt}
        self.t0 = time.time()
        self.steps = 0
        self.examples = 0
        return out
