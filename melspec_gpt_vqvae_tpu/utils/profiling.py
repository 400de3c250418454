"""Profiling / tracing helpers.

The reference has no profiling at all (SURVEY.md §5).  TPU-native
observability: ``jax.profiler`` traces viewable in TensorBoard's profile
plugin, plus a simple step timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional


def gpt_fwd_flops(n_params: int, b: int, t: int, n_layer: int,
                  d: int) -> float:
    """Forward FLOPs of one GPT pass: 2*P*tokens matmul flops + the two
    attention einsums (4*B*T^2*D per layer).  Useful train-step FLOPs =
    3x this (fwd + 2x bwd), excluding any remat replay."""
    return 2.0 * n_params * b * t + 4.0 * n_layer * b * t * t * d


def count_params(tree) -> int:
    import numpy as np
    import jax
    return sum(int(np.prod(x.shape))
               for x in jax.tree_util.tree_leaves(tree)
               if hasattr(x, "shape"))


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
    """Rolling steps/sec + examples/sec (+ tokens/s and MFU when the
    per-example token count and per-step useful FLOPs are known)."""

    V5E_PEAK_FLOPS = 197e12   # bf16, per chip

    def __init__(self, window: int = 50, tokens_per_example: int = 0,
                 flops_per_step: float = 0.0, n_devices: int = 0,
                 batch_scale: int = 1):
        self.window = window
        self.tokens_per_example = tokens_per_example
        self.flops_per_step = flops_per_step
        # tick() receives this process's LOCAL rows; batch_scale (=
        # process_count) converts examples/tokens-per-sec to global
        self.batch_scale = batch_scale
        # flops_per_step covers the GLOBAL batch, so MFU divides by the
        # peak of every device carrying it (all processes' chips), not one
        if not n_devices:
            import jax
            n_devices = jax.device_count()
        self.n_devices = n_devices
        self.t0 = time.time()
        self.steps = 0
        self.examples = 0

    def tick(self, batch_size: int) -> Optional[dict]:
        self.steps += 1
        self.examples += batch_size * self.batch_scale
        if self.steps % self.window:
            return None
        dt = time.time() - self.t0
        out = {"perf/steps_per_sec": self.steps / dt,
               "perf/examples_per_sec": self.examples / dt}
        if self.tokens_per_example:
            out["perf/tokens_per_sec"] = \
                self.examples * self.tokens_per_example / dt
        if self.flops_per_step:
            out["perf/mfu_pct"] = (100.0 * self.steps * self.flops_per_step
                                   / dt / (self.V5E_PEAK_FLOPS
                                           * self.n_devices))
        self.t0 = time.time()
        self.steps = 0
        self.examples = 0
        return out
