"""Cross-process metric reduction (DDP ``sync_dist`` parity).

The reference reduces logged metrics across ranks with Lightning's
``sync_dist=True`` (/root/reference/transformer/Lit_GPT_VAE.py:310-313,
356-359), so its ModelCheckpoint monitors a *global* validation loss.
Multi-host JAX has no implicit reduction of host-side scalars, so epoch
metric **sums** are summed across processes here before deriving
means/NLL/PPL and before the best-checkpoint decision.

Transport: ``jax.experimental.multihost_utils.process_allgather`` over the
global device set.  Tests inject a fake transport via ``set_transport`` to
simulate multiple processes in one host process (``jax.distributed`` cannot
be initialised twice in-process).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import numpy as np

# Test seam: a callable (local_vec (K,) -> gathered (P, K)).  None = real
# multihost allgather (identity when jax.process_count() == 1).
_transport: Optional[Callable[[np.ndarray], np.ndarray]] = None


def set_transport(fn: Optional[Callable[[np.ndarray], np.ndarray]]) -> None:
    global _transport
    _transport = fn


def _default_transport(vec: np.ndarray) -> np.ndarray:
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(vec))


def cross_process_sum(metrics: Dict[str, float]) -> Dict[str, float]:
    """Sum each scalar metric across all processes.

    Identity when running single-process (the common case on one host);
    keys must be identical on every process (they are: the epoch metric
    sums are produced by the same jitted aggregation everywhere).
    """
    transport = _transport
    if transport is None:
        if jax.process_count() == 1:
            return {k: float(v) for k, v in metrics.items()}
        transport = _default_transport
    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float64)
    gathered = np.asarray(transport(vec)).reshape(-1, len(keys))
    total = gathered.sum(axis=0)
    return {k: float(v) for k, v in zip(keys, total)}
