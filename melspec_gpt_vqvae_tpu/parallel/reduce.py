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


def cross_process_concat(arr: np.ndarray) -> np.ndarray:
    """Concatenate per-process ``(N_p, D)`` arrays along axis 0, in
    process order.  Identity when single-process with no injected
    transport.

    Used to pool posterior parameters (mu/logvar) so corpus statistics
    (MI / active units) are computed over the FULL eval corpus under
    multi-process execution — the reference computes them over the whole
    val set on every rank (callbacks/GPT_VAE_callbacks.py:429-436 via
    ``pl_module.val_data``), so per-shard MI would silently deviate.

    Unequal ``N_p`` is handled: a (1,)-vector gather first exchanges row
    counts, locals are zero-padded to the max, and padding is sliced away
    after the main gather.  Only the (K,) -> (P, K) transport contract is
    used, so the test seam and ``process_allgather`` both work.
    """
    transport = _transport
    if transport is None:
        if jax.process_count() == 1:
            return np.asarray(arr)
        transport = _default_transport
    arr = np.asarray(arr, np.float32)
    n, d = arr.shape
    counts = np.asarray(
        transport(np.asarray([float(n)], np.float64))).reshape(-1)
    counts = counts.astype(np.int64)
    max_n = int(counts.max())
    if max_n != n:
        arr = np.pad(arr, ((0, max_n - n), (0, 0)))
    gathered = np.asarray(transport(arr.reshape(-1)))
    gathered = gathered.reshape(len(counts), max_n, d)
    return np.concatenate([g[:c] for g, c in zip(gathered, counts)], axis=0)


def concat_gather_fn() -> Optional[Callable[[np.ndarray], np.ndarray]]:
    """``cross_process_concat`` when it would do anything, else None — the
    single-process fast path keeps posterior tensors on device instead of
    round-tripping them through the host."""
    if _transport is not None or jax.process_count() > 1:
        return cross_process_concat
    return None


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
