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

    Values travel as float32 (on BOTH the single- and multi-process path,
    so statistics cannot flip with process count), which bounds the exact
    row count at 2**24 — far above any real posterior corpus, and asserted
    rather than silently truncated.
    """
    transport = _transport
    if transport is None:
        if jax.process_count() == 1:
            return np.asarray(arr, np.float32)
        transport = _default_transport
    arr = np.asarray(arr, np.float32)
    n, d = arr.shape
    counts = np.asarray(
        transport(np.asarray([float(n)], np.float64))).reshape(-1)
    counts = np.rint(counts).astype(np.int64)
    if counts.max() >= 2 ** 24:
        # checked AFTER the counts collective (every rank reaches it and
        # raises together): a pre-collective raise on one oversized rank
        # would leave the others hanging in the allgather
        raise ValueError(f"a shard of {int(counts.max())} rows exceeds the "
                         "exact-f32 count range of the gather transport")
    max_n = int(counts.max())
    if max_n == 0:          # every process is empty this round
        return arr
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


def cross_process_sharded(tree) -> bool:
    """True when any leaf is partitioned (not merely replicated) across
    processes.  Deterministic across ranks — every rank sees the same
    global arrays — so callers can raise on it BEFORE entering a
    collective without stranding other ranks inside it."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
            spec = getattr(leaf.sharding, "spec", None)
            if spec is not None and any(p is not None for p in spec):
                return True
    return False


def pool_posteriors(mus, logvars, nz: int):
    """Pool per-batch posterior-param lists into full-corpus (mu, logvar).

    Shared by the GPT-VAE and LSTM-VAE MI/AU paths so the collective-
    participation contract lives in ONE place: an empty local shard still
    contributes a (0, nz) array to the cross-process gather (a skipping
    rank would deadlock the others), and single-process pooling stays on
    device (no host round-trip through the slow tunnel).

    Returns ``(mu, logvar)`` over the global corpus, or ``None`` when it
    holds fewer than 2 rows (MI is meaningless and the AU variance
    denominator ``N - 1`` vanishes).
    """
    import jax.numpy as jnp
    if mus:
        mu = jnp.concatenate([jnp.asarray(m) for m in mus], axis=0)
        logvar = jnp.concatenate([jnp.asarray(v) for v in logvars], axis=0)
    else:
        mu = logvar = jnp.zeros((0, int(nz)), jnp.float32)
    gather = concat_gather_fn()
    if gather is not None:
        mu = jnp.asarray(gather(np.asarray(mu)))
        logvar = jnp.asarray(gather(np.asarray(logvar)))
    if mu.shape[0] < 2:
        return None
    return mu, logvar


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
