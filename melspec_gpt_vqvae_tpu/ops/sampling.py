"""Token-sampling primitives (temperature / top-k / categorical / greedy).

Behavioural parity with the reference's ``top_k_logits`` + sampling branch
(/root/reference/transformer/minGPT.py:287-291, 345-358), as pure jittable
functions with explicit PRNG keys.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def top_k_logits(logits: jnp.ndarray, k: int) -> jnp.ndarray:
    """Mask all but the top-k logits to -inf (reference: minGPT.py:287-291).
    k is clamped to the vocab size (the reference's default k=100 exceeds
    small vocabularies)."""
    k = min(k, logits.shape[-1])
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, -jnp.inf, logits)


def top_p_logits(logits: jnp.ndarray, p: float) -> jnp.ndarray:
    """Nucleus filtering: keep the smallest set of tokens whose cumulative
    probability reaches ``p``; mask the rest to -inf.

    Beyond the reference (which only has top-k, minGPT.py:287-291) but a
    standard serving knob.  Jittable: sort descending, take the exclusive
    cumulative softmax, keep tokens whose preceding mass is < p (the
    most-probable token is always kept), threshold at the k-th sorted logit.
    """
    sorted_logits = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum_before = jnp.cumsum(probs, axis=-1) - probs
    k = jnp.sum(cum_before < p, axis=-1, keepdims=True)  # >= 1 always
    kth = jnp.take_along_axis(sorted_logits, k - 1, axis=-1)
    return jnp.where(logits < kth, -jnp.inf, logits)


def sample_logits(key: jax.Array, logits: jnp.ndarray, *,
                  temperature: float = 1.0, top_k: Optional[int] = None,
                  top_p: Optional[float] = None,
                  sample: bool = True) -> jnp.ndarray:
    """One sampling step over the final vocab axis.

    ``sample=False`` is deterministic argmax (the reference's
    ``torch.topk(probs, k=1)``); otherwise categorical after temperature
    scaling and optional top-k and/or nucleus top-p filtering (top-k is
    the reference's behaviour, minGPT.py:345-358; top-p applies after
    top-k when both are set, matching the usual serving convention).
    """
    logits = logits / temperature
    if top_k is not None:
        logits = top_k_logits(logits, top_k)
    if top_p is not None and top_p < 1.0:
        logits = top_p_logits(logits, top_p)
    if sample:
        return jax.random.categorical(key, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)


def filtered_log_probs(logits: jnp.ndarray, *, temperature: float = 1.0,
                       top_k: Optional[int] = None,
                       top_p: Optional[float] = None) -> jnp.ndarray:
    """Log-probabilities of the exact distribution ``sample_logits`` draws
    from (temperature + top-k + top-p filtering, then softmax).  Used by
    speculative decoding, where the accept/reject ratio must be computed
    on the same filtered distributions the samplers use."""
    logits = logits / temperature
    if top_k is not None:
        logits = top_k_logits(logits, top_k)
    if top_p is not None and top_p < 1.0:
        logits = top_p_logits(logits, top_p)
    return jax.nn.log_softmax(logits, axis=-1)
