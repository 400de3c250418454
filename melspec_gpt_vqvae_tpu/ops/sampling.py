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


def sample_logits(key: jax.Array, logits: jnp.ndarray, *,
                  temperature: float = 1.0, top_k: Optional[int] = None,
                  sample: bool = True) -> jnp.ndarray:
    """One sampling step over the final vocab axis.

    ``sample=False`` is deterministic argmax (the reference's
    ``torch.topk(probs, k=1)``); otherwise categorical after temperature
    scaling and optional top-k filtering (reference: minGPT.py:345-358).
    """
    logits = logits / temperature
    if top_k is not None:
        logits = top_k_logits(logits, top_k)
    if sample:
        return jax.random.categorical(key, logits, axis=-1)
    return jnp.argmax(logits, axis=-1)
