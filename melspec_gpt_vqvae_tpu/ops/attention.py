"""Multi-head self-attention for short fixed-length sequences.

The reference materialises the full (B, H, T, T) attention matrix with
masked_fill + softmax in torch (/root/reference/transformer/minGPT.py:72-90).
Here there are two TPU-native paths:

  * ``attend_pallas`` — a fused Pallas kernel for the inference hot path
    (sampling prefill, encoder forward): per (batch, head) program, Q/K/V
    tiles live in VMEM, the scores matmul runs on the MXU, and mask + softmax
    + the PV matmul are fused so the (T, T) matrix never leaves VMEM.
    Sequences here are 265-266 tokens, so one program holds the whole
    sequence — no online-softmax pass is needed.

  * ``attend_xla`` — the differentiable path used for training (XLA fuses
    the mask/softmax chain and autodiffs it; attention dropout lives here)
    and for ``return_attn`` logging parity.

The mask semantics replicate minGPT's ``n_unmasked`` window
(minGPT.py:64-69): causal everywhere, except the leading
``n_unmasked x n_unmasked`` block which is fully visible (the GPT-VAE
encoder sets ``n_unmasked = block_size`` to run bidirectionally).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def window_mask(t: int, n_unmasked: int = 0) -> np.ndarray:
    """(T, T) bool mask: True = attend (reference: minGPT.py:64-69)."""
    m = np.tril(np.ones((t, t), dtype=bool))
    if n_unmasked > 0:
        nu = min(n_unmasked, t)
        m[:nu, :nu] = True
    return m


def bernoulli_u8(rng: jax.Array, keep_prob: float, shape):
    """Bernoulli(keep_prob) keep-mask from the narrowest exact-enough draw.

    ``jax.random.bernoulli`` draws 32 random bits per element; at the VAS
    training geometry the attention mask alone is u32[24,16,265,265] =
    108 MB of generator writes per layer replay, and the TPU backward
    attention fusion wants it in a transposed layout, so XLA materialises
    a second 108 MB copy (the two ~12 ms/step 'data formatting' ops in
    TRAIN_PROFILE.json).  ``rng_bit_generator`` emits narrow uints
    natively, so:

    * keep_prob a multiple of 1/256 (the reference GPT presets use 0.5,
      config_GPT_vas.py): one byte per element is EXACT
      (P(bits < t) = t/256) — generator write and layout copy shrink 4x;
    * otherwise (e.g. the GPT-VAE presets' 0.3): uint16, P quantised to
      the nearest 1/65536 — within 8e-6 absolute of the requested rate
      (``jax.random.bernoulli`` itself quantises at the uniform's 2^-23
      mantissa granularity, so dropout rates were never IEEE-exact) —
      halving the traffic.

    Dropout masks are the only user; nothing downstream depends on the
    draw's bit pattern, only its statistics."""
    t = keep_prob * 256.0
    if 0 <= t < 256 and t == round(t):
        bits = jax.random.bits(rng, shape, jnp.uint8)
        return bits < jnp.uint8(int(round(t)))
    t16 = int(round(keep_prob * 65536.0))
    if not 0 <= t16 < 65536:
        return jax.random.bernoulli(rng, keep_prob, shape)
    bits = jax.random.bits(rng, shape, jnp.uint16)
    return bits < jnp.uint16(t16)


# ---------------------------------------------------------------------------
# XLA path (training / attention-map logging)
# ---------------------------------------------------------------------------


def attend_xla(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
               n_unmasked: int = 0, *,
               dropout_rate: float = 0.0,
               dropout_rng: Optional[jax.Array] = None,
               return_attn: bool = False):
    """q, k, v: (B, H, T, hd) -> (B, H, T, hd)[, attn (B, H, T, T)]."""
    t = q.shape[2]
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    mask = jnp.asarray(window_mask(t, n_unmasked))
    scores = jnp.where(mask, scores, NEG_INF)
    attn = jax.nn.softmax(scores, axis=-1)
    attn_used = attn
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = bernoulli_u8(dropout_rng, 1.0 - dropout_rate, attn.shape)
        attn_used = jnp.where(keep, attn / (1.0 - dropout_rate), 0.0)
    out = jnp.einsum("bhqk,bhkd->bhqd", attn_used.astype(v.dtype), v,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    if return_attn:
        return out, attn
    return out


# ---------------------------------------------------------------------------
# Pallas path (inference)
# ---------------------------------------------------------------------------


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, t_actual, n_unmasked):
    q = q_ref[0]                                      # (Tp, hd)
    k = k_ref[0]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale   # (Tp, Tp)

    tp = scores.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    mask = cols <= rows
    if n_unmasked > 0:
        mask = jnp.logical_or(
            mask, jnp.logical_and(rows < n_unmasked, cols < n_unmasked))
    mask = jnp.logical_and(mask, cols < t_actual)
    scores = jnp.where(mask, scores, NEG_INF)

    scores = scores - jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n_unmasked",))
def attend_pallas(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  n_unmasked: int = 0) -> jnp.ndarray:
    """Fused attention; q, k, v: (B, H, T, hd) -> (B, H, T, hd).

    T is padded to a multiple of 8 (sublane alignment — full-array blocks
    need no 128-multiple: 265 -> 272 instead of 384, saving ~2x of the
    (T, T) score/softmax work; same trade as ops/flash_attention.py); the
    pad columns are masked and pad rows sliced away on return.
    """
    b, h, t, hd = q.shape
    tp = ((t + 7) // 8) * 8
    if tp != t:
        pad = ((0, 0), (0, 0), (0, tp - t), (0, 0))
        q, k, v = (jnp.pad(a, pad) for a in (q, k, v))

    qf = q.reshape(b * h, tp, hd)
    kf = k.reshape(b * h, tp, hd)
    vf = v.reshape(b * h, tp, hd)
    scale = 1.0 / float(np.sqrt(hd))

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, t_actual=t,
                          n_unmasked=n_unmasked),
        grid=(b * h,),
        in_specs=[pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype),
        interpret=not _on_tpu(),  # lets CPU tests exercise the kernel
    )(qf, kf, vf)
    return out.reshape(b, h, tp, hd)[:, :, :t, :]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def attend(q, k, v, n_unmasked: int = 0, *, dropout_rate: float = 0.0,
           dropout_rng=None, return_attn: bool = False, use_pallas=None):
    """Dispatch: Pallas on TPU for the pure-inference case, XLA otherwise."""
    if use_pallas is None:
        use_pallas = (_on_tpu() and not return_attn and dropout_rate == 0.0)
    if use_pallas and not return_attn and dropout_rate == 0.0:
        return attend_pallas(q, k, v, n_unmasked)
    return attend_xla(q, k, v, n_unmasked, dropout_rate=dropout_rate,
                      dropout_rng=dropout_rng, return_attn=return_attn)
