"""Fused attention with a custom VJP: forward AND backward as Pallas
kernels, so the (B, H, T, T) attention probabilities never reach HBM in
either pass (the XLA training path materialises them, and remat replays
the whole computation).

Shape regime: T = 265-266, head_dim 64 — one program per (batch*head)
holds the entire sequence in VMEM, so no online-softmax tiling is needed;
the forward stores only (O, logsumexp) and the backward recomputes the
probabilities in-register from q, k and the saved logsumexp.

Dropout: the reference drops entries of the post-softmax matrix
(minGPT.py:84).  The mask is passed in as uint8 (generated cheaply with
the rbg PRNG outside) so forward and backward see the identical mask and
CPU interpret-mode stays testable.

Masking follows ops/attention.py::window_mask (causal + the ``n_unmasked``
bidirectional window).
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


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def _mask(tp, t_actual, n_unmasked):
    rows = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tp, tp), 1)
    m = cols <= rows
    if n_unmasked > 0:
        m = jnp.logical_or(m, jnp.logical_and(rows < n_unmasked,
                                              cols < n_unmasked))
    return jnp.logical_and(m, cols < t_actual)


def _fwd_kernel(q_ref, k_ref, v_ref, drop_ref, o_ref, lse_ref, *,
                scale, t_actual, n_unmasked, keep_prob):
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    tp = s.shape[0]
    s = jnp.where(_mask(tp, t_actual, n_unmasked), s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=1, keepdims=True)
    p = e / denom
    lse_ref[0, 0] = (m + jnp.log(denom))[:, 0]
    if keep_prob < 1.0:
        p = p * drop_ref[0].astype(jnp.float32) / keep_prob
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, drop_ref, lse_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *,
                scale, t_actual, n_unmasked, keep_prob):
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0, 0][:, None]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    tp = s.shape[0]
    s = jnp.where(_mask(tp, t_actual, n_unmasked), s, NEG_INF)
    p = jnp.exp(s - lse)                                   # softmax probs
    if keep_prob < 1.0:
        pd = p * drop_ref[0].astype(jnp.float32) / keep_prob
    else:
        pd = p
    # dV = pd^T dO
    dv_ref[0] = jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dv_ref.dtype)
    # dpd = dO V^T ; back through dropout scaling
    dpd = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    if keep_prob < 1.0:
        dp = dpd * drop_ref[0].astype(jnp.float32) / keep_prob
    else:
        dp = dpd
    # softmax backward: ds = p * (dp - rowsum(dp * p))
    d = jnp.sum(dp * p, axis=1, keepdims=True)
    ds = p * (dp - d)
    dq_ref[0] = (jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dq_ref.dtype)
    dk_ref[0] = (jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * scale).astype(dk_ref.dtype)


def _pad_to(x, tp):
    t = x.shape[2]
    if t == tp:
        return x
    return jnp.pad(x, ((0, 0), (0, 0), (0, tp - t), (0, 0)))


def _flash_fwd_impl(q, k, v, drop_mask, n_unmasked, keep_prob):
    b, h, t, hd = q.shape
    # pad to sublane multiples only: full-array blocks are tiling-legal and
    # 272 wastes far less T x T work than a 128-multiple (384) would
    tp = ((t + 7) // 8) * 8
    qf = _pad_to(q, tp).reshape(b * h, tp, hd)
    kf = _pad_to(k, tp).reshape(b * h, tp, hd)
    vf = _pad_to(v, tp).reshape(b * h, tp, hd)
    if drop_mask is None:
        dm = jnp.ones((b * h, tp, tp), jnp.bfloat16)
    else:
        dm = jnp.pad(drop_mask, ((0, 0), (0, 0), (0, tp - t), (0, tp - t))
                     ).reshape(b * h, tp, tp)
    scale = 1.0 / float(np.sqrt(hd))

    o, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, t_actual=t,
                          n_unmasked=n_unmasked, keep_prob=keep_prob),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, tp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype),
                   jax.ShapeDtypeStruct((b * h, 1, tp), jnp.float32)),
        interpret=not _on_tpu(),
    )(qf, kf, vf, dm)
    return (o.reshape(b, h, tp, hd)[:, :, :t, :],
            lse.reshape(b, h, tp)[:, :, :t])  # lse comes back (b*h,1,tp)


def _flash_bwd_impl(q, k, v, drop_mask, lse, do, n_unmasked, keep_prob):
    b, h, t, hd = q.shape
    tp = ((t + 7) // 8) * 8
    qf = _pad_to(q, tp).reshape(b * h, tp, hd)
    kf = _pad_to(k, tp).reshape(b * h, tp, hd)
    vf = _pad_to(v, tp).reshape(b * h, tp, hd)
    dof = _pad_to(do, tp).reshape(b * h, tp, hd)
    lsef = jnp.pad(lse, ((0, 0), (0, 0), (0, tp - t)),
                   constant_values=0.0).reshape(b * h, 1, tp)
    if drop_mask is None:
        dm = jnp.ones((b * h, tp, tp), jnp.bfloat16)
    else:
        dm = jnp.pad(drop_mask, ((0, 0), (0, 0), (0, tp - t), (0, tp - t))
                     ).reshape(b * h, tp, tp)
    scale = 1.0 / float(np.sqrt(hd))

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, t_actual=t,
                          n_unmasked=n_unmasked, keep_prob=keep_prob),
        grid=(b * h,),
        in_specs=[
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, tp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tp, hd), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype),
                   jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype),
                   jax.ShapeDtypeStruct((b * h, tp, hd), q.dtype)),
        interpret=not _on_tpu(),
    )(qf, kf, vf, dm, lsef, dof)
    crop = lambda x: x.reshape(b, h, tp, hd)[:, :, :t, :]
    return crop(dq), crop(dk), crop(dv)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def flash_attention(q, k, v, drop_mask, n_unmasked: int = 0,
                    keep_prob: float = 1.0):
    """q, k, v: (B, H, T, hd); drop_mask: (B, H, T, T) bfloat16 {0,1} or None.
    Returns (B, H, T, hd)."""
    o, _ = _flash_fwd_impl(q, k, v, drop_mask, n_unmasked, keep_prob)
    return o


def _fwd(q, k, v, drop_mask, n_unmasked, keep_prob):
    o, lse = _flash_fwd_impl(q, k, v, drop_mask, n_unmasked, keep_prob)
    return o, (q, k, v, drop_mask, lse)


def _bwd(n_unmasked, keep_prob, res, do):
    q, k, v, drop_mask, lse = res
    dq, dk, dv = _flash_bwd_impl(q, k, v, drop_mask, lse, do,
                                 n_unmasked, keep_prob)
    return dq, dk, dv, None


flash_attention.defvjp(_fwd, _bwd)


def make_dropout_mask(rng: Optional[jax.Array], shape, rate: float):
    """bfloat16 keep-mask (1 = keep; Mosaic cannot cast uint8 in-kernel)."""
    if rng is None or rate <= 0.0:
        return None
    return jax.random.bernoulli(rng, 1.0 - rate, shape).astype(jnp.bfloat16)
