"""Fused single-token decode attention over the int8 KV cache (Pallas).

**Status: measured NEGATIVE result — NOT wired into the decode path.**
At the bench point (B=512, 24L/16H/1024d, cap 265) the production XLA
attention side of a decode step is ~11.6 ms against a ~6.7 ms HBM floor
(scripts/decode_ablate.py).  The hypothesis behind this kernel was that
the gap is VPU lane waste (hd = 64 on the 128-wide lane axis) plus
inter-fusion HBM traffic, fixable by a full-lane VMEM-resident pass.
Measured on the v5e chip the kernel is ~9x SLOWER (gpt_decode 27.5 s vs
2.52 s e2e; ~17 us per (bt=32, h) grid step for a 1.5 MB block = 11% of
HBM bandwidth): the elementwise int8->f32 dequant-matvec is VPU-throughput
bound at roughly 3 VPU ops per cache element, and the VPU cannot sustain
the cache stream rate — XLA's batched-matvec lowering feeds the dequant
through a better path and is the right engine at this shape.  Kept with
its parity test as the documented dead end (same standard as the
flash-attention training kernel, BENCH_NOTES.md).

The kernel owns the whole per-layer decode-attention body in one VMEM
pass over the cache:

    scores = (q . k_int8) * k_scale * rsqrt(hd)   [masked to t <= pos]
    p      = softmax(scores)
    o      = (p * v_scale) . v_int8

with the cache stored **depth-major, head-outer** — (L, H, B, hd, T) — so
T rides the 128-wide lane axis and both heavy ops (dequant-matvec over hd,
weighted sum over T) are full-lane VPU work; the absmax scales fold in per
the distributive identity (sum_d q_d*(k_d*s) = s*sum_d q_d*k_d), one
multiply per (b, h, t) instead of per element.  H outside B makes each
grid step's (bt, hd, T) block one contiguous HBM extent (Mosaic also
requires the block's trailing two dims be full or tile-aligned, which a
squeezed head axis in position -2 would violate).

The layer index and the decode position arrive as scalar-prefetch
arguments so the kernel reads layer ``l``'s blocks straight out of the
full stacked cache — no (B, H, hd, T) slice is ever materialised.

Reference behaviour being accelerated: the sampling loop at
/root/reference/transformer/minGPT.py:331-358 (which re-runs a full
forward per token); the cached single-token step is this rebuild's design
(models/gpt.py::gpt_decode_step).
"""

from __future__ import annotations

import functools

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


def _kernel(s_ref, q_ref, k_ref, v_ref, ks_ref, vs_ref, o_ref, *, scale):
    pos = s_ref[1]
    q = q_ref[...].astype(jnp.float32)                    # (bt, hd)
    k = k_ref[...].astype(jnp.float32)                    # (bt, hd, T)
    scores = jnp.sum(q[:, :, None] * k, axis=1)           # (bt, T)
    scores = scores * ks_ref[...].astype(jnp.float32) * scale
    t_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    scores = jnp.where(t_ids <= pos, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)            # (bt, T)
    pv = p * vs_ref[...].astype(jnp.float32)              # (bt, T)
    v = v_ref[...].astype(jnp.float32)                    # (bt, hd, T)
    o_ref[...] = jnp.sum(pv[:, None, :] * v, axis=2).astype(o_ref.dtype)


def _batch_tile(b: int, cap: int = 32) -> int:
    for bt in range(min(b, cap), 0, -1):
        if b % bt == 0:
            return bt
    return 1


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode_attend_int8(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       k_scale: jnp.ndarray, v_scale: jnp.ndarray,
                       layer: jnp.ndarray, pos: jnp.ndarray, *,
                       interpret: bool | None = None) -> jnp.ndarray:
    """One decode step's attention for one layer of the stacked cache.

    q:                (B, H, hd) float   — current token's queries
    k, v:             (L, H, B, hd, T) int8 — depth-major quantised cache
    k_scale, v_scale: (L, H, B, T) bf16/f32 — absmax scales per position
    layer, pos:       int32 scalars (traced)
    Returns o: (B, H, hd) float32.
    """
    b, h, hd = q.shape
    t = k.shape[4]
    bt = _batch_tile(b)
    grid = (b // bt, h)
    scalars = jnp.stack([jnp.asarray(layer, jnp.int32),
                         jnp.asarray(pos, jnp.int32)])
    qt = jnp.swapaxes(q, 0, 1)                   # (H, B, hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, bt, hd), lambda i, j, s: (j, i, 0)),
            pl.BlockSpec((None, None, bt, hd, t),
                         lambda i, j, s: (s[0], j, i, 0, 0)),
            pl.BlockSpec((None, None, bt, hd, t),
                         lambda i, j, s: (s[0], j, i, 0, 0)),
            pl.BlockSpec((None, None, bt, t),
                         lambda i, j, s: (s[0], j, i, 0)),
            pl.BlockSpec((None, None, bt, t),
                         lambda i, j, s: (s[0], j, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, bt, hd), lambda i, j, s: (j, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, scale=1.0 / float(np.sqrt(hd))),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, b, hd), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
        interpret=(not _on_tpu()) if interpret is None else interpret,
    )(scalars, qt, k, v, k_scale, v_scale)
    return jnp.swapaxes(out, 0, 1)


def decode_attend_int8_xla(q, k, v, k_scale, v_scale, layer, pos):
    """XLA reference path over the same depth-major head-outer cache
    (CPU tests, and the fallback when the kernel is disabled)."""
    t = k.shape[4]
    scale = 1.0 / float(np.sqrt(q.shape[-1]))
    k_l = jax.lax.dynamic_index_in_dim(k, layer, 0, keepdims=False)
    v_l = jax.lax.dynamic_index_in_dim(v, layer, 0, keepdims=False)
    ks = jax.lax.dynamic_index_in_dim(k_scale, layer, 0, keepdims=False)
    vs = jax.lax.dynamic_index_in_dim(v_scale, layer, 0, keepdims=False)
    scores = jnp.einsum("bhd,hbdt->bht", q.astype(jnp.float32),
                        k_l.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
    scores = scores * jnp.swapaxes(ks, 0, 1).astype(jnp.float32) * scale
    valid = (jnp.arange(t) <= pos)[None, None, :]
    scores = jnp.where(valid, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bht,hbdt->bhd",
                      probs * jnp.swapaxes(vs, 0, 1).astype(jnp.float32),
                      v_l.astype(jnp.float32),
                      preferred_element_type=jnp.float32)
