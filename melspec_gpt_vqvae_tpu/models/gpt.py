"""Core GPT: functional, scan-stacked, KV-cached.

Capability parity with the reference minGPT stack
(/root/reference/transformer/minGPT.py:30-212): learned token + position
embeddings, pre-LN blocks with exact-GELU 4x MLPs, a causal mask with an
``n_unmasked`` bidirectional window, an optional ``last_linear`` head-width
override, and a class-conditional variant that prepends one learned class
embedding (minGPT.py:203-212).

TPU-first design (not a translation):
  * parameters are a pytree with a leading layer axis; the block stack is a
    single ``lax.scan`` (one compiled block body instead of n_layer unrolled
    copies — faster compiles, identical math);
  * attention dispatches to a fused Pallas kernel at inference and the
    differentiable XLA path in training (ops/attention.py);
  * autoregressive decode keeps a preallocated KV cache and generates with a
    ``lax.scan`` over steps — the reference re-runs the full forward per
    sampled token with no cache (minGPT.py:331-358), which is the #1
    throughput gap this rebuild closes;
  * dropout is explicit-PRNG (one fold per layer), so training steps are
    reproducible pure functions.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from ..configs import GPTConfig
from ..ops.attention import attend, bernoulli_u8
from ..ops.sampling import sample_logits

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def init_gpt_params(key: jax.Array, cfg: GPTConfig) -> Params:
    """Initialise parameters.

    Matches the reference init (minGPT.py:159-166): Linear/Embedding weights
    ~ N(0, 0.02), biases zero, LayerNorm (1, 0); the position embedding is
    zero-initialised (minGPT.py:136 creates it with ``torch.zeros`` and
    ``_init_weights`` never touches it).
    """
    d, l4 = cfg.n_embd, 4 * cfg.n_embd
    L = cfg.n_layer
    keys = jax.random.split(key, 8)

    def norm(k, shape):
        return (0.02 * jax.random.normal(k, shape)).astype(cfg.dtype)

    params: Params = {
        "tok_emb": norm(keys[0], (cfg.vocab_size, d)),
        "pos_emb": jnp.zeros((cfg.block_size, d), cfg.dtype),
        "blocks": {
            "ln1_s": jnp.ones((L, d), cfg.dtype),
            "ln1_b": jnp.zeros((L, d), cfg.dtype),
            "attn_qkv": {"w": norm(keys[1], (L, d, 3 * d)),
                         "b": jnp.zeros((L, 3 * d), cfg.dtype)},
            "attn_proj": {"w": norm(keys[2], (L, d, d)),
                          "b": jnp.zeros((L, d), cfg.dtype)},
            "ln2_s": jnp.ones((L, d), cfg.dtype),
            "ln2_b": jnp.zeros((L, d), cfg.dtype),
            "mlp_up": {"w": norm(keys[3], (L, d, l4)),
                       "b": jnp.zeros((L, l4), cfg.dtype)},
            "mlp_down": {"w": norm(keys[4], (L, l4, d)),
                         "b": jnp.zeros((L, d), cfg.dtype)},
        },
        "ln_f_s": jnp.ones((d,), cfg.dtype),
        "ln_f_b": jnp.zeros((d,), cfg.dtype),
        "head": {"w": norm(keys[5], (d, cfg.output_size))},  # bias-free head
    }
    if cfg.class_size is not None:
        params["class_emb"] = norm(keys[6], (cfg.class_size, d))
    return params


def count_params(params: Params) -> int:
    from ..utils.profiling import count_params as _cp   # one definition
    return _cp(params)


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------


def _layer_norm(x, scale, bias, eps: float = 1e-5):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _raw_key_zeros(prefix):
    """Placeholder raw-key array matching the active PRNG impl's key width
    (threefry: 2 words; rbg: 4) — shapes must agree even when unused."""
    w = jax.random.split(jax.random.PRNGKey(0), 1).shape[-1]
    return jnp.zeros(prefix + (w,), jnp.uint32)


def _dropout(x, rate: float, rng: Optional[jax.Array], train: bool):
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = bernoulli_u8(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _split_heads(x, n_head):
    b, t, d = x.shape
    return x.reshape(b, t, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, t, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * hd)


def _mm(a, w, mixed: bool):
    """Matmul over the last/first axes; under mixed precision the operands
    go to the MXU as bf16 with f32 accumulation (the residual stream and
    all reductions stay f32)."""
    if not mixed:
        return a @ w
    return jax.lax.dot_general(
        a.astype(jnp.bfloat16), w.astype(jnp.bfloat16),
        (((a.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _block(x, p, cfg: GPTConfig, *, train: bool, rngs, return_attn: bool,
           use_pallas):
    """One pre-LN transformer block (reference: minGPT.py:93-119)."""
    mixed = cfg.mixed_precision
    h = _layer_norm(x, p["ln1_s"], p["ln1_b"])
    qkv = _mm(h, p["attn_qkv"]["w"], mixed) + p["attn_qkv"]["b"]
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (_split_heads(a, cfg.n_head) for a in (q, k, v))
    att = None
    if cfg.use_flash_train and not return_attn:
        from ..ops.flash_attention import (flash_attention,
                                           make_dropout_mask)
        rate = cfg.attn_pdrop if train else 0.0
        mask = make_dropout_mask(
            rngs[0] if train else None,
            (q.shape[0], q.shape[1], q.shape[2], q.shape[2]), rate)
        res = flash_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                              v.astype(jnp.float32), mask, cfg.n_unmasked,
                              1.0 - rate).astype(x.dtype)
    else:
        res = attend(q, k, v, cfg.n_unmasked,
                     dropout_rate=cfg.attn_pdrop if train else 0.0,
                     dropout_rng=rngs[0] if train else None,
                     return_attn=return_attn, use_pallas=use_pallas)
        if return_attn:
            res, att = res
    # named for remat_policy="attn": saving the attention output lets the
    # MLP/projection backward reuse it instead of replaying the whole
    # attention forward (B,H,T,T materialisation) a second time
    res = checkpoint_name(res, "attn_out")
    y = _mm(_merge_heads(res), p["attn_proj"]["w"], mixed) \
        + p["attn_proj"]["b"]
    y = _dropout(y, cfg.resid_pdrop, rngs[1] if train else None, train)
    x = x + y

    h2 = _layer_norm(x, p["ln2_s"], p["ln2_b"])
    m = jax.nn.gelu(_mm(h2, p["mlp_up"]["w"], mixed) + p["mlp_up"]["b"],
                    approximate=False)  # torch nn.GELU is exact erf
    m = _mm(m, p["mlp_down"]["w"], mixed) + p["mlp_down"]["b"]
    m = _dropout(m, cfg.resid_pdrop, rngs[2] if train else None, train)
    return x + m, att


def class_embed(params: Params, class_idx: jnp.ndarray) -> jnp.ndarray:
    """(B,) or (B, 1) class index -> (B, 1, D) conditioning embedding
    (reference GPTClass: minGPT.py:203-212)."""
    if class_idx.ndim == 1:
        class_idx = class_idx[:, None]
    return jnp.take(params["class_emb"], class_idx[:, 0], axis=0)[:, None, :]


def embed_tokens(params: Params, cfg: GPTConfig, idx: Optional[jnp.ndarray],
                 cond_emb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Token + class embeddings and position add — the input half of
    ``gpt_apply`` (reference: minGPT.py:168-199), shared with the
    pipeline-parallel forward (parallel/pipeline.py)."""
    parts = []
    if cond_emb is not None:
        parts.append(cond_emb.astype(cfg.dtype))
    if idx is not None and idx.shape[1] > 0:
        parts.append(jnp.take(params["tok_emb"], idx, axis=0))
    x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]

    t = x.shape[1]
    if t > cfg.block_size:
        raise ValueError(f"sequence {t} exceeds block_size {cfg.block_size}")
    x = x + params["pos_emb"][:t]
    if cfg.mixed_precision:
        # mixed precision keeps the residual stream f32 (the block body
        # returns f32 accumulations); with bf16 params the embedding
        # lookup is bf16, which would flip the scan carry dtype
        x = x.astype(jnp.float32)
    return x


def make_block_body(cfg: GPTConfig, *, train: bool, return_attn: bool = False,
                    use_pallas=None):
    """The (possibly remat-wrapped) per-layer body that ``gpt_apply`` scans:
    ``body(x, stacked_layer_params, (3, key_w) rngs) -> (x', att)``.
    Shared with the pipeline-parallel stack (parallel/pipeline.py)."""
    def block_fn(x_in, p, rngs):
        return _block(x_in, p, cfg, train=train, rngs=rngs,
                      return_attn=return_attn, use_pallas=use_pallas)

    if cfg.remat:
        policy = {
            "full": None,
            "attn": jax.checkpoint_policies.save_only_these_names(
                "attn_out"),
            "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        }[cfg.remat_policy]
        return (jax.checkpoint(block_fn, policy=policy)
                if policy is not None else jax.checkpoint(block_fn))
    return block_fn


def gpt_apply(params: Params, cfg: GPTConfig, idx: Optional[jnp.ndarray],
              cond_emb: Optional[jnp.ndarray] = None, *,
              train: bool = False, rng: Optional[jax.Array] = None,
              return_attn: bool = False, use_pallas=None):
    """Full forward.

    idx: (B, T) int tokens (may be None if cond_emb alone is the input);
    cond_emb: (B, P, D) embeddings prepended to the token embeddings
    (reference: minGPT.py:168-199).

    Returns (logits (B, P+T, out), last_layer_attention or None).
    """
    x = embed_tokens(params, cfg, idx, cond_emb)
    t = x.shape[1]

    train = bool(train) and rng is not None
    if train:
        rng, drop_rng = jax.random.split(rng)
        x = _dropout(x, cfg.embd_pdrop, drop_rng, train)
        layer_rngs = jax.random.split(rng, cfg.n_layer * 3).reshape(
            cfg.n_layer, 3, -1)
    else:
        layer_rngs = _raw_key_zeros((cfg.n_layer, 3))

    maybe_remat = make_block_body(cfg, train=train, return_attn=return_attn,
                                  use_pallas=use_pallas)

    def body(carry, xs):
        p, rngs = xs
        if return_attn:
            x_new, att = maybe_remat(carry[0], p, rngs)
            return (x_new, att), None
        x_new, _ = maybe_remat(carry, p, rngs)
        return x_new, None

    if return_attn:
        b, h = x.shape[0], cfg.n_head
        att0 = jnp.zeros((b, h, t, t), jnp.float32)
        (x, att), _ = jax.lax.scan(body, (x, att0),
                                   (params["blocks"], layer_rngs))
    else:
        x, _ = jax.lax.scan(body, x, (params["blocks"], layer_rngs))
        att = None

    x = _layer_norm(x, params["ln_f_s"], params["ln_f_b"])
    logits = x @ params["head"]["w"]
    return logits, att


def cross_entropy_loss(logits: jnp.ndarray, targets: jnp.ndarray,
                       reduce: str = "mean") -> jnp.ndarray:
    """F.cross_entropy equivalent over the last axis
    (reference: minGPT.py:416)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    if reduce == "mean":
        return jnp.mean(nll)
    if reduce == "sum":
        return jnp.sum(nll)
    return nll


# ---------------------------------------------------------------------------
# KV-cached autoregressive decode
# ---------------------------------------------------------------------------


def init_kv_cache(cfg: GPTConfig, batch: int, max_len: Optional[int] = None,
                  dtype=None) -> Dict[str, jnp.ndarray]:
    max_len = max_len or cfg.block_size
    # (L, B, H, T, hd): head-major so the decode attention contraction
    # reads each (b, h) row contiguously over (T, hd)
    shape = (cfg.n_layer, batch, cfg.n_head, max_len, cfg.head_dim)
    if cfg.cache_dtype in ("int8", "int4"):
        # absmax-quantised cache: int8 (or nibble-packed int4) values +
        # bf16 scale per (layer, batch, position, head) — the cache reads
        # dominate AR decode on TPU, so every halving of the value bytes
        # moves the bandwidth floor (bf16 scales: f32 ones were 25% of the
        # streamed bytes at hd=64)
        if cfg.cache_dtype == "int4":
            shape = shape[:-1] + (cfg.head_dim // 2,)   # two nibbles/byte
        sshape = (cfg.n_layer, batch, cfg.n_head, max_len)
        vdtype = jnp.uint8 if cfg.cache_dtype == "int4" else jnp.int8
        return {"k": jnp.zeros(shape, vdtype),
                "v": jnp.zeros(shape, vdtype),
                "k_scale": jnp.zeros(sshape, jnp.bfloat16),
                "v_scale": jnp.zeros(sshape, jnp.bfloat16),
                "len": jnp.zeros((), jnp.int32)}
    dtype = dtype or cfg.dtype
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype),
            "len": jnp.zeros((), jnp.int32)}


def _quantize_kv(x: jnp.ndarray):
    """(..., hd) -> (int8 values, f32 absmax-scale over hd)."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 127.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -127, 127).astype(jnp.int8)
    return q, scale


def _quantize_kv4(x: jnp.ndarray):
    """(..., hd) -> (uint8 nibble-packed int4 values (..., hd/2), f32
    absmax-scale over hd).  Values clip to [-7, 7]; even head-dims go to
    the low nibble, odd to the high."""
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)
    scale = jnp.maximum(amax / 7.0, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale[..., None]),
                 -7, 7).astype(jnp.int32)
    lo = q[..., 0::2] & 0xF
    hi = q[..., 1::2] & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def _unpack4(p: jnp.ndarray) -> jnp.ndarray:
    """uint8 nibble-packed (..., hd/2) -> int32 values (..., hd) in
    [-7, 7] (sign-extended)."""
    p = p.astype(jnp.int32)
    lo = p & 0xF
    hi = (p >> 4) & 0xF
    v = jnp.stack([lo, hi], axis=-1).reshape(p.shape[:-1] + (-1,))
    return v - 16 * (v > 7)


def gpt_prefill(params: Params, cfg: GPTConfig, cache: Dict,
                idx: Optional[jnp.ndarray],
                cond_emb: Optional[jnp.ndarray] = None, *,
                use_pallas=None) -> Tuple[jnp.ndarray, Dict]:
    """Run the prompt (cond + given tokens) once, filling the cache.

    Returns (logits at the last position (B, out), cache).
    """
    # Embedding kept inline (vs sharing embed_tokens): the decode path
    # deliberately leaves the residual stream in cfg.dtype (bf16 in
    # serving) for HBM bandwidth, where gpt_apply's mixed-precision mode
    # carries f32 between blocks for training stability.
    parts = []
    if cond_emb is not None:
        parts.append(cond_emb.astype(cfg.dtype))
    if idx is not None and idx.shape[1] > 0:
        parts.append(jnp.take(params["tok_emb"], idx, axis=0))
    x = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    t0 = x.shape[1]
    if t0 > cfg.block_size:
        raise ValueError(f"prompt length {t0} > block_size "
                         f"{cfg.block_size}")
    x = x + params["pos_emb"][:t0]

    def body(x, p):
        h = _layer_norm(x, p["ln1_s"], p["ln1_b"])
        qkv = h @ p["attn_qkv"]["w"] + p["attn_qkv"]["b"]
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh, kh, vh = (_split_heads(a, cfg.n_head) for a in (q, k, v))
        res = attend(qh, kh, vh, cfg.n_unmasked, use_pallas=use_pallas)
        y = _merge_heads(res) @ p["attn_proj"]["w"] + p["attn_proj"]["b"]
        x = x + y
        h2 = _layer_norm(x, p["ln2_s"], p["ln2_b"])
        m = jax.nn.gelu(h2 @ p["mlp_up"]["w"] + p["mlp_up"]["b"],
                        approximate=False) @ p["mlp_down"]["w"] \
            + p["mlp_down"]["b"]
        # cache layout (B, H, T, hd) — kh/vh are already head-major
        return x + m, (kh, vh)

    x, (ks, vs) = jax.lax.scan(body, x, params["blocks"])
    cache = dict(cache)
    if cfg.cache_dtype in ("int8", "int4"):
        quant = _quantize_kv if cfg.cache_dtype == "int8" else _quantize_kv4
        kq, ks_s = quant(ks)
        vq, vs_s = quant(vs)
        cache["k"] = jax.lax.dynamic_update_slice(cache["k"], kq,
                                                  (0, 0, 0, 0, 0))
        cache["v"] = jax.lax.dynamic_update_slice(cache["v"], vq,
                                                  (0, 0, 0, 0, 0))
        cache["k_scale"] = jax.lax.dynamic_update_slice(
            cache["k_scale"], ks_s.astype(cache["k_scale"].dtype),
            (0, 0, 0, 0))
        cache["v_scale"] = jax.lax.dynamic_update_slice(
            cache["v_scale"], vs_s.astype(cache["v_scale"].dtype),
            (0, 0, 0, 0))
    else:
        cache["k"] = jax.lax.dynamic_update_slice(
            cache["k"], ks.astype(cache["k"].dtype), (0, 0, 0, 0, 0))
        cache["v"] = jax.lax.dynamic_update_slice(
            cache["v"], vs.astype(cache["v"].dtype), (0, 0, 0, 0, 0))
    cache["len"] = jnp.asarray(t0, jnp.int32)

    x = _layer_norm(x[:, -1], params["ln_f_s"], params["ln_f_b"])
    return x @ params["head"]["w"], cache


def quantize_block_weights(blocks: Dict) -> Dict:
    """Per-output-channel absmax int8 quantisation of the four block matmul
    weights, for decode-time weight streaming (halves the weight bytes read
    from HBM per token; the MXU runs the int8 path at 2x bf16 throughput).
    """
    def q(w):                                       # (L, in, out)
        amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=1)   # (L, out)
        scale = jnp.maximum(amax / 127.0, 1e-8)
        wq = jnp.clip(jnp.round(w.astype(jnp.float32)
                                / scale[:, None, :]), -127, 127)
        return {"q": wq.astype(jnp.int8), "s": scale}
    return {name: q(blocks[name]["w"])
            for name in ("attn_qkv", "attn_proj", "mlp_up", "mlp_down")}


def _int8_mm(x: jnp.ndarray, wq: jnp.ndarray, ws: jnp.ndarray) -> jnp.ndarray:
    """x (B, in) @ int8 weights (in, out) with per-row activation absmax
    quantisation; accumulates int32 on the MXU, rescales to f32."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)        # (B,)
    xs = jnp.maximum(ax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) / xs[:, None]),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, wq, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * xs[:, None] * ws[None, :]


def gpt_decode_step(params: Params, cfg: GPTConfig, cache: Dict,
                    token: jnp.ndarray,
                    wq: Optional[Dict] = None) -> Tuple[jnp.ndarray, Dict]:
    """One cached decode step.  token: (B,) int -> (logits (B, out), cache).

    The stacked (L, B, H, T, hd) caches thread through the layer-scan
    CARRY (weights stream via xs) and each layer writes only its
    (1, B, H, 1, hd) slot with ``dynamic_update_slice`` — XLA updates
    carry buffers in place, where a scan-over-layers with the cache in
    xs/ys rewrote the full cache every step.  What remains is the
    speed-of-light regime for AR decode: weight reads + one cache-slice
    read per layer.
    """
    pos = cache["len"]
    x = jnp.take(params["tok_emb"], token, axis=0)        # (B, D)
    x = x + jax.lax.dynamic_index_in_dim(params["pos_emb"], pos, 0,
                                         keepdims=False)
    max_len = cache["k"].shape[3]
    valid = (jnp.arange(max_len) <= pos)[None, None, :]   # (1, 1, T)
    b = x.shape[0]
    blocks = params["blocks"]
    scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.head_dim, jnp.float32))

    int8_cache = cfg.cache_dtype in ("int8", "int4")
    quant = _quantize_kv4 if cfg.cache_dtype == "int4" else _quantize_kv

    def body(carry, xs):
        if int8_cache:
            x, k_cache, v_cache, k_sc, v_sc = carry
        else:
            x, k_cache, v_cache = carry
        if wq is None:
            p, l = xs      # weights streamed by scan; cache stays in carry

            def mm(a, name):
                return a @ p[name]["w"] + p[name]["b"]
        else:
            p, pw, l = xs  # int8 weights streamed; f32/bf16 w's unread (DCE)

            def mm(a, name):
                out = _int8_mm(a, pw[name]["q"], pw[name]["s"])
                return out.astype(a.dtype) + p[name]["b"]
        h = _layer_norm(x, p["ln1_s"], p["ln1_b"])
        qkv = mm(h, "attn_qkv")                            # (B, 3D)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = q.reshape(b, cfg.n_head, cfg.head_dim)
        kh = k.reshape(1, b, cfg.n_head, 1, cfg.head_dim)
        vh = v.reshape(1, b, cfg.n_head, 1, cfg.head_dim)
        if int8_cache:
            kq, ks_s = quant(kh)
            vq, vs_s = quant(vh)
            k_cache = jax.lax.dynamic_update_slice(k_cache, kq,
                                                   (l, 0, 0, pos, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, vq,
                                                   (l, 0, 0, pos, 0))
            k_sc = jax.lax.dynamic_update_slice(
                k_sc, ks_s.astype(k_sc.dtype), (l, 0, 0, pos))
            v_sc = jax.lax.dynamic_update_slice(
                v_sc, vs_s.astype(v_sc.dtype), (l, 0, 0, pos))
        else:
            k_cache = jax.lax.dynamic_update_slice(
                k_cache, kh.astype(k_cache.dtype), (l, 0, 0, pos, 0))
            v_cache = jax.lax.dynamic_update_slice(
                v_cache, vh.astype(v_cache.dtype), (l, 0, 0, pos, 0))
        k_l = jax.lax.dynamic_index_in_dim(k_cache, l, 0, keepdims=False)
        v_l = jax.lax.dynamic_index_in_dim(v_cache, l, 0, keepdims=False)
        if int8_cache:
            # scales are per (b, t, h): fold k's into the scores and v's
            # into the probabilities — the int8 arrays are what stream
            # from HBM; the dequant fuses on-chip.  (An int8-MXU variant
            # quantising q and probs measured NO faster at B=512 —
            # 2.56s vs 2.52s decode — so the simpler f32-einsum dequant
            # stays; see BENCH_NOTES.md.)
            k_s = jax.lax.dynamic_index_in_dim(k_sc, l, 0, keepdims=False)
            v_s = jax.lax.dynamic_index_in_dim(v_sc, l, 0, keepdims=False)
            if cfg.cache_dtype == "int4":
                # nibble-unpack fuses with the convert into the einsum
                # read; the packed uint8 stream is what leaves HBM
                k_f = _unpack4(k_l).astype(jnp.float32)
                v_f = _unpack4(v_l).astype(jnp.float32)
            else:
                k_f = k_l.astype(jnp.float32)
                v_f = v_l.astype(jnp.float32)
            scores = jnp.einsum("bhd,bhtd->bht", qh.astype(jnp.float32),
                                k_f, preferred_element_type=jnp.float32)
            scores = scores * k_s.astype(jnp.float32) * scale
            scores = jnp.where(valid, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bht,bhtd->bhd",
                           probs * v_s.astype(jnp.float32),
                           v_f, preferred_element_type=jnp.float32)
            o = o.astype(x.dtype)
        else:
            scores = jnp.einsum("bhd,bhtd->bht", qh, k_l,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(valid, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bht,bhtd->bhd", probs.astype(v_l.dtype), v_l,
                           preferred_element_type=jnp.float32).astype(x.dtype)
        y = mm(o.reshape(b, cfg.n_embd), "attn_proj")
        x = x + y
        h2 = _layer_norm(x, p["ln2_s"], p["ln2_b"])
        m = mm(jax.nn.gelu(mm(h2, "mlp_up"), approximate=False),
               "mlp_down")
        if int8_cache:
            return (x + m, k_cache, v_cache, k_sc, v_sc), None
        return (x + m, k_cache, v_cache), None

    xs_in = ((blocks, jnp.arange(cfg.n_layer)) if wq is None
             else (blocks, wq, jnp.arange(cfg.n_layer)))
    if int8_cache:
        (x, ks, vs, kss, vss), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"], cache["k_scale"],
                   cache["v_scale"]), xs_in)
        cache = {"k": ks, "v": vs, "k_scale": kss, "v_scale": vss,
                 "len": pos + 1}
    else:
        (x, ks, vs), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"]), xs_in)
        cache = {"k": ks, "v": vs, "len": pos + 1}
    x = _layer_norm(x, params["ln_f_s"], params["ln_f_b"])
    return x @ params["head"]["w"], cache


def _grow_cache(cache: Dict, new_len: int) -> Dict:
    """Pad the cache's position axis to ``new_len`` (segmented decode)."""
    out = dict(cache)
    cur = cache["k"].shape[3]
    if new_len <= cur:
        return out
    pad5 = ((0, 0), (0, 0), (0, 0), (0, new_len - cur), (0, 0))
    out["k"] = jnp.pad(cache["k"], pad5)
    out["v"] = jnp.pad(cache["v"], pad5)
    if "k_scale" in cache:
        pad4 = ((0, 0), (0, 0), (0, 0), (0, new_len - cur))
        out["k_scale"] = jnp.pad(cache["k_scale"], pad4)
        out["v_scale"] = jnp.pad(cache["v_scale"], pad4)
    return out


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "steps", "temperature", "top_k", "top_p",
                     "sample", "use_pallas", "segments"))
def gpt_generate(params: Params, cfg: GPTConfig, key: jax.Array,
                 cond_emb: jnp.ndarray,
                 given: Optional[jnp.ndarray] = None, *,
                 steps: int, temperature: float = 1.0,
                 top_k: Optional[int] = None,
                 top_p: Optional[float] = None, sample: bool = True,
                 use_pallas=None, segments: int = 1) -> jnp.ndarray:
    """KV-cached autoregressive generation.

    Replaces the reference sampling loop of ``steps`` full forwards
    (minGPT.py:331-358, decoders.py:96-122) with one prefill + a
    ``lax.scan`` of cached single-token steps.

    ``segments > 1`` grows the cache in stages so attention reads scale
    with the valid prefix instead of the full block (the cache read is the
    decode bandwidth floor once weights are batch-amortised).

    cond_emb: (B, P, D) conditioning embeddings (class token or latent z);
    given:    (B, T0) already-fixed tokens (prefix), may be None/empty.
    Returns (B, T0+steps) tokens (the reference's ``sample`` return without
    the conditioning, minGPT.py:358-360).
    """
    b = cond_emb.shape[0]
    p = cond_emb.shape[1]
    t0 = 0 if given is None else given.shape[1]
    total_len = p + t0 + steps

    # segment capacities (position-axis sizes), last covers everything
    segments = max(1, min(segments, steps))
    caps = sorted({min(total_len, max(
        p + t0 + 1, -(-total_len * (i + 1) // segments)))
        for i in range(segments)})

    cache = init_kv_cache(cfg, b, max_len=caps[0])
    logits, cache = gpt_prefill(params, cfg, cache, given, cond_emb,
                                use_pallas=use_pallas)
    # int8 weight streaming: quantise once per generate call (one weight
    # pass, amortised over `steps` cached decode steps)
    wq = (quantize_block_weights(params["blocks"])
          if cfg.decode_weight_dtype == "int8" else None)

    def step(carry, k):
        logits, cache = carry
        tok = sample_logits(k, logits, temperature=temperature,
                            top_k=top_k, top_p=top_p, sample=sample)
        logits, cache = gpt_decode_step(params, cfg, cache, tok, wq)
        return (logits, cache), tok

    all_toks = []
    done = 0
    key_all = jax.random.split(key, steps)
    for i, cap in enumerate(caps):
        cache = _grow_cache(cache, cap)
        # steps that fit before the cache is full (cap positions hold
        # prefix + generated-so-far + this segment's tokens)
        seg = min(steps - done, cap - (p + t0) - done)
        if i == len(caps) - 1:
            seg = steps - done
        if seg <= 0:
            continue
        (logits, cache), toks = jax.lax.scan(
            step, (logits, cache), key_all[done:done + seg])
        all_toks.append(toks)
        done += seg

    toks = jnp.concatenate(all_toks, axis=0).T  # (B, steps)
    if t0 > 0:
        toks = jnp.concatenate([given, toks], axis=1)
    return toks


def gpt_attention_maps(params: Params, cfg: GPTConfig, idx, cond_emb=None):
    """Last-layer attention for logging (reference returns it from every
    forward, minGPT.py:183-185; we compute it only on demand)."""
    _, att = gpt_apply(params, cfg, idx, cond_emb, return_attn=True,
                       use_pallas=False)
    return att
