"""Speculative decoding: a small draft GPT proposes gamma tokens per round,
the target verifies them in ONE chunked cached forward, and a corrected
accept/reject step keeps the output distribution EXACTLY the target's
(speculative sampling, Leviathan et al. 2023 / Chen et al. 2023 — public
algorithm; implemented here from the math, not from any codebase).

Beyond the reference (whose sampler is 265 uncached full forwards,
/root/reference/transformer/minGPT.py:331-358).  Motivation on TPU: the
latency-bound serving regime (B<=32, BENCH_NOTES.md throughput-latency
curve) is weight-stream-bound — each of the 265 serial target steps
streams the full 302M-param weights for one token.  A verified chunk of
c tokens streams the weights ONCE for c positions, so wall-clock scales
with rounds (~steps / (accepted+1)) instead of steps; the draft adds a
cheap (n_layer_draft / n_layer) overhead per proposed token.

Correctness properties (pinned by tests/test_speculative.py):
  * draft == target  =>  output BIT-IDENTICAL to ``gpt_generate`` (same
    per-position PRNG keys; every proposal accepted).
  * deterministic mode (sample=False)  =>  output bit-identical to greedy
    ``gpt_generate`` for ANY draft (acceptance = proposal matches the
    target argmax).
  * chunk-verify forward == the same tokens fed one-by-one through
    ``gpt_decode_step`` (logits and cache agree).

Batched form: per round the whole batch advances by the MINIMUM
acceptance count across lanes (a lane that would have accepted more
simply redraws its next token from the target distribution — still
exact, see _round).  Expected speedup therefore degrades with B; this is
a latency feature for small serving batches, not a B=512 throughput
feature (there decode is KV-cache-bound and drafting only adds work).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import GPTConfig
from ..ops.sampling import filtered_log_probs, sample_logits
from .gpt import (Params, _int8_mm, _layer_norm, _quantize_kv,
                  _quantize_kv4, _unpack4, gpt_decode_step, gpt_prefill,
                  init_kv_cache, quantize_block_weights)


def gpt_decode_chunk(params: Params, cfg: GPTConfig, cache: Dict,
                     tokens: jnp.ndarray,
                     wq: Optional[Dict] = None
                     ) -> Tuple[jnp.ndarray, Dict]:
    """Cached forward over a CHUNK of c tokens at positions
    ``cache['len'] .. len+c-1`` (causal within the chunk and over the
    cached prefix).  tokens: (B, c) int -> (logits (B, c, out), cache with
    len += c).  The chunk generalisation of ``gpt_decode_step`` — one
    weight stream serves c positions; this is what makes speculative
    verification cheaper than c single steps in the weight-bound regime.

    MAINTENANCE: this body deliberately mirrors ``gpt_decode_step``
    (gpt.py:453-575) with a chunk axis added — the single-step path is
    the tuned hot loop (60% of its HBM roof) and is NOT refactored into
    the chunk form to avoid perturbing it.  Any numerics change to one
    must be mirrored in the other; the pinned equivalence
    ``tests/test_speculative.py::test_decode_chunk_matches_single_steps``
    fails on divergence.
    """
    pos = cache["len"]
    b, c = tokens.shape
    x = jnp.take(params["tok_emb"], tokens, axis=0)          # (B, c, D)
    # per-position clip: garbage (overshoot) positions clamp harmlessly,
    # valid ones are in range by the caller's cache sizing
    pidx = jnp.clip(pos + jnp.arange(c), 0, params["pos_emb"].shape[0] - 1)
    x = x + jnp.take(params["pos_emb"], pidx, axis=0)[None]
    max_len = cache["k"].shape[3]
    # slot j attends cache positions <= pos + j
    valid = (jnp.arange(max_len)[None, :]
             <= (pos + jnp.arange(c))[:, None])[None, None]  # (1,1,c,T)
    scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.head_dim, jnp.float32))
    int8_cache = cfg.cache_dtype in ("int8", "int4")
    quant = _quantize_kv4 if cfg.cache_dtype == "int4" else _quantize_kv

    def mm(a, p, pw, name):                                  # (B, c, D_in)
        if pw is None:
            return a @ p[name]["w"] + p[name]["b"]
        flat = _int8_mm(a.reshape(b * c, -1), pw[name]["q"], pw[name]["s"])
        return flat.reshape(b, c, -1).astype(a.dtype) + p[name]["b"]

    def body(carry, xs):
        if int8_cache:
            x, k_cache, v_cache, k_sc, v_sc = carry
        else:
            x, k_cache, v_cache = carry
        if wq is None:
            p, l = xs
            pw = None
        else:
            p, pw, l = xs
        h = _layer_norm(x, p["ln1_s"], p["ln1_b"])
        qkv = mm(h, p, pw, "attn_qkv")                       # (B, c, 3D)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        qh = q.reshape(b, c, cfg.n_head, cfg.head_dim).transpose(0, 2, 1, 3)
        kh = k.reshape(1, b, c, cfg.n_head, cfg.head_dim) \
              .transpose(0, 1, 3, 2, 4)                      # (1,B,H,c,hd)
        vh = v.reshape(1, b, c, cfg.n_head, cfg.head_dim) \
              .transpose(0, 1, 3, 2, 4)
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
            k_s = jax.lax.dynamic_index_in_dim(k_sc, l, 0, keepdims=False)
            v_s = jax.lax.dynamic_index_in_dim(v_sc, l, 0, keepdims=False)
            if cfg.cache_dtype == "int4":
                k_f = _unpack4(k_l).astype(jnp.float32)
                v_f = _unpack4(v_l).astype(jnp.float32)
            else:
                k_f = k_l.astype(jnp.float32)
                v_f = v_l.astype(jnp.float32)
            scores = jnp.einsum("bhcd,bhtd->bhct",
                                qh.astype(jnp.float32), k_f,
                                preferred_element_type=jnp.float32)
            scores = scores * k_s.astype(jnp.float32)[:, :, None, :] * scale
            scores = jnp.where(valid, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhct,bhtd->bhcd",
                           probs * v_s.astype(jnp.float32)[:, :, None, :],
                           v_f, preferred_element_type=jnp.float32)
            o = o.astype(x.dtype)
        else:
            scores = jnp.einsum("bhcd,bhtd->bhct", qh, k_l,
                                preferred_element_type=jnp.float32) * scale
            scores = jnp.where(valid, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1)
            o = jnp.einsum("bhct,bhtd->bhcd", probs.astype(v_l.dtype), v_l,
                           preferred_element_type=jnp.float32
                           ).astype(x.dtype)
        o = o.transpose(0, 2, 1, 3).reshape(b, c, cfg.n_embd)
        x = x + mm(o, p, pw, "attn_proj")
        h2 = _layer_norm(x, p["ln2_s"], p["ln2_b"])
        m = mm(jax.nn.gelu(mm(h2, p, pw, "mlp_up"), approximate=False),
               p, pw, "mlp_down")
        if int8_cache:
            return (x + m, k_cache, v_cache, k_sc, v_sc), None
        return (x + m, k_cache, v_cache), None

    blocks = params["blocks"]
    xs_in = ((blocks, jnp.arange(cfg.n_layer)) if wq is None
             else (blocks, wq, jnp.arange(cfg.n_layer)))
    if int8_cache:
        (x, ks, vs, kss, vss), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"], cache["k_scale"],
                   cache["v_scale"]), xs_in)
        cache = {"k": ks, "v": vs, "k_scale": kss, "v_scale": vss,
                 "len": pos + c}
    else:
        (x, ks, vs), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"]), xs_in)
        cache = {"k": ks, "v": vs, "len": pos + c}
    x = _layer_norm(x, params["ln_f_s"], params["ln_f_b"])
    return x @ params["head"]["w"], cache


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "draft_cfg", "steps", "gamma", "temperature",
                     "top_k", "top_p", "sample"))
def gpt_speculative_generate(
        params: Params, cfg: GPTConfig,
        draft_params: Params, draft_cfg: GPTConfig,
        key: jax.Array, cond_emb: jnp.ndarray,
        draft_cond_emb: jnp.ndarray,
        given: Optional[jnp.ndarray] = None, *,
        steps: int, gamma: int = 4, temperature: float = 1.0,
        top_k: Optional[int] = None, top_p: Optional[float] = None,
        sample: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """KV-cached speculative generation; returns
    ``(tokens (B, T0+steps), stats)`` — tokens distributed exactly as
    ``gpt_generate(params, cfg, ...)`` would produce (see module
    docstring for the pinned equivalences), stats = {"rounds",
    "drafted", "accepted"} (device scalars; acceptance rate =
    accepted / drafted).

    Key discipline: per-position keys (``split(key, ...)`` indexed by the
    token's absolute output position) so that draft==target reproduces
    ``gpt_generate`` bit-for-bit; acceptance uniforms come from an
    independent fold_in stream.
    """
    b = cond_emb.shape[0]
    p_len = cond_emb.shape[1]
    t0 = 0 if given is None else given.shape[1]
    gamma = max(1, min(gamma, steps)) if steps > 1 else 1
    buf_len = steps + gamma + 1
    # per-output-position sampling keys (gpt_generate parity) + an
    # independent uniform stream for the acceptance tests
    key_all = jax.random.split(key, buf_len)
    u_key = jax.random.fold_in(key, 0x5bec)

    t_cache = init_kv_cache(cfg, b, max_len=p_len + t0 + steps + gamma + 1)
    d_cache = init_kv_cache(draft_cfg, b,
                            max_len=p_len + t0 + steps + gamma + 1)
    t_logits, t_cache = gpt_prefill(params, cfg, t_cache, given, cond_emb)
    _, d_cache = gpt_prefill(draft_params, draft_cfg, d_cache, given,
                             draft_cond_emb)
    wq = (quantize_block_weights(params["blocks"])
          if cfg.decode_weight_dtype == "int8" else None)
    dwq = (quantize_block_weights(draft_params["blocks"])
           if draft_cfg.decode_weight_dtype == "int8" else None)

    skw = dict(temperature=temperature, top_k=top_k, top_p=top_p)
    y0 = sample_logits(key_all[0], t_logits, sample=sample, **skw)

    out = jnp.zeros((b, buf_len), jnp.int32)
    out = out.at[:, 0].set(y0)

    def pos_key(i):
        return jax.lax.dynamic_index_in_dim(key_all, jnp.minimum(
            i, buf_len - 1), 0, keepdims=False)

    def round_body(state):
        out, produced, y_prev, t_cache, d_cache, rounds, accepted = state

        # --- draft proposes gamma tokens (y_prev first, then own samples)
        def draft_step(carry, i):
            tok, d_cache = carry
            logits, d_cache = gpt_decode_step(draft_params, draft_cfg,
                                              d_cache, tok, dwq)
            x_i = sample_logits(pos_key(produced + i), logits,
                                sample=sample, **skw)
            q_lp = filtered_log_probs(logits, **skw)
            return (x_i, d_cache), (x_i, q_lp)

        (last_x, d_cache), (xs, q_lps) = jax.lax.scan(
            draft_step, (y_prev, d_cache), jnp.arange(gamma))
        # xs: (gamma, B); q_lps: (gamma, B, V)
        # catch-up step: the scan consumed [y_prev, x_1..x_{gamma-1}]; when
        # every proposal is accepted the rewound cache must also hold
        # x_gamma's K/V, so consume it too (logits discarded)
        _, d_cache = gpt_decode_step(draft_params, draft_cfg, d_cache,
                                     last_x, dwq)

        # --- target verifies [y_prev, x_1..x_gamma] in one chunk
        chunk = jnp.concatenate([y_prev[:, None], xs.T], axis=1)
        t_len0 = t_cache["len"]
        logits_c, t_cache = gpt_decode_chunk(params, cfg, t_cache, chunk,
                                             wq)
        p_lps = filtered_log_probs(logits_c, **skw)     # (B, gamma+1, V)

        # --- accept/reject
        p_at_x = jnp.take_along_axis(
            p_lps[:, :gamma], xs.T[..., None], axis=-1)[..., 0]  # (B,g)
        q_at_x = jnp.take_along_axis(
            q_lps.transpose(1, 0, 2), xs.T[..., None], axis=-1)[..., 0]
        if sample:
            u = jax.random.uniform(jax.random.fold_in(u_key, rounds),
                                   (b, gamma))
            accepts = jnp.log(u) < jnp.minimum(p_at_x - q_at_x, 0.0)
        else:
            accepts = xs.T == jnp.argmax(p_lps[:, :gamma], axis=-1)
        lead = jnp.cumprod(accepts.astype(jnp.int32), axis=1)
        a_lane = jnp.sum(lead, axis=1)                   # (B,)
        n = jnp.min(a_lane)                              # round advance

        # --- next token at the cut.  The speculative-sampling identity
        # p(x) = q(x)min(1, p/q) + P(reject) * residual(x) makes KEEPING
        # the accepted sample load-bearing: lanes that accepted x_{n+1}
        # emit it; lanes that rejected there draw from the residual
        # max(p-q, 0)/Z; when n == gamma (every proposal accepted) the
        # bonus token draws from p_{gamma+1}.  (Redrawing "fresh from p"
        # for accepted lanes is NOT exact — the mixture becomes
        # P(accept) p + P(reject) residual != p; caught by
        # test_speculative_preserves_target_distribution.)
        p_cut = jax.lax.dynamic_index_in_dim(p_lps, n, 1,
                                             keepdims=False)  # (B, V)
        q_cut = jax.lax.dynamic_index_in_dim(
            q_lps, jnp.minimum(n, gamma - 1), 0, keepdims=False)
        rejected = (a_lane == n) & (n < gamma)           # (B,)
        resid = jnp.maximum(jnp.exp(p_cut) - jnp.exp(q_cut), 0.0)
        rsum = jnp.sum(resid, axis=-1, keepdims=True)
        resid_lp = jnp.where(rsum > 0, jnp.log(resid / jnp.maximum(
            rsum, 1e-38) + 1e-38), p_cut)
        final_lp = jnp.where(rejected[:, None], resid_lp, p_cut)
        # lanes that accepted past the cut keep their accepted x_{n+1}
        x_next = jax.lax.dynamic_index_in_dim(
            xs, jnp.minimum(n, gamma - 1), 0, keepdims=False)   # (B,)
        keep = a_lane > n
        if sample:
            # key discipline: when every proposal was accepted (n==gamma)
            # y sits at a fresh output position -> its per-position key
            # (gpt_generate bit-parity).  At a truncated cut the
            # position's key already sampled the draft's x_{n+1}; reusing
            # it would correlate the residual draw with the accept/reject
            # event -> independent per-round key instead.
            y_key = jax.lax.cond(
                n == gamma, lambda: pos_key(produced + n),
                lambda: jax.random.fold_in(u_key, rounds + (1 << 30)))
            y = jax.random.categorical(y_key, final_lp, axis=-1)
        else:
            y = jnp.argmax(p_cut, axis=-1)
        y = jnp.where(keep, x_next, y)

        # --- emit [x_1..x_n, y] (slots past n are dead: overwritten by
        # the next round's write or past the final [:steps] slice)
        emitted = jnp.concatenate([xs.T, y[:, None]], axis=1)  # (B, g+1)
        emitted = jnp.where(jnp.arange(gamma + 1)[None] == n,
                            y[:, None], emitted)
        out = jax.lax.dynamic_update_slice(out, emitted, (0, produced))

        # --- rewind both caches to the accepted prefix (stale K/V past
        # `len` is never attended and is overwritten by later writes)
        t_cache = dict(t_cache)
        t_cache["len"] = t_len0 + 1 + n
        d_cache = dict(d_cache)
        d_cache["len"] = t_len0 + 1 + n
        return (out, produced + n + 1, y, t_cache, d_cache, rounds + 1,
                accepted + n)

    def cond(state):
        return state[1] < steps

    state = (out, jnp.asarray(1, jnp.int32), y0, t_cache, d_cache,
             jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    out, _, _, _, _, rounds, accepted = jax.lax.while_loop(
        cond, round_body, state)

    toks = out[:, :steps]
    if given is not None and t0 > 0:
        toks = jnp.concatenate([given.astype(jnp.int32), toks], axis=1)
    stats = {"rounds": rounds, "drafted": rounds * gamma,
             "accepted": accepted}
    return toks, stats
