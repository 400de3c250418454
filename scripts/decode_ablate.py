#!/usr/bin/env python
"""Decode-step ablation on the real chip.

Times one KV-cached decode step (bench config: VAS GPT 24L/16H/1024d,
B=512, int8 KV cache + int8 streamed weights, cache len fixed) with parts
of the layer body removed, to locate the gap between the measured step
time and the HBM roofline (BENCH_NOTES.md "Round 2" section).

Variants (each is the full 24-layer scan with pieces skipped):
  full          — the production gpt_decode_step body
  no_mlp        — attention half only (LN1/qkv/quant/update/attend/proj)
  no_attn       — matmuls only (attention einsums + softmax replaced by q)
  no_update     — full, but k/v quantise+cache-write skipped (reads stale)
  stream_only   — just the two cache einsums + softmax (no matmuls/LN)
  empty         — scan carrying x and the caches with a trivial body
                  (measures scan/carry overhead itself)

Usage: python scripts/decode_ablate.py   (TPU; one job at a time)
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np

from melspec_gpt_vqvae_tpu.configs import load_preset
from melspec_gpt_vqvae_tpu.models.gpt import (_int8_mm, _layer_norm,
                                              _quantize_kv, init_gpt_params,
                                              init_kv_cache,
                                              quantize_block_weights)

B = int(os.environ.get("ABLATE_BATCH", "512"))
T = int(os.environ.get("ABLATE_CAP", "265"))
POS = int(os.environ.get("ABLATE_POS", "200"))
ITERS = int(os.environ.get("ABLATE_ITERS", "30"))


def make_step(cfg, *, skip_attn=False, skip_mlp=False, skip_update=False,
              stream_only=False, empty=False):
    """A gpt_decode_step clone with ablation switches (mirrors
    models/gpt.py::gpt_decode_step int8-cache + int8-weight path)."""

    def step(params, wq, cache, token):
        pos = cache["len"]
        x = jnp.take(params["tok_emb"], token, axis=0)
        x = x + jax.lax.dynamic_index_in_dim(params["pos_emb"], pos, 0,
                                             keepdims=False)
        max_len = cache["k"].shape[3]
        valid = (jnp.arange(max_len) <= pos)[None, None, :]
        b = x.shape[0]
        scale = 1.0 / jnp.sqrt(jnp.asarray(cfg.head_dim, jnp.float32))

        def body(carry, xs):
            x, k_cache, v_cache, k_sc, v_sc = carry
            p, pw, l = xs

            def mm(a, name):
                out = _int8_mm(a, pw[name]["q"], pw[name]["s"])
                return out.astype(a.dtype) + p[name]["b"]

            if empty:
                return (x * 1.0001, k_cache, v_cache, k_sc, v_sc), None

            if stream_only:
                qh = x.reshape(b, cfg.n_head, cfg.head_dim)
            else:
                h = _layer_norm(x, p["ln1_s"], p["ln1_b"])
                qkv = mm(h, "attn_qkv")
                q, k, v = jnp.split(qkv, 3, axis=-1)
                qh = q.reshape(b, cfg.n_head, cfg.head_dim)
                kh = k.reshape(1, b, cfg.n_head, 1, cfg.head_dim)
                vh = v.reshape(1, b, cfg.n_head, 1, cfg.head_dim)
                if not skip_update:
                    kq, ks_s = _quantize_kv(kh)
                    vq, vs_s = _quantize_kv(vh)
                    k_cache = jax.lax.dynamic_update_slice(
                        k_cache, kq, (l, 0, 0, pos, 0))
                    v_cache = jax.lax.dynamic_update_slice(
                        v_cache, vq, (l, 0, 0, pos, 0))
                    k_sc = jax.lax.dynamic_update_slice(
                        k_sc, ks_s.astype(k_sc.dtype), (l, 0, 0, pos))
                    v_sc = jax.lax.dynamic_update_slice(
                        v_sc, vs_s.astype(v_sc.dtype), (l, 0, 0, pos))

            if skip_attn:
                o = qh
            else:
                k_l = jax.lax.dynamic_index_in_dim(k_cache, l, 0,
                                                   keepdims=False)
                v_l = jax.lax.dynamic_index_in_dim(v_cache, l, 0,
                                                   keepdims=False)
                k_s = jax.lax.dynamic_index_in_dim(k_sc, l, 0,
                                                   keepdims=False)
                v_s = jax.lax.dynamic_index_in_dim(v_sc, l, 0,
                                                   keepdims=False)
                scores = jnp.einsum("bhd,bhtd->bht", qh.astype(jnp.float32),
                                    k_l.astype(jnp.float32),
                                    preferred_element_type=jnp.float32)
                scores = scores * k_s.astype(jnp.float32) * scale
                scores = jnp.where(valid, scores, -1e30)
                probs = jax.nn.softmax(scores, axis=-1)
                o = jnp.einsum("bht,bhtd->bhd",
                               probs * v_s.astype(jnp.float32),
                               v_l.astype(jnp.float32),
                               preferred_element_type=jnp.float32)
                o = o.astype(x.dtype)

            if stream_only:
                # keep the attention output live (o*0 would DCE the reads)
                x = x + 0.0001 * o.reshape(b, cfg.n_embd).astype(x.dtype)
                return (x, k_cache, v_cache, k_sc, v_sc), None

            y = mm(o.reshape(b, cfg.n_embd), "attn_proj")
            x = x + y
            if not skip_mlp:
                h2 = _layer_norm(x, p["ln2_s"], p["ln2_b"])
                approx = os.environ.get("ABLATE_GELU") == "tanh"
                m = mm(jax.nn.gelu(mm(h2, "mlp_up"), approximate=approx),
                       "mlp_down")
                x = x + m
            return (x, k_cache, v_cache, k_sc, v_sc), None

        xs_in = (params["blocks"], wq, jnp.arange(cfg.n_layer))
        unroll = int(os.environ.get("ABLATE_UNROLL", "1"))
        (x, ks, vs, kss, vss), _ = jax.lax.scan(
            body, (x, cache["k"], cache["v"], cache["k_scale"],
                   cache["v_scale"]), xs_in, unroll=unroll)
        cache = {"k": ks, "v": vs, "k_scale": kss, "v_scale": vss,
                 # pin len so repeated timing calls see a constant prefix
                 "len": pos}
        x = _layer_norm(x, params["ln_f_s"], params["ln_f_b"])
        return x @ params["head"]["w"], cache

    return step


def main():
    exp = load_preset("GPT", "vas")
    cfg = exp.model.replace(dtype="bfloat16", cache_dtype="int8",
                            decode_weight_dtype="int8")
    key = jax.random.PRNGKey(0)
    params = init_gpt_params(key, cfg)
    wq = quantize_block_weights(params["blocks"])
    tok = jnp.zeros((B,), jnp.int32)
    kk = jax.random.split(key, 4)

    @jax.jit
    def _fill():
        # non-zero deterministic patterns (an iota avoids the 13 GB int32
        # transient a randint of this shape would materialise); values are
        # irrelevant for a bandwidth measurement
        c = init_kv_cache(cfg, B, max_len=T)
        c["k"] = jax.lax.broadcasted_iota(jnp.int8, c["k"].shape, 4) - 31
        c["v"] = jax.lax.broadcasted_iota(jnp.int8, c["v"].shape, 3) - 63
        c["k_scale"] = 0.01 + 0.001 * jax.lax.broadcasted_iota(
            jnp.bfloat16, c["k_scale"].shape, 3)
        c["v_scale"] = 0.01 + 0.001 * jax.lax.broadcasted_iota(
            jnp.bfloat16, c["v_scale"].shape, 2)
        c["len"] = jnp.asarray(POS, jnp.int32)
        return c

    def fresh_cache():
        return jax.tree_util.tree_map(lambda a: a, _fill())

    results = {}
    variants = {
        "full": {},
        "no_mlp": {"skip_mlp": True},
        "no_attn": {"skip_attn": True},
        "no_update": {"skip_update": True},
        "stream_only": {"stream_only": True},
        "empty": {"empty": True},
    }
    only = os.environ.get("ABLATE_VARIANTS")
    if only:
        variants = {k: v for k, v in variants.items()
                    if k in only.split(",")}
    import gc
    # Production decode runs as a lax.scan over steps inside ONE jit
    # (gpt_generate) — the cache carry updates in place.  A per-call jit
    # with donated args measured 54 ms/step for the same body (the remote
    # backend re-materialises the 7 GB cache outputs per call), so the
    # scan-over-steps structure is replicated here exactly.
    NSTEPS = ITERS

    for name, kw in variants.items():
        one = make_step(cfg, **kw)

        @functools.partial(jax.jit, donate_argnums=(2,))
        def run(params, wq, cache, tok):
            # per-step varying tokens + a logits feedback term so no part
            # of the step is loop-invariant (XLA hoists invariant bodies
            # out of the scan otherwise — measured 1.2 ms "steps")
            toks = (tok[None, :] + jnp.arange(NSTEPS)[:, None]) % 16

            def sstep(carry, t):
                cache, fb = carry
                logits, cache = one(params, wq, cache,
                                    (t + fb.astype(jnp.int32)) % 16)
                # len stays pinned at POS inside make_step
                fb = (jnp.argmax(logits, axis=-1) % 2).astype(jnp.int32)
                return (cache, fb), jnp.sum(logits[:, :1])
            (cache, _), outs = jax.lax.scan(
                sstep, (cache, jnp.zeros((B,), jnp.int32)), toks)
            return outs

        outs = run(params, wq, fresh_cache(), tok)    # compile
        float(jnp.sum(outs.astype(jnp.float32)))
        del outs
        gc.collect()
        c = fresh_cache()
        t0 = time.time()
        outs = run(params, wq, c, tok)
        float(jnp.sum(outs.astype(jnp.float32)))
        dt = (time.time() - t0) / NSTEPS
        results[name] = round(dt * 1e3, 3)
        print(f"{name:12s} {dt*1e3:8.3f} ms/step", flush=True)
        del c, outs, run
        gc.collect()

    # roofline context
    kv_bytes = 2 * cfg.n_layer * B * cfg.n_head * (POS + 1) * cfg.head_dim
    sc_bytes = 2 * cfg.n_layer * B * cfg.n_head * (POS + 1) * 2
    w_bytes = sum(int(np.prod(wq[n]["q"].shape)) for n in wq)
    floor_ms = (kv_bytes + sc_bytes + w_bytes) / 819e9 * 1e3
    print(json.dumps({"B": B, "cap": T, "pos": POS, "variants_ms": results,
                      "hbm_floor_ms": round(floor_ms, 3)}))


if __name__ == "__main__":
    main()
