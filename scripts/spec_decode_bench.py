#!/usr/bin/env python
"""Speculative-decode latency bench at reference VAS scale.

Measures small-batch (latency-regime) generation wall time: plain
KV-cached gpt_generate vs gpt_speculative_generate with an n_layer-L
draft, at several gamma.  Reports measured acceptance — with random
weights acceptance reflects the (near-uniform-ish) random logit
distributions, NOT trained-model agreement; treat the speedup column as
mechanics at the measured acceptance, and re-run with --experiment /
--draft_experiment checkpoints for deployment numbers.

Whole-call timing is valid here (calls are 10s-100s of ms through the
tunnel; the per-step scan-harness rule in CLAUDE.md is for ~ms jitted
steps).

Usage: python scripts/spec_decode_bench.py [--batch 1] [--draft_layers 2]
           [--gammas 4,6,8] [--iters 8]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--draft_layers", type=int, default=2)
    ap.add_argument("--gammas", type=str, default="4,6,8")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--top_k", type=int, default=100)
    ap.add_argument("--platform", type=str, default="")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu.configs import load_preset
    from melspec_gpt_vqvae_tpu.models.gpt import (class_embed,
                                                  gpt_generate,
                                                  init_gpt_params)
    from melspec_gpt_vqvae_tpu.models.speculative import \
        gpt_speculative_generate

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    exp = load_preset("GPT", "vas")
    cfg = exp.model.replace(
        dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="int8" if on_tpu else "auto",
        decode_weight_dtype="int8" if on_tpu else "auto")
    dcfg = cfg.replace(n_layer=args.draft_layers)
    params = init_gpt_params(jax.random.PRNGKey(0), cfg)
    d_params = init_gpt_params(jax.random.PRNGKey(1), dcfg)
    cls = jnp.zeros((args.batch,), jnp.int32)
    cond = class_embed(params, cls)
    d_cond = class_embed(d_params, cls)
    steps = 265

    def sync(out):
        # force completion via a dependent scalar device_get —
        # block_until_ready returns early through the remote-TPU tunnel
        # (same workaround as bench.py)
        toks = out[0] if isinstance(out, tuple) else out
        return float(jnp.sum(toks[..., -8:].astype(jnp.float32)))

    def timed(fn):
        sync(fn(jax.random.PRNGKey(99)))    # compile + warm
        t0 = time.time()
        for i in range(args.iters):
            out = fn(jax.random.PRNGKey(i))
            sync(out)
        return (time.time() - t0) / args.iters, out

    base_fn = lambda k: gpt_generate(params, cfg, k, cond, steps=steps,
                                     top_k=args.top_k, segments=8)
    base_s, _ = timed(base_fn)
    rows = [{"mode": "plain", "ms": round(base_s * 1e3, 1),
             "clips_per_s": round(args.batch / base_s, 2)}]
    print(json.dumps(rows[0]))

    for g in (int(x) for x in args.gammas.split(",")):
        fn = lambda k: gpt_speculative_generate(
            params, cfg, d_params, dcfg, k, cond, d_cond,
            steps=steps, gamma=g, top_k=args.top_k)
        s, (toks, stats) = timed(fn)
        row = {"mode": f"spec g={g} draft={args.draft_layers}L",
               "ms": round(s * 1e3, 1),
               "clips_per_s": round(args.batch / s, 2),
               "accept_rate": round(float(stats["accepted"])
                                    / max(1, float(stats["drafted"])), 3),
               "rounds": int(stats["rounds"]),
               "speedup_vs_plain": round(base_s / s, 2)}
        rows.append(row)
        print(json.dumps(row))

    print(json.dumps({"batch": args.batch, "steps": steps,
                      "target": f"{cfg.n_layer}L/{cfg.n_embd}d",
                      "weights": "random-init (acceptance is NOT a "
                                 "trained-model number)",
                      "best": max(rows[1:],
                                  key=lambda r: r["speedup_vs_plain"])
                      if len(rows) > 1 else None}))


if __name__ == "__main__":
    main()
