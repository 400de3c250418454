#!/usr/bin/env python
"""Training-throughput benchmark: step time, tokens/s, MFU on the real chip.

Decode throughput is covered by bench.py; this measures the OTHER half of
"fast" — the jitted train steps (the reference's per-step cost is a
Lightning training_step on CUDA; /root/reference/transformer/minGPT.py:419,
Lit_GPT_VAE.py:246).

Timing harness: a single jitted ``lax.scan`` over K steps with the train
state as the carry (per-call timing of one step is invalid through the
remote-TPU tunnel — donation is not honored across calls and
loop-invariant bodies get hoisted; the carried state makes each iteration
depend on the last).  Completion is forced with a dependent-scalar
``device_get`` (``jax.block_until_ready`` can return early through the
tunnel; BENCH_NOTES.md).

MFU convention: useful FLOPs = 3x forward (fwd + 2x bwd), EXCLUDING any
remat replay — so enabling a cheaper remat policy shows up as higher MFU,
not a smaller denominator.  Peak = 197 TFLOP/s (v5e bf16).

Usage:
  python bench_train.py --model vae               # VAS GPT-VAE, bs 24
  python bench_train.py --model gpt --bs 8        # VAS GPT-class
  python bench_train.py --model vae --variants    # remat/dtype ablation
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12


# FLOP/param conventions shared with the runner's perf/* telemetry —
# one definition, so the benchmark and TensorBoard can't diverge
from melspec_gpt_vqvae_tpu.utils.profiling import (  # noqa: E402
    count_params as _count_params, gpt_fwd_flops as _gpt_fwd_flops)


def build_vae(exp, bs):
    from melspec_gpt_vqvae_tpu.training.vae_task import VAETask
    task = VAETask(exp, steps_per_epoch=100)
    state = task.init_state(0)
    rng0 = np.random.default_rng(0)
    codes = rng0.integers(0, exp.model.vocab_size, (bs, 5, 53))
    x = task._shard({"codes": codes.astype(np.int32)})
    step_fn = task._train_step_fn
    freeze = jnp.asarray(False)

    def one(state, r):
        s, l, _ = step_fn(state, x, r, freeze)
        return s, l

    m = exp.model
    enc_p = _count_params(state["params"]["encoder"])
    dec_p = _count_params(state["params"]["decoder"])
    fwd = (_gpt_fwd_flops(enc_p, bs, 265, m.n_layer, m.n_embd)
           + _gpt_fwd_flops(dec_p, bs, 266, m.n_layer, m.n_embd))
    tokens = bs * 265
    return state, one, fwd, tokens, enc_p + dec_p


def build_gpt(exp, bs):
    from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask
    task = GPTTask(exp)
    state = task.init_state(0)
    rng0 = np.random.default_rng(0)
    batch = {"codes": rng0.integers(0, exp.model.vocab_size,
                                    (bs, 5, 53)).astype(np.int32),
             "target": rng0.integers(0, exp.model.class_size,
                                     (bs,)).astype(np.int32)}
    x, c = task._shard_batch(batch)
    step_fn = task._train_step_fn

    def one(state, r):
        s, l = step_fn(state, x, c, r)
        return s, l

    m = exp.model
    n_p = _count_params(state["params"])
    fwd = _gpt_fwd_flops(n_p, bs, 265, m.n_layer, m.n_embd)
    tokens = bs * 265
    return state, one, fwd, tokens, n_p


def time_variant(exp, kind, bs, scan_steps, iters):
    build = build_vae if kind == "vae" else build_gpt
    state, one, fwd_flops, tokens_per_step, n_params = build(exp, bs)

    def run(state, key):
        def body(carry, i):
            st, k = carry
            k, r = jax.random.split(k)
            st, l = one(st, r)
            return (st, k), l

        (state, _), losses = jax.lax.scan(body, (state, key),
                                          jnp.arange(scan_steps))
        return state, losses

    runj = jax.jit(run, donate_argnums=0)
    key = jax.random.PRNGKey(0)
    t0 = time.time()
    state, losses = runj(state, key)
    # dependent scalar forces real completion through the tunnel
    float(jax.device_get(losses[-1]))
    compile_s = time.time() - t0

    times = []
    for _ in range(iters):
        t0 = time.time()
        state, losses = runj(state, key)
        float(jax.device_get(losses[-1]))
        times.append((time.time() - t0) / scan_steps)
    step_s = min(times)
    useful = 3.0 * fwd_flops
    return {
        "params": n_params,
        "step_ms": round(step_s * 1e3, 1),
        "tokens_per_sec": round(tokens_per_step / step_s, 1),
        "useful_tflops": round(useful / 1e12, 1),
        "mfu_pct": round(100.0 * useful / step_s / V5E_PEAK_FLOPS, 1),
        "compile_s": round(compile_s, 1),
        "final_loss": round(float(jax.device_get(losses[-1])), 4),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vae", choices=["vae", "gpt"])
    ap.add_argument("--dataset", default="vas")
    ap.add_argument("--bs", type=int, default=0, help="0 = preset batch")
    ap.add_argument("--scan_steps", type=int, default=8)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--remat_policy", default="full",
                    choices=["full", "attn", "dots"])
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--mixed", action="store_true")
    ap.add_argument("--param_dtype", default="float32")
    ap.add_argument("--opt", default="",
                    help="override the preset optimizer (e.g. adafactor: "
                         "required to fit the 2.09B XL on one 16GB chip)")
    ap.add_argument("--prng", default="rbg", choices=["rbg", "threefry"])
    ap.add_argument("--variants", action="store_true",
                    help="run the remat/dtype ablation grid")
    ap.add_argument("--n_layer", type=int, default=0,
                    help="override layers (CPU smoke testing)")
    ap.add_argument("--n_embd", type=int, default=0)
    ap.add_argument("--n_head", type=int, default=0)
    args = ap.parse_args()

    if args.prng == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")

    from melspec_gpt_vqvae_tpu.configs import load_preset
    exp = load_preset("GPT_VAE" if args.model == "vae" else "GPT",
                      args.dataset)
    if args.opt:
        exp = dataclasses.replace(
            exp, train=dataclasses.replace(exp.train, optimizer=args.opt))
    size_kw = {k: getattr(args, k) for k in ("n_layer", "n_embd", "n_head")
               if getattr(args, k)}
    bs = args.bs or exp.train.batch_size

    def with_model(**kw):
        return dataclasses.replace(
            exp, model=exp.model.replace(**size_kw, **kw))

    if args.variants:
        grid = [
            ("remat_full_f32", dict(remat=True, remat_policy="full")),
            ("remat_attn_f32", dict(remat=True, remat_policy="attn")),
            ("remat_dots_f32", dict(remat=True, remat_policy="dots")),
            ("remat_attn_mixed", dict(remat=True, remat_policy="attn",
                                      mixed_precision=True)),
            ("remat_attn_bf16p", dict(remat=True, remat_policy="attn",
                                      mixed_precision=True,
                                      dtype="bfloat16")),
        ]
        for name, kw in grid:
            try:
                r = time_variant(with_model(**kw), args.model, bs,
                                 args.scan_steps, args.iters)
                print(json.dumps({"variant": name, "bs": bs, **r}),
                      flush=True)
            except Exception as e:  # OOM etc: record and continue
                print(json.dumps({"variant": name, "bs": bs,
                                  "error": repr(e)[:200]}), flush=True)
        return

    kw = dict(remat=not args.no_remat, remat_policy=args.remat_policy,
              mixed_precision=args.mixed, dtype=args.param_dtype)
    r = time_variant(with_model(**kw), args.model, bs, args.scan_steps,
                     args.iters)
    print(json.dumps({"model": args.model, "bs": bs, **kw, **r}))


if __name__ == "__main__":
    main()
