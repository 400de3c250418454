#!/usr/bin/env python
"""XL serving datapoint: 2.09B-param VGGSound GPT-VAE decoder sampling
from the prior on one v5e chip (40L/23H/1472d, block 266; reference
scale: config/config_GPT_VAE_vggsound.py:56-68).

Decoder-only params in bf16 + int8 KV cache + int8 streamed weights;
reports tokens/s and clips/s for prior sampling (the reference's
sample_from_prior + decode path, Lit_GPT_VAE.py:611-617 + 108-143, which
re-runs a full forward per token).

Usage: python scripts/xl_decode_bench.py   (TPU; one job at a time)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp

from melspec_gpt_vqvae_tpu.configs import load_preset
from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params
from melspec_gpt_vqvae_tpu.models.gpt_vae import (make_vae_configs,
                                                  sample_from_prior,
                                                  vae_decode)

B = int(os.environ.get("XL_BATCH", "64"))
SEGMENTS = int(os.environ.get("XL_SEGMENTS", "8"))


def main():
    exp = load_preset("GPT_VAE", "vggsound")
    base = exp.model.replace(dtype="bfloat16", cache_dtype="int8",
                             decode_weight_dtype="int8")
    cfgs = make_vae_configs(base, exp.vae)
    dec_cfg = cfgs.decoder
    # decoder only — prior sampling never runs the encoder
    params = {"decoder": init_gpt_params(jax.random.PRNGKey(0), dec_cfg)}
    n = sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(params))
    steps = dec_cfg.block_size - 1
    key = jax.random.PRNGKey(0)
    z = sample_from_prior(key, cfgs, B)

    def run(k):
        return vae_decode(params, cfgs, k, z, strategy="beam", top_k=100,
                          temperature=1.0, segments=SEGMENTS)

    t0 = time.time()
    toks = run(key)
    float(jnp.sum(toks[:1, :1]))
    compile_s = time.time() - t0

    iters = 3
    t0 = time.time()
    for i in range(iters):
        toks = run(jax.random.fold_in(key, i))
    float(jnp.sum(toks[:1, :1]))
    dt = (time.time() - t0) / iters

    print(json.dumps({
        "model": "GPT_VAE vggsound XL decoder",
        "params_b": round(n / 1e9, 3),
        "batch": B, "steps": steps, "segments": SEGMENTS,
        "decode_seconds": round(dt, 3),
        "tokens_per_sec": round(B * steps / dt, 1),
        "clips_per_sec": round(B / dt, 2),
        "compile_seconds": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
