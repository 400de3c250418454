#!/usr/bin/env python
"""Localize the int8-decode e2e regression (bench: 1.97 s int8 vs 1.65 s
bf16 at B=512/chunk 128): time the VQ decoder and the vocoder separately,
flax-bf16 vs the quantized executor variants, at the production detok
chunk B=128.

Variants:
  vq.flax        — production bf16 decode_code (models/vqvae.py)
  vq.int8        — decode_code_apply(Int8Convs)
  voc.flax       — production bf16 MelGANGenerator
  voc.int8       — melgan_apply(Int8Convs), polyphase int8 transposes
  voc.int8_noT   — melgan_apply(Int8Convs), transposes left float
  voc.float_exec — melgan_apply(FloatConvs) (executor overhead control)

Usage: python scripts/int8_split.py   (TPU; one job at a time)
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
import numpy as np

from melspec_gpt_vqvae_tpu.configs import load_preset
from melspec_gpt_vqvae_tpu.models import quantized as qz
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator
from melspec_gpt_vqvae_tpu.models.vqvae import VQModel

B = int(os.environ.get("SPLIT_BATCH", "128"))
ITERS = int(os.environ.get("SPLIT_ITERS", "5"))


def timeit(fn, *a):
    def sync(x):
        return float(jnp.sum(x[..., :1].astype(jnp.float32)))

    sync(fn(*a))                     # compile
    t = time.time()
    for _ in range(ITERS):
        r = fn(*a)
    sync(r)
    return (time.time() - t) / ITERS


def main():
    exp = load_preset("GPT", "vas")
    vcfg, vocfg = exp.vqvae, exp.vocoder
    on_tpu = jax.devices()[0].platform != "cpu"

    vq = VQModel(vcfg)
    melgan = MelGANGenerator(vocfg)
    key = jax.random.PRNGKey(0)
    vq_params = vq.init(key, jnp.zeros((1, 80, 848, 1)))["params"]
    voc_params = melgan.init(key, jnp.zeros((1, 848, 80)))["params"]
    if on_tpu:
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
            t)
        vq_params, voc_params = cast(vq_params), cast(voc_params)

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, vcfg.num_embeddings,
                                     (B, vcfg.code_h, vcfg.code_w)),
                        jnp.int32)

    qs = qz.build_qstate(vq_params, voc_params, vcfg, vocfg,
                         n_calib=16, batch=16)
    qs_noT = qz.build_qstate(vq_params, voc_params, vcfg, vocfg,
                             n_calib=16, batch=16, int8_transpose=False)

    out = {}

    # --- VQ decoder -------------------------------------------------------
    vq_flax = jax.jit(lambda p, g: vq.apply({"params": p}, g,
                                            method="decode_code"))
    out["vq.flax"] = timeit(vq_flax, vq_params, codes)
    spec = vq_flax(vq_params, codes)[..., 0]

    vq_int8 = jax.jit(lambda p, q, g: qz.decode_code_apply(
        p, vcfg, g, qz.Int8Convs(q)))
    out["vq.int8"] = timeit(vq_int8, vq_params, qs, codes)

    # --- vocoder ----------------------------------------------------------
    mel01 = jnp.clip((spec.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
    mel01 = jnp.swapaxes(mel01.astype(jnp.bfloat16 if on_tpu
                                      else jnp.float32), 1, 2)

    voc_flax = jax.jit(lambda p, m: melgan.apply({"params": p}, m))
    out["voc.flax"] = timeit(voc_flax, voc_params, mel01)

    voc_int8 = jax.jit(lambda p, q, m: qz.melgan_apply(
        p, vocfg, m, qz.Int8Convs(q)))
    out["voc.int8"] = timeit(voc_int8, voc_params, qs, mel01)
    out["voc.int8_noT"] = timeit(voc_int8, voc_params, qs_noT, mel01)

    voc_fexec = jax.jit(lambda p, m: qz.melgan_apply(
        p, vocfg, m, qz.FloatConvs()))
    out["voc.float_exec"] = timeit(voc_fexec, voc_params, mel01)

    print(json.dumps({k: round(v, 4) for k, v in out.items()}, indent=1))


if __name__ == "__main__":
    main()
