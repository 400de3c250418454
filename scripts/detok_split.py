#!/usr/bin/env python
"""Split the bench detokenize stage: VQ decode_code vs MelGAN vocoder,
chunked like bench.py (B=512, chunks of 128, bf16 params)."""

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
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator
from melspec_gpt_vqvae_tpu.models.vqvae import VQModel

B = int(os.environ.get("SPLIT_BATCH", "512"))
CHUNK = int(os.environ.get("SPLIT_CHUNK", "128"))
ITERS = 3


def main():
    exp = load_preset("GPT", "vas")
    vq = VQModel(exp.vqvae)
    vq_params = vq.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 80, 848, 1)))["params"]
    melgan = MelGANGenerator(exp.vocoder)
    voc_params = melgan.init(jax.random.PRNGKey(1),
                             jnp.zeros((1, 848, 80)))["params"]
    bf = lambda t: jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16), t)
    vq_params, voc_params = bf(vq_params), bf(voc_params)

    rng = np.random.default_rng(0)
    toks = jnp.asarray(rng.integers(0, exp.vqvae.num_embeddings, (B, 265)),
                       jnp.int32)

    def vq_dec(vqp, tokens):
        grid = tokens.reshape(-1, exp.vqvae.code_w, exp.vqvae.code_h)
        grid = jnp.swapaxes(grid, 1, 2)
        return vq.apply({"params": vqp}, grid, method="decode_code")[..., 0]

    def voc(vocp, spec):
        mel01 = jnp.clip((spec.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        return melgan.apply({"params": vocp},
                            jnp.swapaxes(mel01.astype(jnp.bfloat16), 1, 2))

    def voc_ex(ex):
        from melspec_gpt_vqvae_tpu.models import quantized as qz

        def f(vocp, spec):
            mel01 = jnp.clip((spec.astype(jnp.float32) + 1.0) / 2.0,
                             0.0, 1.0)
            return qz.melgan_apply(
                vocp, exp.vocoder,
                jnp.swapaxes(mel01.astype(jnp.bfloat16), 1, 2), ex)
        return f

    from melspec_gpt_vqvae_tpu.models import quantized as qz
    _vqd = jax.jit(vq_dec)
    _voc = jax.jit(voc)
    _vocx = jax.jit(voc_ex(qz.FloatConvs()))
    _vocf = jax.jit(voc_ex(qz.FusedConvs()))

    def chunked(fn, x, *p):
        return jnp.concatenate([fn(*p, x[i:i + CHUNK])
                                for i in range(0, x.shape[0], CHUNK)], 0)

    def sync(x):
        return float(jnp.sum(x[..., :1].astype(jnp.float32)))

    spec = chunked(_vqd, toks, vq_params)
    sync(spec)
    wav = chunked(_voc, spec, voc_params)
    sync(wav)

    t0 = time.time()
    for _ in range(ITERS):
        spec = chunked(_vqd, toks, vq_params)
    sync(spec)
    t_vq = (time.time() - t0) / ITERS

    t0 = time.time()
    for _ in range(ITERS):
        wav = chunked(_voc, spec, voc_params)
    sync(wav)
    t_voc = (time.time() - t0) / ITERS

    wav_x = chunked(_vocx, spec, voc_params)
    sync(wav_x)
    t0 = time.time()
    for _ in range(ITERS):
        wav_x = chunked(_vocx, spec, voc_params)
    sync(wav_x)
    t_vocx = (time.time() - t0) / ITERS

    wav_f = chunked(_vocf, spec, voc_params)
    sync(wav_f)
    t0 = time.time()
    for _ in range(ITERS):
        wav_f = chunked(_vocf, spec, voc_params)
    sync(wav_f)
    t_vocf = (time.time() - t0) / ITERS
    err = float(jnp.max(jnp.abs(wav.astype(jnp.float32)
                                - wav_f.astype(jnp.float32))))
    err_x = float(jnp.max(jnp.abs(wav.astype(jnp.float32)
                                  - wav_x.astype(jnp.float32))))

    print(json.dumps({"B": B, "chunk": CHUNK,
                      "vq_decode_s": round(t_vq, 4),
                      "vocoder_s": round(t_voc, 4),
                      "vocoder_float_exec_s": round(t_vocx, 4),
                      "vocoder_fused_s": round(t_vocf, 4),
                      "fused_max_abs_err": round(err, 6),
                      "float_exec_max_abs_err": round(err_x, 6)}))


if __name__ == "__main__":
    main()
