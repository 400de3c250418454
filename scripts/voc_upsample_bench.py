#!/usr/bin/env python
"""Microbench: MelGAN upsampler as flax ConvTranspose (lhs-dilated XLA
lowering) vs the exact polyphase width-2 conv
(ops/quant.py conv_transpose_polyphase), at bench geometry (chunk B=128,
bf16), all four stage shapes — plus the FULL vocoder stage both ways.

The lhs-dilated form streams a zero-stuffed input: at stride r the conv
does r x the useful MACs.  The polyphase form is one dense GEMM with
contraction 2*C_in and output r*C_out (MXU-shaped at the two r=8
stages).  This script records whether that matters in practice.
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
from jax import lax

from melspec_gpt_vqvae_tpu.configs import VocoderConfig
from melspec_gpt_vqvae_tpu.models import quantized as qz
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator

B = int(os.environ.get("VU_B", "128"))
ITERS = int(os.environ.get("VU_ITERS", "5"))
SCAN_ITERS = int(os.environ.get("VU_SCAN_ITERS", "8"))
# (T_in, C_in, C_out, r) per upsample stage at mel T=848 (bench geometry)
STAGES = [(848, 512, 256, 8), (6784, 256, 128, 8),
          (54272, 128, 64, 2), (108544, 64, 32, 2)]


def time_fn(fn, *args):
    out = fn(*args)
    s = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    s += float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.time() - t0) / ITERS


def time_scan(fn, x, iters=SCAN_ITERS):
    """One jitted lax.scan of ``iters`` dependent applications — the
    repo-sanctioned harness (CLAUDE.md: per-call timing of single jitted
    steps is unreliable through the tunnel).  A data-dependent scalar of
    each output feeds the next input so the body cannot be hoisted."""
    def step(c, _):
        y = fn(c)
        fb = jnp.mean(y[..., :1].astype(jnp.float32)) * 1e-6
        return c + fb.astype(c.dtype), ()

    run = jax.jit(lambda x0: lax.scan(step, x0, None, length=iters)[0])
    run(x).block_until_ready()                      # compile + warm
    t0 = time.time()
    run(x).block_until_ready()
    return (time.time() - t0) / iters


def main():
    results = {}
    for t, ci, co, r in STAGES:
        key = jax.random.PRNGKey(ci)
        x = jax.random.normal(key, (B, t, ci), jnp.float32).astype(
            jnp.bfloat16)
        import flax.linen as nn
        mod = nn.ConvTranspose(co, (2 * r,), strides=(r,), padding="VALID",
                               transpose_kernel=True)
        p = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16),
            mod.init(jax.random.PRNGKey(0), x)["params"])

        flax_ex, poly_ex = qz.FloatConvs(), qz.FloatConvs()
        poly_ex.polyphase_transpose = True
        fl = jax.jit(lambda xx, pp=p, rr=r, cc=co:
                     flax_ex.conv_transpose("u", xx, pp, cc, rr))
        po = jax.jit(lambda xx, pp=p, rr=r, cc=co:
                     poly_ex.conv_transpose("u", xx, pp, cc, rr))
        row = {"convtranspose_s": round(time_fn(fl, x), 4),
               "polyphase_s": round(time_fn(po, x), 4),
               "convtranspose_scan_s": round(time_scan(fl, x), 4),
               "polyphase_scan_s": round(time_scan(po, x), 4)}
        row["speedup"] = round(row["convtranspose_s"]
                               / max(row["polyphase_s"], 1e-9), 2)
        row["scan_speedup"] = round(row["convtranspose_scan_s"]
                                    / max(row["polyphase_scan_s"], 1e-9), 2)
        results[f"t{t}_c{ci}to{co}_r{r}"] = row
        print(json.dumps({f"t{t}_c{ci}to{co}_r{r}": row}), flush=True)

    # full vocoder stage A/B (mel -> waveform), fused resblocks as in
    # production, only the upsample form differing
    cfg = VocoderConfig()
    mel = jax.random.uniform(jax.random.PRNGKey(1), (B, 848, 80),
                             jnp.float32).astype(jnp.bfloat16)
    params = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16),
        MelGANGenerator(cfg).init(jax.random.PRNGKey(2),
                                  jnp.zeros((1, 64, 80)))["params"])
    for name, poly in (("stage_convtranspose", False),
                       ("stage_polyphase", True)):
        ex = qz.FusedConvs()
        ex.polyphase_transpose = poly
        fn = jax.jit(lambda m, pp=params, e=ex:
                     qz.melgan_apply(pp, cfg, m, e))
        results[name] = {"s": round(time_fn(fn, mel), 4),
                         "scan_s": round(time_scan(
                             lambda m: qz.melgan_apply(params, cfg, m, ex),
                             mel), 4)}
        print(json.dumps({name: results[name]}), flush=True)
    if "stage_polyphase" in results:
        results["stage_speedup"] = round(
            results["stage_convtranspose"]["s"]
            / max(results["stage_polyphase"]["s"], 1e-9), 3)
        results["stage_scan_speedup"] = round(
            results["stage_convtranspose"]["scan_s"]
            / max(results["stage_polyphase"]["scan_s"], 1e-9), 3)
    print(json.dumps({"B": B, **results}))


if __name__ == "__main__":
    main()
