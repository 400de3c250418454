#!/usr/bin/env python
"""Per-stage microbench of the fused vocoder resblock kernel vs the XLA
conv loop, at bench geometry (chunk B=128, bf16), all four stage widths
(C=64/32 run lane-folded).  Pinpoints where the fused path's time goes:
raw kernel vs +exact-edge fix."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp

from melspec_gpt_vqvae_tpu.models import quantized as qz
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANResnetBlock
from melspec_gpt_vqvae_tpu.ops import vocoder_pallas as vp

B = 128
ITERS = 5
DILS = (1, 3, 9)


def time_fn(fn, *args):
    out = fn(*args)
    s = float(jnp.sum(out[..., :1].astype(jnp.float32)))
    t0 = time.time()
    for _ in range(ITERS):
        out = fn(*args)
    s += float(jnp.sum(out[..., :1].astype(jnp.float32)))
    return (time.time() - t0) / ITERS


def main():
    results = {}
    for c, t in [(256, 6784), (128, 54272), (64, 108544), (32, 217088)]:
        key = jax.random.PRNGKey(c)
        x = jax.random.normal(key, (B, t, c), jnp.float32).astype(jnp.bfloat16)
        params = []
        for j in range(3):
            key, sub = jax.random.split(key)
            p = MelGANResnetBlock(c, dilation=3 ** j).init(
                sub, jnp.zeros((1, 64, c)))["params"]
            params.append(jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), p))
        packed = vp.pack_stack(params, jnp.bfloat16, DILS)

        xla = jax.jit(lambda xx, pp=params: qz.FloatConvs().resblock_stack(
            "s", xx, pp, DILS))
        kern = jax.jit(lambda xx, pk=packed: vp.fused_resblock_stack(
            xx, pk, DILS))
        full = jax.jit(lambda xx, pp=params: qz.FusedConvs().resblock_stack(
            "s", xx, pp, DILS))

        results[f"c{c}"] = {
            "xla_s": round(time_fn(xla, x), 4),
            "kernel_s": round(time_fn(kern, x), 4),
            "kernel_plus_edges_s": round(time_fn(full, x), 4),
        }
        print(json.dumps({f"c{c}": results[f"c{c}"]}), flush=True)
    print(json.dumps({"B": B, **results}))


if __name__ == "__main__":
    main()
