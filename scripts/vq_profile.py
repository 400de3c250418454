#!/usr/bin/env python
"""VQ-decoder stage profile on the real chip: WHERE do the 0.93 s go?

The round-2 split (scripts/detok_split.py + BENCH_NOTES.md) bounded the
VQ decoder at ~0.93 s (B=512, chunk 128) vs a ~0.3 s compute floor.  This
script times structurally truncated decoder variants (cumulative from the
mid-blocks up) and ablated bodies (no GroupNorm/swish, no attention) to
locate the gap before any hand-fusing is attempted.

Variants (each timed as full decode_code with a modified Decoder):
  full        — production decoder
  lvl<=K      — stop after level K's blocks (skip later/upper levels)
  no_norm     — GroupNorm+swish passes removed (convs + adds only)
  no_attn     — attention blocks skipped (mid + 53-resolution)

Usage: python scripts/vq_profile.py    (TPU; one job at a time)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from melspec_gpt_vqvae_tpu.configs import load_preset
from melspec_gpt_vqvae_tpu.models.vqvae import (AttnBlock, ResnetBlock,
                                                Upsample, VQModel, swish)

B = int(os.environ.get("VQP_BATCH", "128"))
ITERS = int(os.environ.get("VQP_ITERS", "5"))


class TruncDecoder(nn.Module):
    """Reference decoder body with ablation switches; parameter names match
    models/vqvae.py::Decoder so the same param tree applies."""

    cfg: object
    stop_level: int = -1       # -1 = run all levels; else stop BEFORE level K
    use_norm: bool = True
    use_attn: bool = True

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        num_res = len(cfg.ch_mult)
        curr_res = cfg.resolution // 2 ** (num_res - 1)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, name="conv_in")(z)
        h = self._res(h, None, "mid_block_1")
        if self.use_attn:
            h = AttnBlock(name="mid_attn_1")(h)
        h = self._res(h, None, "mid_block_2")
        for i_level in reversed(range(num_res)):
            if self.stop_level >= 0 and i_level < self.stop_level:
                return h
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = self._res(h, block_out,
                              f"up_{i_level}_block_{i_block}")
                if curr_res in cfg.attn_resolutions and self.use_attn:
                    h = AttnBlock(name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        if self.use_norm:
            h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6,
                             name="norm_out")(h)
            h = swish(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, name="conv_out")(h)

    def _res(self, x, out_ch, name):
        if self.use_norm:
            return ResnetBlock(out_ch, 0.0, name=name)(x)
        # conv-only body reusing the same param names
        in_ch = x.shape[-1]
        out_ch = out_ch or in_ch

        class _ConvOnly(nn.Module):
            @nn.compact
            def __call__(self, x):
                h = nn.Conv(out_ch, (3, 3), padding=1)(x)
                h = nn.Conv(out_ch, (3, 3), padding=1)(h)
                if in_ch != out_ch:
                    x = nn.Conv(out_ch, (1, 1), name="nin_shortcut")(x)
                return x + h

        return _ConvOnly(name=name)(x)


def main():
    exp = load_preset("GPT", "vas")
    vcfg = exp.vqvae
    on_tpu = jax.devices()[0].platform != "cpu"

    vq = VQModel(vcfg)
    key = jax.random.PRNGKey(0)
    params = vq.init(key, jnp.zeros((1, 80, 848, 1)))["params"]
    if on_tpu:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)

    rng = np.random.default_rng(0)
    codes = jnp.asarray(rng.integers(0, vcfg.num_embeddings,
                                     (B, vcfg.code_h, vcfg.code_w)),
                        jnp.int32)

    # quant lookup + post_quant (shared prefix of decode_code)
    def lookup(p, grid):
        b, h, w = grid.shape
        emb = p["quantize"]["embedding"]
        q = jnp.take(emb, grid.reshape(-1), axis=0).reshape(
            b, h, w, vcfg.embedding_dim)
        kern = p["post_quant_conv"]["kernel"]
        bias = p["post_quant_conv"]["bias"]
        return jax.lax.conv_general_dilated(
            q.astype(kern.dtype), kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    def sync(x):
        return float(jnp.sum(x[..., :1].astype(jnp.float32)))

    def timeit(fn, *a):
        sync(fn(*a))            # compile
        t = time.time()
        for _ in range(ITERS):
            r = fn(*a)
        sync(r)
        return (time.time() - t) / ITERS

    variants = [("full", {})]
    for k in (4, 3, 2, 1, 0):
        # stop_level=k runs mid + levels num_res-1 .. k (coarse -> fine)
        variants.append((f"levels_ge_{k}", {"stop_level": k}))
    variants += [("no_norm", {"use_norm": False}),
                 ("no_attn", {"use_attn": False})]

    results = {}
    for name, kw in variants:
        dec = TruncDecoder(vcfg, **kw)

        def run(p, grid):
            return dec.apply({"params": p["decoder"]}, lookup(p, grid))

        t = timeit(jax.jit(run), params, codes)
        results[name] = round(t, 4)
        print(json.dumps({"variant": name, "seconds": results[name],
                          "batch": B}), flush=True)

    print(json.dumps({"profile": results, "batch": B, "iters": ITERS}))


if __name__ == "__main__":
    main()
