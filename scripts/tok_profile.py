#!/usr/bin/env python
"""Tokenize-stage profile on the real chip: WHERE do the 0.53 s go?

bench.py's tokenize stage (B=512, chunk 128) = Pallas mel frontend ->
crop/scale -> VQ Encoder conv stack -> quant_conv -> f32-HIGHEST argmin.
It was the one e2e stage never profiled (gpt_decode and vq_decode+vocoder
both have measured rooflines in BENCH_NOTES.md).  This script times the
stage's pieces the same way scripts/vq_profile.py profiled the decoder:
cumulative structurally-truncated encoders (fine -> coarse, matching the
production param tree), plus mel-only, argmin-only, and ablated bodies.

Variants:
  mel          — waveform -> mel (Pallas kernel) + crop/scale only
  enc_lvl<=K   — conv_in + encoder levels 0..K (incl. that level's
                 downsample); K=4 adds mid + norm_out + conv_out
  enc_full     — full encoder + quant_conv (pre-quant latents)
  argmin       — VectorQuantizer nearest-index on precomputed latents
                 (f32 precision=HIGHEST — the code-index parity path)
  full         — the production tokenize body end-to-end
  no_norm      — encoder with GroupNorm+swish removed (convs+adds only)
  no_attn      — encoder with attention blocks skipped (res-53 + mid)

FLOP counts come from XLA cost analysis of each compiled variant
(exact for the conv stack; the mel matmuls are counted the same way).

Usage: python scripts/tok_profile.py        (TPU; one job at a time)
Env:   TOKP_BATCH (default 128), TOKP_ITERS (default 5)
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

from melspec_gpt_vqvae_tpu.configs import MelConfig, load_preset
from melspec_gpt_vqvae_tpu.models.vqvae import (AttnBlock, Downsample,
                                                ResnetBlock, VQModel, swish)
from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
from melspec_gpt_vqvae_tpu.ops.mel_pallas import waveform_to_mel_pallas
from melspec_gpt_vqvae_tpu.ops.vq import vq_nearest_index

B = int(os.environ.get("TOKP_BATCH", "128"))
ITERS = int(os.environ.get("TOKP_ITERS", "5"))


class TruncEncoder(nn.Module):
    """Reference encoder body with truncation/ablation switches; parameter
    names match models/vqvae.py::Encoder so the production tree applies."""

    cfg: object
    stop_level: int = -1       # -1 = full; else stop AFTER level K's downsample
    use_norm: bool = True
    use_attn: bool = True

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        curr_res = cfg.resolution
        h = nn.Conv(cfg.ch, (3, 3), padding=1, name="conv_in")(x)
        num_res = len(cfg.ch_mult)
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = self._res(h, block_out,
                              f"down_{i_level}_block_{i_block}")
                if curr_res in cfg.attn_resolutions and self.use_attn:
                    h = AttnBlock(name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
            if self.stop_level >= 0 and i_level >= self.stop_level:
                return h
        h = self._res(h, None, "mid_block_1")
        if self.use_attn:
            h = AttnBlock(name="mid_attn_1")(h)
        h = self._res(h, None, "mid_block_2")
        if self.use_norm:
            h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6,
                             name="norm_out")(h)
            h = swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(h)

    def _res(self, x, out_ch, name):
        if self.use_norm:
            return ResnetBlock(out_ch, 0.0, name=name)(x)
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
    mcfg = MelConfig()
    on_tpu = jax.devices()[0].platform != "cpu"

    vq = VQModel(vcfg)
    key = jax.random.PRNGKey(0)
    params = vq.init(key, jnp.zeros((1, 80, 848, 1)))["params"]
    if on_tpu:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)

    # same deterministic battery bench.py feeds (realistic code usage)
    from parity_check import make_battery
    battery = make_battery(mcfg.clip_samples)
    reps = -(-B // battery.shape[0])
    wav = jnp.asarray(np.tile(battery, (reps, 1))[:B], jnp.float32)

    mel_fn = waveform_to_mel_pallas if on_tpu else waveform_to_mel

    def mel_stage(w):
        mel = mel_fn(w, mcfg)[:, :, 6:854]
        x = (2.0 * mel - 1.0)[..., None]
        return x.astype(jnp.bfloat16) if on_tpu else x

    def sync(x):
        return float(jnp.sum(
            (x[..., :1] if x.ndim > 1 else x[:1]).astype(jnp.float32)))

    def timeit(fn, *a):
        compiled = jax.jit(fn).lower(*a).compile()
        try:
            flops = compiled.cost_analysis()["flops"]
        except Exception:
            flops = float("nan")
        sync(compiled(*a))      # warm (cache load / first dispatch)
        t = time.time()
        for _ in range(ITERS):
            r = compiled(*a)
        sync(r)
        return (time.time() - t) / ITERS, flops

    x_in = mel_stage(wav)       # host-computed input for encoder variants
    x_in = jax.device_put(jax.block_until_ready(x_in))

    results = {}

    def record(name, fn, *a):
        t, fl = timeit(fn, *a)
        gf_clip = fl / B / 1e9 if fl == fl else None
        tfs = fl / t / 1e12 if fl == fl else None
        results[name] = {"seconds": round(t, 4),
                         "gf_per_clip": round(gf_clip, 1) if gf_clip else None,
                         "tflops_per_s": round(tfs, 1) if tfs else None}
        print(json.dumps({"variant": name, **results[name], "batch": B}),
              flush=True)

    record("mel", lambda w: mel_stage(w), wav)

    for k in (0, 1, 2, 3):
        enc = TruncEncoder(vcfg, stop_level=k)
        record(f"enc_lvl<={k}",
               lambda x, e=enc: e.apply({"params": params["encoder"]}, x),
               x_in)

    enc_full = TruncEncoder(vcfg)

    def enc_quant(x):
        h = enc_full.apply({"params": params["encoder"]}, x)
        kern = params["quant_conv"]["kernel"]
        bias = params["quant_conv"]["bias"]
        return jax.lax.conv_general_dilated(
            h.astype(kern.dtype), kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias

    record("enc_full", enc_quant, x_in)

    z = jax.block_until_ready(jax.jit(enc_quant)(x_in))
    emb = params["quantize"]["embedding"]

    def argmin(zz, e):
        flat = zz.reshape(-1, vcfg.embedding_dim)
        return vq_nearest_index(flat, e)

    record("argmin", argmin, z, emb)

    def full(w):
        return vq.apply({"params": params}, mel_stage(w),
                        method="encode_to_indices")

    record("full", full, wav)

    for name, kw in (("no_norm", {"use_norm": False}),
                     ("no_attn", {"use_attn": False})):
        enc = TruncEncoder(vcfg, **kw)
        record(name,
               lambda x, e=enc: e.apply({"params": params["encoder"]}, x),
               x_in)

    print(json.dumps({"profile": results, "batch": B, "iters": ITERS,
                      "platform": jax.devices()[0].platform}))


if __name__ == "__main__":
    main()
