#!/usr/bin/env python
"""Speculative decoding measured END-TO-END on a trained pair — the run
that replaces the round-3 projection (acceptance measured on a trained
pair x round cost measured on random weights were only ever MULTIPLIED;
this script times plain vs speculative wall clock with the SAME trained
target/draft in one process).

Recipe: the spec_acceptance.py battery at REFERENCE GEOMETRY — train a
small VQ-VAE on 64 tone clips, tokenize, then train a VAS-geometry
target GPT (24L/16H/1024d, the config the deployment serves;
/root/reference/config/config_GPT_vas.py) and a 2L/1024d draft on the
same codes.  Then, with deployment dtypes (bf16 params, int8 KV cache,
int8 streamed decode weights), measure:

  * plain KV-cached gpt_generate wall clock at B=1 (the latency regime
    speculative decoding exists for; the reference's sampling loop this
    feature attacks is minGPT.py:293-360);
  * gpt_speculative_generate wall clock at the same B for several gamma,
    with the REALIZED acceptance of the trained pair;
  * the measured speedup = plain_ms / spec_ms (no cost model).

Merges {plain_ms, spec_ms, measured_speedup, realized_acceptance} into
SPEC_ACCEPTANCE.json.  Caveat kept honest: tones are easy data, so the
acceptance (and therefore the speedup) is an optimistic ceiling, not a
VAS-trained number — but it is a MEASURED ceiling on the deployment
geometry, not arithmetic.

Usage: python scripts/spec_measured.py   (TPU, one job; ~20-40 min with
       cold compiles through the tunnel)
"""

import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
sys.path.insert(0, os.path.join(_ROOT, "scripts"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np

from quality_proof import (N_CLASSES, SR, encode_grids, make_tone_battery,
                           small_codec_cfg, train_codec,
                           wavs_to_training_mels)
from spec_acceptance import train_gpt

from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                           GPTConfig, MelConfig,
                                           TrainConfig)
from melspec_gpt_vqvae_tpu.models.gpt import class_embed, gpt_generate
from melspec_gpt_vqvae_tpu.models.speculative import \
    gpt_speculative_generate

VQ_STEPS = int(os.environ.get("SM_VQ_STEPS", "300"))
GPT_STEPS = int(os.environ.get("SM_GPT_STEPS", "400"))
ITERS = int(os.environ.get("SM_ITERS", "8"))
BATCH = int(os.environ.get("SM_BATCH", "1"))
TARGET_LAYERS = int(os.environ.get("SM_TARGET_LAYERS", "24"))
DRAFT_LAYERS = int(os.environ.get("SM_DRAFT_LAYERS", "2"))
EMBD = int(os.environ.get("SM_EMBD", "1024"))      # CPU smoke: shrink
HEADS = int(os.environ.get("SM_HEADS", "16"))
# SM_CORPUS=hard swaps the easy tone battery for the mixture corpus
# (noise bands / chirps / AM tones / chords, high intra-class variance):
# the realistic-acceptance run the tone number is only a ceiling for.
# Results land under SPEC_ACCEPTANCE.json["measured_e2e_hard"].
CORPUS = os.environ.get("SM_CORPUS", "tones")


def make_hard_battery(mcfg, seed=11):
    """64 clips, 4 classes of STRUCTURED-BUT-VARIED audio — much harder
    than pure tones (each clip draws random per-instance parameters, so
    the token corpus has real conditional entropy and a draft model
    cannot memorise it):

      0: band-limited noise bursts (random band + attack envelope)
      1: linear chirps (random start/end freqs inside a class band)
      2: AM tones (random carrier + modulation rate) over a noise floor
      3: two-tone chords with click transients
    """
    import numpy as np
    sr = SR
    rng = np.random.default_rng(seed)
    t = np.arange(mcfg.clip_samples, dtype=np.float64) / sr
    wavs, labels = [], []
    per_class = 16
    for c in range(N_CLASSES):
        for _ in range(per_class):
            if c == 0:
                lo = rng.uniform(200, 1200)
                hi = lo * rng.uniform(1.3, 2.0)
                x = rng.standard_normal(len(t))
                spec = np.fft.rfft(x)
                f = np.fft.rfftfreq(len(t), 1.0 / sr)
                spec[(f < lo) | (f > hi)] = 0.0
                w = np.fft.irfft(spec, len(t))
                w *= 1.0 - np.exp(-t / rng.uniform(0.05, 0.5))
                w = 0.3 * w / (np.abs(w).max() + 1e-9)
            elif c == 1:
                f0 = rng.uniform(300, 800)
                f1 = f0 * rng.uniform(1.5, 4.0)
                ph = 2 * np.pi * (f0 * t + (f1 - f0) * t ** 2 / (2 * t[-1]))
                w = 0.3 * np.sin(ph + rng.uniform(0, 2 * np.pi))
            elif c == 2:
                fc = rng.uniform(800, 2500)
                fm = rng.uniform(2.0, 20.0)
                depth = rng.uniform(0.4, 1.0)
                w = (1 + depth * np.sin(2 * np.pi * fm * t)) / 2
                w = 0.25 * w * np.sin(2 * np.pi * fc * t)
                w += 0.02 * rng.standard_normal(len(t))
            else:
                fa = rng.uniform(400, 1000)
                fb = fa * rng.choice([1.25, 1.5, 2.0])
                w = 0.15 * (np.sin(2 * np.pi * fa * t)
                            + np.sin(2 * np.pi * fb * t))
                for _ in range(rng.integers(3, 9)):
                    i = rng.integers(0, len(t) - 200)
                    w[i:i + 200] += 0.3 * np.hanning(200) \
                        * rng.choice([-1.0, 1.0])
            w += 0.01 * rng.standard_normal(len(t))
            wavs.append(w)
            labels.append(c)
    return (np.stack(wavs).astype(np.float32),
            np.asarray(labels, np.int32), None)


def main():
    t_start = time.time()
    on_tpu = jax.devices()[0].platform not in ("cpu",)
    mcfg = MelConfig()
    battery = make_hard_battery if CORPUS == "hard" else make_tone_battery
    wavs, labels, _ = battery(mcfg)
    n = len(wavs)

    _, x_all = wavs_to_training_mels(wavs, mcfg)

    vcfg = small_codec_cfg(disc_start=10 ** 9)
    rng = np.random.default_rng(0)
    _, state, _ = train_codec(x_all, vcfg, VQ_STEPS, rng)
    grids = encode_grids(vcfg, state["ae_params"], x_all)

    # VAS geometry (config_GPT_vas.py: 24L/16H/1024d, vocab 128, block 266)
    # with a trainable-on-tones lr/bs; the DRAFT keeps the target's width
    # (weight-streaming-friendly) at 2 layers
    def exp_for(layers):
        # remat + mixed precision: without them a 24L/1024d f32 train step
        # at bs 8 blows HBM (measured: remote-compile OOM) — same policy
        # the VAS VAE preset carries (configs.py)
        g = GPTConfig(vocab_size=128, block_size=266, n_layer=layers,
                      n_head=HEADS, n_embd=EMBD, class_size=N_CLASSES,
                      embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.1,
                      remat=True, remat_policy="attn",
                      mixed_precision=True)
        return ExperimentConfig(model=g,
                                train=TrainConfig(learning_rate=3e-4,
                                                  epochs=1, batch_size=8),
                                data=DataConfig(batch_size=8))

    print(f"training target GPT ({TARGET_LAYERS}L/{EMBD}d):", flush=True)
    t_exp = exp_for(TARGET_LAYERS)
    t_params, t_loss = train_gpt(t_exp, grids, labels, rng, GPT_STEPS, 0)
    print(f"training draft GPT ({DRAFT_LAYERS}L/{EMBD}d):", flush=True)
    d_exp = exp_for(DRAFT_LAYERS)
    d_params, d_loss = train_gpt(d_exp, grids, labels, rng, GPT_STEPS, 1)

    # deployment policy for the timed phase (what serve.py builds on TPU)
    tcfg = t_exp.model.replace(
        dtype="bfloat16" if on_tpu else "float32",
        cache_dtype="int8" if on_tpu else "auto",
        decode_weight_dtype="int8" if on_tpu else "auto")
    dcfg = d_exp.model.replace(
        dtype=tcfg.dtype, cache_dtype=tcfg.cache_dtype,
        decode_weight_dtype=tcfg.decode_weight_dtype)
    if on_tpu:
        cast = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), t)
        t_params, d_params = cast(t_params), cast(d_params)

    cls = jnp.zeros((BATCH,), jnp.int32)
    cond = class_embed(t_params, cls)
    d_cond = class_embed(d_params, cls)
    steps, top_k = 265, 16

    def sync(out):
        toks = out[0] if isinstance(out, tuple) else out
        return float(jnp.sum(toks[..., -8:].astype(jnp.float32)))

    def timed(fn):
        sync(fn(jax.random.PRNGKey(99)))    # compile + warm
        t0 = time.time()
        out = None
        for i in range(ITERS):
            out = fn(jax.random.PRNGKey(i))
            sync(out)
        return (time.time() - t0) / ITERS, out

    plain_s, _ = timed(lambda k: gpt_generate(
        t_params, tcfg, k, cond, steps=steps, top_k=top_k,
        temperature=0.9, segments=8))
    print(json.dumps({"mode": "plain", "ms": round(plain_s * 1e3, 1)}),
          flush=True)

    gammas = {}
    for g in (2, 4, 8):
        s, (toks, stats) = timed(lambda k: gpt_speculative_generate(
            t_params, tcfg, d_params, dcfg, k, cond, d_cond,
            steps=steps, gamma=g, temperature=0.9, top_k=top_k))
        row = {"spec_ms": round(s * 1e3, 1),
               "measured_speedup": round(plain_s / s, 2),
               "realized_acceptance": round(
                   float(stats["accepted"]) / max(1.0,
                                                  float(stats["drafted"])),
                   3),
               "rounds": int(stats["rounds"])}
        gammas[str(g)] = row
        print(json.dumps({"gamma": g, **row}), flush=True)

    best = max(gammas.values(), key=lambda r: r["measured_speedup"])
    measured = {
        "platform": jax.devices()[0].platform,
        "batch": BATCH,
        "target": f"{TARGET_LAYERS}L/{EMBD}d, "
                  f"loss {t_loss:.3f}",
        "draft": f"{DRAFT_LAYERS}L/{EMBD}d, loss {d_loss:.3f}",
        "plain_ms": round(plain_s * 1e3, 1),
        "spec_ms": best["spec_ms"],
        "measured_speedup": best["measured_speedup"],
        "realized_acceptance": best["realized_acceptance"],
        "per_gamma": gammas,
        "sampling": {"temperature": 0.9, "top_k": top_k},
        "minutes": round((time.time() - t_start) / 60, 1),
        "corpus": CORPUS,
        "caveat": (
            "trained on the tone battery (easy data) -> the acceptance, "
            "and so the speedup, is a MEASURED optimistic ceiling at "
            "deployment geometry (measured_e2e_hard quantifies the gap)"
            if CORPUS != "hard" else
            "mixture corpus (noise bands/chirps/AM/chords, per-clip "
            "random parameters): real conditional entropy in the token "
            "stream — the realistic-acceptance companion to the tone "
            "ceiling in measured_e2e"),
    }
    path = os.path.join(_ROOT, "SPEC_ACCEPTANCE.json")
    out = {}
    if os.path.isfile(path):
        with open(path) as f:
            out = json.load(f)
    out["measured_e2e_hard" if CORPUS == "hard" else "measured_e2e"] \
        = measured
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(measured))


if __name__ == "__main__":
    main()
