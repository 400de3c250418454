#!/usr/bin/env python
"""Quality gate for the int8 decode stage (models/quantized.py).

The int8 VQ-decoder + vocoder path runs int8 ACTIVATIONS through a GAN
decoder, so speed claims mean nothing until fidelity is shown.  Two
measurements, both on the chip:

  1. TRAINED decoder: train the tone-battery VQ-VAE (the
     scripts/quality_proof.py recipe — the only trained decoder
     available in this environment), tokenize the battery, decode the
     code grids through the bf16 stage and the calibrated int8 stage,
     and check (a) spectrogram SNR int8-vs-bf16, (b) that every clip's
     dominant mel bin — the QUALITY.json class signal — is unchanged,
     (c) waveform-level mel distance through the (random-weight)
     vocoder.
  2. REFERENCE-SCALE numerics: the production VQVAEConfig/VocoderConfig
     shapes with random weights, bf16 vs int8 SNR at B=32 (random nets
     are a *harder* quantisation target than trained ones — weight and
     activation ranges are uncalibrated by any loss).

Writes INT8_DECODE.json; asserts the gates.  The calibration uses the
same seeded-random-grid recipe as the production pipeline
(models/quantized.py::build_qstate) so the gate tests the shipped
configuration.

Usage: python scripts/int8_quality.py      (TPU; one job at a time)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
import numpy as np

from melspec_gpt_vqvae_tpu.configs import MelConfig, VocoderConfig, VQVAEConfig
from melspec_gpt_vqvae_tpu.models import quantized as qz
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator
from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
from melspec_gpt_vqvae_tpu.training.vqvae_task import VQVAETask
from quality_proof import make_tone_battery

VQ_STEPS = int(os.environ.get("IQ_VQ_STEPS", "300"))


def snr_db(ref, x):
    ref = np.asarray(ref, np.float32)
    err = np.asarray(x, np.float32) - ref
    return float(10 * np.log10(np.mean(ref ** 2) /
                               max(float(np.mean(err ** 2)), 1e-20)))


def to_bf16(t):
    return jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), t)


def decode_pair(vq_params, voc_params, vcfg, vocfg, grids, batch=16,
                **qkw):
    """(bf16 float stage, int8 stage) spec + wav for the same grids."""
    qstate = qz.build_qstate(vq_params, voc_params, vcfg, vocfg, **qkw)

    def _stage(ex_fn):
        def run(vqp, vocp, g):
            ex = ex_fn()
            spec = qz.decode_code_apply(vqp, vcfg, g, ex)[..., 0]
            mel01 = jnp.clip((spec.astype(jnp.float32) + 1) / 2, 0, 1)
            wav = qz.melgan_apply(vocp, vocfg,
                                  jnp.swapaxes(mel01.astype(spec.dtype),
                                               1, 2), ex)
            return spec.astype(jnp.float32), wav.astype(jnp.float32)
        return jax.jit(run)

    run_f = _stage(qz.FloatConvs)
    run_q = _stage(lambda: qz.Int8Convs(qstate))
    outs = {"f": [[], []], "q": [[], []]}
    for i in range(0, grids.shape[0], batch):
        g = grids[i:i + batch]
        for name, fn in (("f", run_f), ("q", run_q)):
            spec, wav = fn(vq_params, voc_params, g)
            outs[name][0].append(np.asarray(spec))
            outs[name][1].append(np.asarray(wav))
    return tuple(np.concatenate(x) for x in outs["f"] + outs["q"])


def sweep():
    """Reference-scale-only sweep over calibration percentile and the
    int8-transpose knob (the gate's hardest check) — picks the shipped
    DEFAULT_PERCENTILE.  The float/int8 decode programs are shape-stable
    across the sweep, so only the small calibration program recompiles."""
    vcfg_ref = VQVAEConfig()
    vocfg = VocoderConfig()
    vq_ref = to_bf16(VQModel(vcfg_ref).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 80, 848, 1)))["params"])
    voc_ref = to_bf16(MelGANGenerator(vocfg).init(
        jax.random.PRNGKey(3), jnp.zeros((1, 848, 80)))["params"])
    grids = jnp.asarray(
        np.random.default_rng(1).integers(0, vcfg_ref.num_embeddings,
                                          (32, 5, 53)), jnp.int32)
    rows = []
    for pct in (1.0, 0.9999, 0.999):
        for tr in (True, False):
            spec_f, wav_f, spec_q, wav_q = decode_pair(
                vq_ref, voc_ref, vcfg_ref, vocfg, grids,
                percentile=pct, int8_transpose=tr)
            row = {"percentile": pct, "int8_transpose": tr,
                   "spec_snr_db": round(snr_db(spec_f, spec_q), 1),
                   "wav_snr_db": round(snr_db(wav_f, wav_q), 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"sweep": rows}))


def main():
    t0 = time.time()
    mcfg = MelConfig()
    result = {}

    # ---- 1) trained battery decoder ------------------------------------
    wavs, labels, _ = make_tone_battery(mcfg)
    n = len(wavs)
    mel_fn = jax.jit(lambda w: waveform_to_mel(w, mcfg))
    mels = np.concatenate([np.asarray(mel_fn(jnp.asarray(wavs[i:i + 16])))
                           for i in range(0, n, 16)])[:, :, 6:854]
    x_all = (2.0 * mels - 1.0)[..., None].astype(np.float32)

    vcfg = VQVAEConfig(ch=32, num_res_blocks=1, z_channels=64,
                       embedding_dim=64, num_embeddings=128,
                       disc_start=10 ** 9, learning_rate=3e-4, disc_ndf=16)
    task = VQVAETask(vcfg)
    state = task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for step in range(VQ_STEPS):
        idxs = rng.integers(0, n, 8)
        state, log = task.train_step(state, jnp.asarray(x_all[idxs]))
        if step % 100 == 0:
            print(f"vqvae step {step}: rec {log['train/rec_loss']:.4f}",
                  flush=True)
    print(f"vqvae final rec {log['train/rec_loss']:.4f}", flush=True)

    vq = VQModel(vcfg)
    enc = jax.jit(lambda p, x: vq.apply({"params": p}, x,
                                        method="encode_to_indices"))
    grids = np.concatenate(
        [np.asarray(enc(state["ae_params"], jnp.asarray(x_all[i:i + 16])))
         for i in range(0, n, 16)])

    vocfg = VocoderConfig()
    voc_params = MelGANGenerator(vocfg).init(
        jax.random.PRNGKey(3), jnp.zeros((1, 848, 80)))["params"]
    vq_bf16 = to_bf16(state["ae_params"])
    voc_bf16 = to_bf16(voc_params)

    spec_f, wav_f, spec_q, wav_q = decode_pair(
        vq_bf16, voc_bf16, vcfg, vocfg, jnp.asarray(grids))

    # dominant mel bin per clip — the class signal QUALITY.json scores
    dom_f = ((spec_f + 1) / 2).mean(axis=2).argmax(axis=1)
    dom_q = ((spec_q + 1) / 2).mean(axis=2).argmax(axis=1)
    dom_match = float((dom_f == dom_q).mean())
    # waveform check: mel of the int8-vocoded wav vs of the bf16 one
    mw_f = np.concatenate([np.asarray(mel_fn(jnp.asarray(
        wav_f[i:i + 16, :mcfg.clip_samples]))) for i in range(0, n, 16)])
    mw_q = np.concatenate([np.asarray(mel_fn(jnp.asarray(
        wav_q[i:i + 16, :mcfg.clip_samples]))) for i in range(0, n, 16)])

    result["trained"] = {
        "spec_snr_db": round(snr_db(spec_f, spec_q), 1),
        "dominant_bin_match": dom_match,
        "wav_snr_db": round(snr_db(wav_f, wav_q), 1),
        "wav_mel_l1": round(float(np.abs(mw_f - mw_q).mean()), 5),
        "wav_mel_l1_ref_scale": round(float(np.abs(mw_f).mean()), 5),
        "vq_rec_loss": round(float(log["train/rec_loss"]), 4),
        "clips": int(n),
    }
    print(json.dumps(result["trained"]), flush=True)

    # ---- 1b) int8 ENCODER on the trained VQ: code-flip rate -------------
    # (tokenize-stage opt-in, BENCH_INT8_TOK; the extract_codes parity
    # path never uses it — this quantifies what the speed mode costs)
    x_bf16 = jnp.asarray(x_all, jnp.bfloat16)
    enc_qstate = qz.build_encode_qstate(vq_bf16, vcfg, x_bf16[:32])
    enc_f = jax.jit(lambda p, x: qz.encode_to_indices_apply(
        p, vcfg, x, qz.FloatConvs()))
    enc_q = jax.jit(lambda p, qs, x: qz.encode_to_indices_apply(
        p, vcfg, x, qz.Int8Convs(qs)))
    agree = []
    for i in range(0, n, 16):
        a = np.asarray(enc_f(vq_bf16, x_bf16[i:i + 16]))
        b = np.asarray(enc_q(vq_bf16, enc_qstate, x_bf16[i:i + 16]))
        agree.append((a == b).mean())
    result["encoder"] = {
        "code_agreement_vs_bf16": round(float(np.mean(agree)), 4),
        "note": "opt-in speed mode only; parity path stays f32-HIGHEST",
    }
    print(json.dumps(result["encoder"]), flush=True)

    # ---- 2) reference-scale random weights ------------------------------
    vcfg_ref = VQVAEConfig()
    vq_ref = VQModel(vcfg_ref).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 80, 848, 1)))["params"]
    grids_ref = jnp.asarray(
        np.random.default_rng(1).integers(0, vcfg_ref.num_embeddings,
                                          (32, 5, 53)), jnp.int32)
    spec_f, wav_f, spec_q, wav_q = decode_pair(
        to_bf16(vq_ref), voc_bf16, vcfg_ref, vocfg, grids_ref)
    result["reference_scale_random"] = {
        "spec_snr_db": round(snr_db(spec_f, spec_q), 1),
        "wav_snr_db": round(snr_db(wav_f, wav_q), 1),
        "batch": 32,
    }
    print(json.dumps(result["reference_scale_random"]), flush=True)

    result["minutes"] = round((time.time() - t0) / 60, 1)
    result["gates"] = {
        "trained_spec_snr_db_min": 25.0,
        "trained_dominant_bin_match_min": 0.95,
        "ref_scale_spec_snr_db_min": 20.0,
    }
    ok = (result["trained"]["spec_snr_db"] >= 25.0
          and result["trained"]["dominant_bin_match"] >= 0.95
          and result["reference_scale_random"]["spec_snr_db"] >= 20.0)
    result["pass"] = bool(ok)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "INT8_DECODE.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    assert ok, "int8 decode quality gate FAILED"


if __name__ == "__main__":
    if os.environ.get("IQ_SWEEP") == "1":
        sweep()
    else:
        main()
