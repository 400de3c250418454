#!/usr/bin/env python
"""End-to-end LEARNING proof on the chip: the full loop learns, not
merely runs.

No checked-in artifact proves the pipeline can LEARN (tests prove
shapes/parity/loss-decrease on random nets).  This script closes that:

  1. build a deterministic tone battery (4 classes = 4 frequency bands,
     16 base tones x 4 jittered variants = 64 clips) -> mels;
  2. train a small-but-real VQ-VAE: recon+VQ phase, then the FULL
     adversarial phase (disc_start reached on-chip: hinge discriminator
     training, adaptive generator weight from the two-grad norm ratio,
     reference big_model_attn_gan.py:643-844) — gated on the disc loss
     moving, d_weight staying inside its clip range, and recon quality
     not collapsing;
  3. tokenize the battery with the TRAINED VQ-VAE -> (5, 53) code grids;
  4. overfit a small class-conditional GPT on the codes
     (reference loop: Lit_minGPT, transformer/minGPT.py:216-665);
  5. sample class-conditionally, decode samples through the trained VQ
     decoder, and check the dominant mel bin of each generated
     spectrogram lands in the conditioning class's frequency band.

Writes QUALITY.json {accuracy, per_class, ...}; asserts accuracy >= 0.7
(chance = 0.25).

Usage: python scripts/quality_proof.py     (TPU; one job at a time;
~10-20 min including small-model compiles)
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

from melspec_gpt_vqvae_tpu.configs import (GPTConfig, MelConfig, VQVAEConfig)
from melspec_gpt_vqvae_tpu.models.gpt import (class_embed, gpt_generate,
                                              init_gpt_params)
from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask, tokens_from_batch
from melspec_gpt_vqvae_tpu.training.vqvae_task import VQVAETask

SR = 22050
N_CLASSES = 4
TONES_PER_CLASS = 4
JITTERS = 4
VQ_STEPS = int(os.environ.get("QP_VQ_STEPS", "300"))
GAN_STEPS = int(os.environ.get("QP_GAN_STEPS", "150"))
GPT_STEPS = int(os.environ.get("QP_GPT_STEPS", "400"))
SAMPLES_PER_CLASS = int(os.environ.get("QP_SAMPLES", "8"))


def make_tone_battery(mcfg):
    """64 clips: 4 frequency-band classes x 4 tones x 4 jittered variants."""
    rng = np.random.default_rng(7)
    t = np.arange(mcfg.clip_samples, dtype=np.float64) / SR
    freqs = np.geomspace(150.0, 4000.0, N_CLASSES * TONES_PER_CLASS)
    wavs, labels, base_freqs = [], [], []
    for i, f in enumerate(freqs):
        for j in range(JITTERS):
            amp = 0.3 * (1.0 + 0.1 * rng.standard_normal())
            w = amp * np.sin(2 * np.pi * f * (1 + 0.002 * j) * t)
            w += 0.01 * rng.standard_normal(len(t))
            wavs.append(w)
            labels.append(i // TONES_PER_CLASS)
            base_freqs.append(f)
    return (np.stack(wavs).astype(np.float32), np.asarray(labels, np.int32),
            np.asarray(base_freqs))


def wavs_to_training_mels(wavs, mcfg):
    """Shared prep: device mels, crop to 848 frames, NHWC in [-1, 1].
    Returns (mels01 (N,80,848), x_all (N,80,848,1)) — the input format of
    every proof battery (quality_fullscale / spec_measured / vqgan)."""
    n = len(wavs)
    mel_fn = jax.jit(lambda w: waveform_to_mel(w, mcfg))
    mels = np.concatenate([np.asarray(mel_fn(jnp.asarray(wavs[i:i + 16])))
                           for i in range(0, n, 16)])         # (N, 80, 860)
    mels = mels[:, :, 6:854]                                  # crop 848
    return mels, (2.0 * mels - 1.0)[..., None].astype(np.float32)


def small_codec_cfg(disc_start):
    """The reduced-geometry proof codec every battery trains (ch 32,
    1 res block, 64-d z, 128 codes) — geometry shared so a recipe fix
    lands once."""
    from melspec_gpt_vqvae_tpu.configs import VQVAEConfig
    return VQVAEConfig(ch=32, num_res_blocks=1, z_channels=64,
                       embedding_dim=64, num_embeddings=128,
                       disc_start=disc_start, learning_rate=3e-4,
                       disc_ndf=16)


def train_codec(x_all, vcfg, steps, rng, bs=8, tag="vqvae"):
    """Train a VQ codec on prepared NHWC mels (the shared proof recipe).
    Consumes ``rng`` exactly ``steps`` draws; returns
    (vq_task, state, last_log)."""
    vq_task = VQVAETask(vcfg)
    state = vq_task.init_state(jax.random.PRNGKey(0))
    n = len(x_all)
    log = {}
    for step in range(steps):
        idxs = rng.integers(0, n, bs)
        state, log = vq_task.train_step(state, jnp.asarray(x_all[idxs]))
        if step % 50 == 0:
            print(f"{tag} step {step}: rec {log['train/rec_loss']:.4f} "
                  f"perp {log['train/perplexity']:.1f}", flush=True)
    return vq_task, state, log


def encode_grids(vcfg, ae_params, x_all):
    """Tokenize prepared mels with a trained codec -> (N, 5, 53) int32."""
    vq = VQModel(vcfg)
    enc = jax.jit(lambda p, x: vq.apply({"params": p}, x,
                                        method="encode_to_indices"))
    return np.concatenate(
        [np.asarray(enc(ae_params, jnp.asarray(x_all[i:i + 16])))
         for i in range(0, len(x_all), 16)]).astype(np.int32)


def main():
    t_start = time.time()
    mcfg = MelConfig()
    wavs, labels, base_freqs = make_tone_battery(mcfg)
    n = len(wavs)

    # ---- mels (device) -------------------------------------------------
    mels, x_all = wavs_to_training_mels(wavs, mcfg)

    # dominant mel bin per class (ground truth bands from the INPUT mels):
    # argmax of the time-averaged spectrum
    dom = mels.mean(axis=2).argmax(axis=1)
    class_bins = {c: sorted(set(int(d) for d, l in zip(dom, labels)
                                if l == c)) for c in range(N_CLASSES)}
    print(f"class dominant-bin bands: {class_bins}", flush=True)

    # ---- 2) train a small-but-real VQ-VAE: recon phase, then the FULL
    # adversarial phase (disc_start = VQ_STEPS, so the discriminator and
    # the adaptive generator weight go live on-chip; reference threshold
    # semantics: big_model_attn_gan.py:596, hinge disc :742-766,
    # adaptive weight :643-660)
    vcfg = small_codec_cfg(disc_start=VQ_STEPS)
    rng = np.random.default_rng(0)
    bs = 8
    vq_task, state, log = train_codec(x_all, vcfg, VQ_STEPS, rng, bs=bs)
    rec_pre_gan = float(log["train/rec_loss"])
    print(f"vqvae recon-phase final rec {rec_pre_gan:.4f}", flush=True)

    # ---- 2b) adversarial phase: disc_factor flips to 1.0 at step ==
    # VQ_STEPS.  Gates: (a) the discriminator LEARNS (hinge loss drops
    # from its untrained ~1.0 toward separating real/fake), (b) the
    # adaptive generator weight stays strictly inside its clip range
    # (a pinned d_weight means the two-grad ratio saturated), (c) recon
    # quality does not collapse under the adversarial pressure.
    gan_logs = []
    for step in range(GAN_STEPS):
        idxs = rng.integers(0, n, bs)
        state, log = vq_task.train_step(state, jnp.asarray(x_all[idxs]))
        gan_logs.append(log)
        if step % 25 == 0:
            print(f"gan step {step}: rec {log['train/rec_loss']:.4f} "
                  f"disc {log['train/disc_loss']:.4f} "
                  f"d_weight {log['train/d_weight']:.3g} "
                  f"g {log['train/g_loss']:.4f} "
                  f"lr/lf {log['train/logits_real']:.3f}/"
                  f"{log['train/logits_fake']:.3f}", flush=True)
    rec_final = float(gan_logs[-1]["train/rec_loss"])
    d_first = float(gan_logs[0]["train/disc_loss"])
    d_last5 = float(np.mean([g["train/disc_loss"] for g in gan_logs[-5:]]))
    dw_vals = np.asarray([g["train/d_weight"] for g in gan_logs])
    margin_last5 = float(np.mean(
        [g["train/logits_real"] - g["train/logits_fake"]
         for g in gan_logs[-5:]]))
    gan_gates = {
        "disc_factor_live": float(gan_logs[-1]["train/disc_factor"]) == 1.0,
        # hinge loss starts ~1.0 on an untrained disc (logits ~ 0); a
        # learning disc separates real from fake -> loss drops and the
        # real-fake logit margin opens
        "disc_learns": d_last5 < d_first and margin_last5 > 0.0,
        "d_weight_in_range": bool(
            np.all(dw_vals > vcfg.min_adapt_weight)
            and np.all(dw_vals < vcfg.max_adapt_weight * vcfg.disc_weight)),
        "recon_not_collapsed": rec_final <= max(1.5 * rec_pre_gan,
                                                rec_pre_gan + 0.05),
    }
    gan_out = {
        "disc_loss": {"first": round(d_first, 4),
                      "last5_mean": round(d_last5, 4)},
        "logit_margin_last5": round(margin_last5, 4),
        "d_weight": {"min": round(float(dw_vals.min()), 5),
                     "max": round(float(dw_vals.max()), 5),
                     "final": round(float(dw_vals[-1]), 5)},
        "rec_loss": {"pre_gan": round(rec_pre_gan, 4),
                     "final": round(rec_final, 4)},
        "steps": GAN_STEPS, "gates": gan_gates,
    }
    print(f"vqvae GAN phase: {json.dumps(gan_out)}", flush=True)
    for k, ok in gan_gates.items():
        assert ok, f"GAN-phase gate failed: {k} ({gan_out})"

    # ---- 3) tokenize with the trained VQ-VAE ---------------------------
    vq = VQModel(vcfg)
    grids = encode_grids(vcfg, state["ae_params"], x_all)    # (N, 5, 53)

    # ---- 4) overfit a small class-conditional GPT ----------------------
    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               TrainConfig)
    gcfg = GPTConfig(vocab_size=128, block_size=266, n_layer=4, n_head=4,
                     n_embd=128, class_size=N_CLASSES,
                     embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.1)
    exp = ExperimentConfig(model=gcfg,
                           train=TrainConfig(learning_rate=3e-4, epochs=1,
                                             batch_size=16),
                           data=DataConfig(batch_size=16))
    task = GPTTask(exp)
    gstate = task.init_state(0)
    key = jax.random.PRNGKey(1)
    l0 = l = float("nan")
    for step in range(GPT_STEPS):
        idxs = rng.integers(0, n, 16)
        batch = {"codes": grids[idxs], "target": labels[idxs]}
        key, r = jax.random.split(key)
        gstate, loss = task.train_step(gstate, batch, r)
        if step % 100 == 0:
            l = float(loss)
            if step == 0:
                l0 = l
            print(f"gpt step {step}: loss {l:.4f}", flush=True)
    l_final = float(loss)
    print(f"gpt loss {l0:.3f} -> {l_final:.3f}", flush=True)

    # ---- 5) class-conditional sampling + decode + spectral check -------
    dec = jax.jit(lambda p, g: vq.apply({"params": p}, g,
                                        method="decode_code"))
    results, correct = [], 0
    per_class = {}
    for c in range(N_CLASSES):
        cls = jnp.full((SAMPLES_PER_CLASS,), c, jnp.int32)
        toks = task.sample(gstate["params"], jax.random.fold_in(key, c),
                           cls, steps=265, temperature=0.9, top_k=16)
        grid = np.asarray(toks).reshape(-1, 53, 5).swapaxes(1, 2)
        spec = np.asarray(dec(state["ae_params"],
                              jnp.asarray(grid)))[..., 0]     # (S, 80, 848)
        mel01 = np.clip((spec + 1.0) / 2.0, 0.0, 1.0)
        dom_gen = mel01.mean(axis=2).argmax(axis=1)
        hits = 0
        for d in dom_gen:
            dist = min(abs(int(d) - b) for b in class_bins[c])
            other = min(abs(int(d) - b) for cc, bins in class_bins.items()
                        if cc != c for b in bins)
            ok = dist <= 3 and dist <= other
            hits += int(ok)
        per_class[c] = hits / SAMPLES_PER_CLASS
        correct += hits
        results.append({"class": c, "dom_bins": [int(d) for d in dom_gen],
                        "band": class_bins[c], "acc": per_class[c]})
        print(f"class {c}: dom bins {sorted(int(d) for d in dom_gen)} "
              f"band {class_bins[c]} acc {per_class[c]:.2f}", flush=True)

    acc = correct / (N_CLASSES * SAMPLES_PER_CLASS)
    out = {
        "accuracy": round(acc, 3),
        "chance": round(1.0 / N_CLASSES, 3),
        "per_class": {str(k): round(v, 3) for k, v in per_class.items()},
        "vq_rec_loss_final": round(float(rec_final), 4),
        "gan_phase": gan_out,
        "gpt_loss": {"start": round(l0, 3), "final": round(l_final, 3)},
        "vq_steps": VQ_STEPS, "gpt_steps": GPT_STEPS,
        "clips": n, "samples_per_class": SAMPLES_PER_CLASS,
        "minutes": round((time.time() - t_start) / 60, 1),
        "detail": results,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "QUALITY.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "detail"}))
    assert acc >= 0.7, f"class-conditional accuracy {acc} < 0.7"


if __name__ == "__main__":
    main()
