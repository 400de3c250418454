#!/usr/bin/env python
"""REFERENCE-SCALE VQ-GAN on-chip proof.

QUALITY.json's GAN-phase proof runs at reduced geometry (ch 32, 1 res
block, no attention, ndf 16).  This battery runs the ACTUAL VQVAEConfig
preset — ch 128, ch_mult (1,1,2,2,4), 2 res blocks, attention at 53,
z 256, NLayerDiscriminator ndf 64 / 3 layers, the geometry of
/root/reference/vqvae/big_model_attn_gan.py:521-602 — through both
phases on-chip: recon+VQ, then the adversarial phase (hinge disc,
adaptive generator weight from the two-grad norm ratio).  Geometry is
untouched; only the schedule knobs move (disc_start pulled in so the
GAN phase is reached inside the run, steps shortened).

Gates: recon learns; disc learns (loss drops, real/fake margin opens);
d_weight strictly inside its clip range; recon does not collapse under
adversarial pressure — judged on a FIXED eval forward, not noisy bs-4
training batches (at reference scale the generator visibly trades L1
for realism when the disc comes online; <=2x pre-GAN eval recon is the
"transient, not collapse" bound); everything finite.

Writes QUALITY_VQGAN.json.
Usage: python scripts/quality_vqgan_fullscale.py  (TPU, one job;
~7-10 min compile for the grad-of-grad adaptive weight + ~5 min steps)
"""

import dataclasses
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

from quality_proof import make_tone_battery, wavs_to_training_mels

from melspec_gpt_vqvae_tpu.configs import MelConfig, VQVAEConfig
from melspec_gpt_vqvae_tpu.training.vqvae_task import VQVAETask

RECON_STEPS = int(os.environ.get("QVF_RECON_STEPS", "200"))
GAN_STEPS = int(os.environ.get("QVF_GAN_STEPS", "200"))
BS = int(os.environ.get("QVF_BS", "4"))


def main():
    t_start = time.time()
    mcfg = MelConfig()
    wavs, labels, _ = make_tone_battery(mcfg)
    n = len(wavs)
    _, x_all = wavs_to_training_mels(wavs, mcfg)
    # fixed held-out-style eval batch: recon quality is judged on THIS
    # deterministic forward, not on noisy bs-4 training batches (first
    # attempt gated on a 5-train-batch mean and tripped on batch noise:
    # per-batch rec at bs 4 swings ~2x on this battery)
    x_eval = jnp.asarray(x_all[:16])

    # THE preset geometry; only schedule knobs replaced.
    vcfg = VQVAEConfig(disc_start=RECON_STEPS)
    assert (vcfg.ch, vcfg.ch_mult, vcfg.num_res_blocks, vcfg.z_channels,
            vcfg.disc_ndf, vcfg.disc_num_layers) \
        == (128, (1, 1, 2, 2, 4), 2, 256, 64, 3), \
        "preset drifted from reference scale"
    task = VQVAETask(vcfg)
    state = task.init_state(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(l.shape)) for l in
                   jax.tree_util.tree_leaves(state["ae_params"]))
    print(f"VQ-GAN preset: {n_params/1e6:.1f}M AE params, bs {BS}, "
          f"lr {vcfg.learning_rate}", flush=True)

    rng = np.random.default_rng(0)
    rec_first = None
    for step in range(RECON_STEPS):
        idxs = rng.integers(0, n, BS)
        state, log = task.train_step(state, jnp.asarray(x_all[idxs]))
        if step == 0:
            rec_first = float(log["train/rec_loss"])
        if step % 50 == 0:
            print(f"recon step {step}: rec {log['train/rec_loss']:.4f} "
                  f"perp {log['train/perplexity']:.1f}", flush=True)
    rec_pre_gan = float(log["train/rec_loss"])
    eval_pre = task.eval_step(state, x_eval)[0]["val/rec_loss"]
    print(f"recon phase: rec {rec_first:.4f} -> {rec_pre_gan:.4f} "
          f"(eval {eval_pre:.4f})", flush=True)

    gan_logs = []
    for step in range(GAN_STEPS):
        idxs = rng.integers(0, n, BS)
        state, log = task.train_step(state, jnp.asarray(x_all[idxs]))
        gan_logs.append(log)
        if step % 25 == 0:
            print(f"gan step {step}: rec {log['train/rec_loss']:.4f} "
                  f"disc {log['train/disc_loss']:.4f} "
                  f"d_weight {log['train/d_weight']:.3g} "
                  f"lr/lf {log['train/logits_real']:.3f}/"
                  f"{log['train/logits_fake']:.3f}", flush=True)

    eval_post = task.eval_step(state, x_eval)[0]["val/rec_loss"]
    rec_final = float(np.mean([g["train/rec_loss"] for g in gan_logs[-5:]]))
    d_first = float(gan_logs[0]["train/disc_loss"])
    d_last5 = float(np.mean([g["train/disc_loss"] for g in gan_logs[-5:]]))
    dw = np.asarray([float(g["train/d_weight"]) for g in gan_logs])
    margin_last5 = float(np.mean(
        [g["train/logits_real"] - g["train/logits_fake"]
         for g in gan_logs[-5:]]))
    all_scalars = [float(g[k]) for g in gan_logs for k in
                   ("train/rec_loss", "train/disc_loss", "train/d_weight",
                    "train/g_loss")]
    gates = {
        "recon_learns": bool(rec_pre_gan < 0.5 * rec_first),
        "disc_factor_live": bool(
            float(gan_logs[-1]["train/disc_factor"]) == 1.0),
        "disc_learns": bool(d_last5 < d_first and margin_last5 > 0.0),
        "d_weight_in_range": bool(
            np.all(dw > vcfg.min_adapt_weight)
            and np.all(dw < vcfg.max_adapt_weight * vcfg.disc_weight)),
        # judged on the FIXED eval forward: adversarial pressure at
        # reference scale raises L1 transiently (the generator starts
        # trading pixel loss for realism, exactly the reference
        # dynamics); "not collapsed" = at most 2x the pre-GAN eval recon
        "recon_not_collapsed": bool(
            eval_post <= max(2.0 * eval_pre, eval_pre + 0.05)),
        "all_finite": bool(np.all(np.isfinite(all_scalars))),
    }
    out = {
        "geometry": "ch128 mult(1,1,2,2,4) res2 attn(53,) z256 ndf64 "
                    "(VQVAEConfig preset, reference "
                    "big_model_attn_gan.py:521-602)",
        "ae_params_m": round(n_params / 1e6, 1),
        "batch_size": BS, "lr": vcfg.learning_rate,
        "recon_steps": RECON_STEPS, "gan_steps": GAN_STEPS,
        "rec_loss": {"first": round(rec_first, 4),
                     "pre_gan": round(rec_pre_gan, 4),
                     "final_last5": round(rec_final, 4)},
        "eval_rec_loss": {"pre_gan": round(float(eval_pre), 4),
                          "post_gan": round(float(eval_post), 4)},
        "disc_loss": {"first": round(d_first, 4),
                      "last5_mean": round(d_last5, 4)},
        "logit_margin_last5": round(margin_last5, 4),
        "d_weight": {"min": round(float(dw.min()), 5),
                     "max": round(float(dw.max()), 5),
                     "final": round(float(dw[-1]), 5)},
        "gates": gates,
        "minutes": round((time.time() - t_start) / 60, 1),
    }
    with open(os.path.join(_ROOT, "QUALITY_VQGAN.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    for k, ok in gates.items():
        assert ok, f"VQ-GAN full-scale gate failed: {k}"
    print("QUALITY_VQGAN: all gates passed")


if __name__ == "__main__":
    main()
