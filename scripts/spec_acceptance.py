#!/usr/bin/env python
"""Trained-pair speculative-decode acceptance: the number
scripts/spec_decode_bench.py cannot give (random weights measure logit
overlap, not draft/target agreement).

Reuses the quality-proof battery (scripts/quality_proof.py): train a
small-but-real VQ-VAE on 64 tone clips, tokenize, then train BOTH a
target GPT (4L) and a draft GPT (1L) on the same codes, and measure:

  * acceptance rate of gpt_speculative_generate(target, draft) at
    several gamma (the deployment-relevant quantity);
  * that the speculatively-sampled clips keep the target's
    class-conditional spectral accuracy (distribution preserved on a
    TRAINED model, complementing the statistical test on random nets).

Caveat kept honest: tones are easy data, so this acceptance is an
optimistic indication, not a VAS/VGGSound deployment number.  Writes
SPEC_ACCEPTANCE.json.

Usage: python scripts/spec_acceptance.py   (TPU, ~15-25 min, one job)
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

from quality_proof import N_CLASSES, make_tone_battery

from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                           GPTConfig, MelConfig,
                                           TrainConfig, VQVAEConfig)
from melspec_gpt_vqvae_tpu.models.gpt import class_embed, init_gpt_params
from melspec_gpt_vqvae_tpu.models.speculative import \
    gpt_speculative_generate
from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask
from melspec_gpt_vqvae_tpu.training.vqvae_task import VQVAETask

VQ_STEPS = int(os.environ.get("SA_VQ_STEPS", "300"))
GPT_STEPS = int(os.environ.get("SA_GPT_STEPS", "400"))
SAMPLES = int(os.environ.get("SA_SAMPLES", "8"))


def train_gpt(exp, grids, labels, rng, steps, seed):
    task = GPTTask(exp)
    state = task.init_state(seed)
    key = jax.random.PRNGKey(seed + 100)
    n = len(grids)
    for step in range(steps):
        idxs = rng.integers(0, n, exp.train.batch_size)
        key, r = jax.random.split(key)
        state, loss = task.train_step(
            state, {"codes": grids[idxs], "target": labels[idxs]}, r)
        if step % 100 == 0:
            print(f"  step {step}: loss {float(loss):.4f}", flush=True)
    print(f"  final loss {float(loss):.4f}", flush=True)
    return state["params"], float(loss)


def main():
    t_start = time.time()
    mcfg = MelConfig()
    wavs, labels, _ = make_tone_battery(mcfg)
    n = len(wavs)

    mel_fn = jax.jit(lambda w: waveform_to_mel(w, mcfg))
    mels = np.concatenate([np.asarray(mel_fn(jnp.asarray(wavs[i:i + 16])))
                           for i in range(0, n, 16)])[:, :, 6:854]
    x_all = (2.0 * mels - 1.0)[..., None].astype(np.float32)
    dom = mels.mean(axis=2).argmax(axis=1)
    class_bins = {c: sorted(set(int(d) for d, l in zip(dom, labels)
                                if l == c)) for c in range(N_CLASSES)}

    vcfg = VQVAEConfig(ch=32, num_res_blocks=1, z_channels=64,
                       embedding_dim=64, num_embeddings=128,
                       disc_start=10 ** 9, learning_rate=3e-4, disc_ndf=16)
    vq_task = VQVAETask(vcfg)
    state = vq_task.init_state(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    for step in range(VQ_STEPS):
        idxs = rng.integers(0, n, 8)
        state, log = vq_task.train_step(state, jnp.asarray(x_all[idxs]))
        if step % 100 == 0:
            print(f"vqvae step {step}: rec {log['train/rec_loss']:.4f}",
                  flush=True)

    vq = VQModel(vcfg)
    enc = jax.jit(lambda p, x: vq.apply({"params": p}, x,
                                        method="encode_to_indices"))
    grids = np.concatenate(
        [np.asarray(enc(state["ae_params"], jnp.asarray(x_all[i:i + 16])))
         for i in range(0, n, 16)])

    def exp_for(layers):
        g = GPTConfig(vocab_size=128, block_size=266, n_layer=layers,
                      n_head=4, n_embd=128, class_size=N_CLASSES,
                      embd_pdrop=0.1, resid_pdrop=0.1, attn_pdrop=0.1)
        return ExperimentConfig(model=g,
                                train=TrainConfig(learning_rate=3e-4,
                                                  epochs=1, batch_size=16),
                                data=DataConfig(batch_size=16))

    print("training target GPT (4L):", flush=True)
    t_exp = exp_for(4)
    t_params, t_loss = train_gpt(t_exp, grids, labels, rng, GPT_STEPS, 0)
    print("training draft GPT (1L):", flush=True)
    d_exp = exp_for(1)
    d_params, d_loss = train_gpt(d_exp, grids, labels, rng, GPT_STEPS, 1)

    # ---- acceptance + quality through the speculative path -------------
    dec = jax.jit(lambda p, g: vq.apply({"params": p}, g,
                                        method="decode_code"))
    out = {"gammas": {}, "target_loss": round(t_loss, 3),
           "draft_loss": round(d_loss, 3)}
    skw = dict(temperature=0.9, top_k=16)

    # B=1 lanes for the acceptance number: the batched sampler advances by
    # the MIN acceptance across lanes, so multi-lane stats underestimate
    # the per-lane acceptance that sets the B=1 latency-regime speedup
    def b1_acceptance(gamma):
        acc = drafted = 0
        for c in range(N_CLASSES):
            for s in range(2):
                cls = jnp.full((1,), c, jnp.int32)
                _, st = gpt_speculative_generate(
                    t_params, t_exp.model, d_params, d_exp.model,
                    jax.random.fold_in(jax.random.PRNGKey(6),
                                       c * 100 + s * 10 + gamma),
                    class_embed(t_params, cls),
                    class_embed(d_params, cls),
                    steps=265, gamma=gamma, **skw)
                acc += int(st["accepted"])
                drafted += int(st["drafted"])
        return acc / max(1, drafted)

    for gamma in (2, 4, 8):
        acc_tot = drafted_tot = 0
        correct = 0
        for c in range(N_CLASSES):
            cls = jnp.full((SAMPLES,), c, jnp.int32)
            toks, stats = gpt_speculative_generate(
                t_params, t_exp.model, d_params, d_exp.model,
                jax.random.fold_in(jax.random.PRNGKey(5), c * 10 + gamma),
                class_embed(t_params, cls), class_embed(d_params, cls),
                steps=265, gamma=gamma, **skw)
            acc_tot += int(stats["accepted"])
            drafted_tot += int(stats["drafted"])
            grid = np.asarray(toks).reshape(-1, 53, 5).swapaxes(1, 2)
            spec = np.asarray(dec(state["ae_params"],
                                  jnp.asarray(grid)))[..., 0]
            mel01 = np.clip((spec + 1.0) / 2.0, 0.0, 1.0)
            for d in mel01.mean(axis=2).argmax(axis=1):
                dist = min(abs(int(d) - b) for b in class_bins[c])
                other = min(abs(int(d) - b)
                            for cc, bins in class_bins.items()
                            if cc != c for b in bins)
                correct += int(dist <= 3 and dist <= other)
        rate = acc_tot / max(1, drafted_tot)
        rate_b1 = b1_acceptance(gamma)
        quality = correct / (N_CLASSES * SAMPLES)
        out["gammas"][str(gamma)] = {
            "accept_rate_b1": round(rate_b1, 3),     # per-lane (B=1)
            "accept_rate_b8_min": round(rate, 3),    # batched-min, B=8
            "class_accuracy": round(quality, 3)}
        print(f"gamma={gamma}: acceptance B=1 {rate_b1:.3f} "
              f"(B=8 batched-min {rate:.3f}) "
              f"class-accuracy {quality:.3f}", flush=True)

    out["minutes"] = round((time.time() - t_start) / 60, 1)
    out["caveat"] = ("tone battery = easy data; acceptance is an "
                     "optimistic indication, not a VAS deployment number")
    with open(os.path.join(_ROOT, "SPEC_ACCEPTANCE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
