#!/usr/bin/env python
"""VQ-VAE(+GAN) first-stage training CLI.

The reference trains its first stage with the ``LitVQVAE`` LightningModule
(/root/reference/vqvae/big_model_attn_gan.py:742-844: alternating
autoencoder/discriminator optimizers, hinge loss, adaptive weight, codebook
usage histograms at validation end :795-804) but ships no entry script —
the checkpoint comes pretrained from SpecVQGAN.  This CLI closes that gap
on the TPU-native VQVAETask.
"""

import argparse
import os


def init_config():
    parser = argparse.ArgumentParser(description="VQ-VAE GAN (TPU-native)")
    parser.add_argument("--dataset", type=str, required=True,
                        help="vas | vggsound")
    parser.add_argument("--experiment", type=str, required=True)
    parser.add_argument("--train", type=int, default=0)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--eval", type=int, default=0)
    parser.add_argument("--epochs", type=int, default=100)
    parser.add_argument("--batch_size", type=int, default=2)
    parser.add_argument("--learning_rate", type=float, default=1e-3)
    parser.add_argument("--num_embeddings", type=int, default=None,
                        help="defaults: 128 (vas) / 1024 (vggsound)")
    parser.add_argument("--disc_start", type=int, default=2001)
    parser.add_argument("--data_root", type=str, default="./data")
    parser.add_argument("--limit_train_batches", type=int, default=0)
    parser.add_argument("--limit_val_batches", type=int, default=0)
    parser.add_argument("--seed", type=int, default=783435)
    parser.add_argument("--override", type=str, default="",
                        help="comma k=v VQVAEConfig overrides, e.g. "
                             "'ch=16,num_res_blocks=1,resolution=64'")
    parser.add_argument("--platform", type=str, default="",
                        help="force a jax platform (e.g. 'cpu')")
    return parser.parse_args()


def main(args):
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    if getattr(args, "platform", ""):
        jax.config.update("jax_platforms", args.platform)
    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from melspec_gpt_vqvae_tpu.configs import (VQVAEConfig, parse_overrides,
                                               preset_params)
    from melspec_gpt_vqvae_tpu.data import DataModule
    from melspec_gpt_vqvae_tpu.models.vqvae import codebook_usage_counts
    from melspec_gpt_vqvae_tpu.parallel.mesh import is_primary
    from melspec_gpt_vqvae_tpu.training.checkpoint import CheckpointManager
    from melspec_gpt_vqvae_tpu.training.logging import TBLogger
    from melspec_gpt_vqvae_tpu.training.vqvae_task import VQVAETask

    n_e = args.num_embeddings or (1024 if args.dataset == "vggsound" else 128)
    cfg = VQVAEConfig(num_embeddings=n_e, disc_start=args.disc_start,
                      learning_rate=args.learning_rate)
    ov = parse_overrides(getattr(args, "override", ""))
    if ov:
        cfg = dataclasses.replace(cfg, **ov)
    spec_dir = preset_params("GPT_VAE", args.dataset)["spec_dir_path"]

    dm = DataModule(batch_size=args.batch_size, spec_dir_path=spec_dir,
                    data_root=args.data_root)
    dm.setup()
    task = VQVAETask(cfg)

    run_dir = os.path.join("lightning_logs",
                           f"{args.experiment}-{args.dataset}")
    log = TBLogger(run_dir)
    ckpt = CheckpointManager(os.path.join(
        run_dir, "checkpoints", f"version_{log.version}"))

    state = task.init_state(jax.random.PRNGKey(args.seed))
    start_epoch = 0
    if args.resume:
        from melspec_gpt_vqvae_tpu.training.checkpoint import (place_like,
                                                               shape_template)
        restored = ckpt.restore(args.resume, template={
            "state": shape_template(state), "epoch": 0})
        state = place_like(restored["state"], state)
        start_epoch = int(restored["epoch"]) + 1

    def batch_images(batch):
        return jnp.asarray(batch["image"])[..., None]  # NHWC

    if args.train:
        train_loader = dm.train_dataloader()
        val_loader = dm.val_dataloader()
        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            for i, batch in enumerate(train_loader):
                if args.limit_train_batches and i >= args.limit_train_batches:
                    break
                state, logs = task.train_step(state, batch_images(batch))
                step = int(jax.device_get(state["step"]))
                if i % 50 == 0:
                    log.scalars(logs, step)
                    log.scalar("learning_rate", args.learning_rate, step)

            # validation + codebook-usage histogram
            # (reference: big_model_attn_gan.py:780-826)
            counts = np.zeros(n_e, np.int64)
            vals = []
            for i, batch in enumerate(val_loader):
                if args.limit_val_batches and i >= args.limit_val_batches:
                    break
                logs, recon, idx = task.eval_step(state, batch_images(batch))
                vals.append(logs)
                counts += np.asarray(codebook_usage_counts(idx, n_e))
            step = int(jax.device_get(state["step"]))
            agg = {k: float(np.mean([v[k] for v in vals]))
                   for k in vals[0]} if vals else {}
            log.scalars(agg, step)
            zero_hit = int((counts == 0).sum())
            log.scalar("val/zero_hit_codes", zero_hit, step)
            if counts.sum() > 0:
                used = np.repeat(np.arange(n_e), counts)
                log.histogram("val/code_hits", used, step)
            if vals:
                # input/reconstruction images (reference log_images :810-826)
                log.spectrogram("images_inputs",
                                np.asarray(batch["image"][0]), step)
                log.spectrogram("images_reconstructions",
                                np.asarray(recon)[0, :, :, 0], step)
            if is_primary():
                print(f"epoch {epoch}: " +
                      " ".join(f"{k} {v:.4f}" for k, v in agg.items()) +
                      f" zero_hit_codes {zero_hit}"
                      f" ({time.time() - t0:.1f}s)")
                ckpt.save({"state": state, "epoch": epoch}, step,
                          metric=agg.get("val/aeloss"))
        ckpt.wait()   # async save must be durable before exit

    if args.eval:
        vals = []
        for i, batch in enumerate(dm.val_dataloader()):
            if args.limit_val_batches and i >= args.limit_val_batches:
                break
            logs, _, _ = task.eval_step(state, batch_images(batch))
            vals.append(logs)
        agg = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
        print(" ".join(f"{k} {v:.4f}" for k, v in agg.items()))


if __name__ == "__main__":
    main(init_config())
