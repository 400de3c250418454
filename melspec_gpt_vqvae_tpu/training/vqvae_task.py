"""VQ-VAE(+GAN) training system.

The reference trains its first stage with two optimizers — autoencoder
(encoder/decoder/quantiser/quant convs) and PatchGAN discriminator — with
hinge loss, a delayed ``disc_start`` factor, and an **adaptive generator
weight** computed from the ratio of gradient norms of the reconstruction
and generator losses w.r.t. the decoder's last conv layer
(/root/reference/vqvae/big_model_attn_gan.py:643-660, 742-766, 834-844).

TPU-native shape: both phases are single jitted steps; the adaptive weight
uses two ``jax.grad`` calls over losses sliced at the last-conv kernel
(instead of torch ``autograd.grad(..., retain_graph=True)``); BatchNorm
statistics in the discriminator ride a flax ``batch_stats`` collection in
the train state.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..configs import VQVAEConfig
from ..models.vqvae import (NLayerDiscriminator, VQModel, hinge_d_loss)
from .optim import vqvae_adam

TrainState = Dict[str, Any]


class VQVAETask:
    def __init__(self, cfg: VQVAEConfig, mesh=None):
        self.cfg = cfg
        self.model = VQModel(cfg)
        self.disc = NLayerDiscriminator(ndf=cfg.disc_ndf,
                                        n_layers=cfg.disc_num_layers)
        self.opt_ae = vqvae_adam(cfg.learning_rate)
        self.opt_disc = vqvae_adam(cfg.learning_rate)
        self._build_steps()

    # ------------------------------------------------------------------
    def init_state(self, key, input_shape=(1, 80, 848, 1)) -> TrainState:
        k1, k2 = jax.random.split(key)
        x = jnp.zeros(input_shape)
        ae_params = self.model.init(k1, x)["params"]
        disc_vars = self.disc.init(k2, x, train=True)
        return {
            "ae_params": ae_params,
            "disc_params": disc_vars["params"],
            "disc_stats": disc_vars.get("batch_stats", {}),
            "opt_ae": self.opt_ae.init(ae_params),
            "opt_disc": self.opt_disc.init(disc_vars["params"]),
            "step": jnp.zeros((), jnp.int32),
        }

    # ------------------------------------------------------------------
    def _build_steps(self):
        cfg, model, disc = self.cfg, self.model, self.disc
        opt_ae, opt_disc = self.opt_ae, self.opt_disc
        # The reference sets discriminator_iter_start = disc_start * 2
        # (big_model_attn_gan.py:596) because Lightning's global_step
        # increments once per optimizer, i.e. TWICE per batch.  Our step
        # counts one per iteration, so the equivalent threshold in
        # iterations is disc_start itself.
        disc_iter_start = cfg.disc_start

        def last_conv_path(params):
            return params["decoder"]["conv_out"]["kernel"]

        def ae_losses(params, x):
            qloss, recon, (perp, idx) = model.apply({"params": params}, x)
            rec_loss = jnp.mean(jnp.abs(x - recon))  # nll_loss (L1, :665-666)
            return qloss, recon, rec_loss, perp, idx

        def generator_step(state, x):
            step = state["step"]

            # The reference discriminator stays in train mode during the
            # generator update (BatchNorm batch statistics); apply with
            # train=True and discard the mutated running stats.
            def disc_train_logits(recon):
                logits, _ = disc.apply(
                    {"params": state["disc_params"],
                     "batch_stats": state["disc_stats"]}, recon,
                    train=True, mutable=["batch_stats"])
                return logits

            def loss_fn(params):
                qloss, recon, rec_loss, perp, idx = ae_losses(params, x)
                g_loss = -jnp.mean(disc_train_logits(recon))

                # adaptive weight: grads of rec/g losses wrt the last conv
                # kernel only (reference: :649-660)
                def rec_wrt_last(kernel):
                    p = jax.tree_util.tree_map(lambda v: v, params)
                    p["decoder"]["conv_out"]["kernel"] = kernel
                    _, r, _ = model.apply({"params": p}, x)
                    return jnp.mean(jnp.abs(x - r))

                def g_wrt_last(kernel):
                    p = jax.tree_util.tree_map(lambda v: v, params)
                    p["decoder"]["conv_out"]["kernel"] = kernel
                    _, r, _ = model.apply({"params": p}, x)
                    return -jnp.mean(disc_train_logits(r))

                kernel = last_conv_path(params)
                nll_g = jnp.linalg.norm(
                    jax.grad(rec_wrt_last)(kernel).reshape(-1))
                g_g = jnp.linalg.norm(
                    jax.grad(g_wrt_last)(kernel).reshape(-1))
                d_weight = jnp.clip(nll_g / (g_g + 1e-4),
                                    cfg.min_adapt_weight,
                                    cfg.max_adapt_weight)
                d_weight = jax.lax.stop_gradient(
                    d_weight * cfg.disc_weight)
                disc_factor = jnp.where(step < disc_iter_start, 0.0,
                                        cfg.disc_factor)
                loss = (rec_loss + cfg.codebook_weight * qloss
                        + d_weight * disc_factor * g_loss)
                log = {"train/aeloss": loss, "train/quant_loss": qloss,
                       "train/rec_loss": rec_loss, "train/d_weight": d_weight,
                       "train/g_loss": g_loss, "train/perplexity": perp,
                       "train/disc_factor": disc_factor}
                return loss, log

            (loss, log), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["ae_params"])
            updates, opt_state = opt_ae.update(grads, state["opt_ae"])
            ae_params = optax.apply_updates(state["ae_params"], updates)
            # step advances in the discriminator phase so BOTH phases of
            # iteration i see step == i (the reference's two optimizer
            # global_steps within one batch are both < or both >= the
            # doubled threshold).
            new_state = dict(state, ae_params=ae_params, opt_ae=opt_state)
            return new_state, loss, log

        def discriminator_step(state, x):
            step = state["step"]
            _, recon, _, _, _ = ae_losses(state["ae_params"], x)
            recon = jax.lax.stop_gradient(recon)

            def loss_fn(dparams):
                lr_, stats1 = disc.apply(
                    {"params": dparams, "batch_stats": state["disc_stats"]},
                    x, train=True, mutable=["batch_stats"])
                lf_, stats2 = disc.apply(
                    {"params": dparams, "batch_stats":
                     stats1["batch_stats"]},
                    recon, train=True, mutable=["batch_stats"])
                disc_factor = jnp.where(step < disc_iter_start, 0.0,
                                        cfg.disc_factor)
                d_loss = disc_factor * hinge_d_loss(lr_, lf_)
                log = {"train/disc_loss": d_loss,
                       "train/logits_real": jnp.mean(lr_),
                       "train/logits_fake": jnp.mean(lf_)}
                return d_loss, (log, stats2["batch_stats"])

            (d_loss, (log, new_stats)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["disc_params"])
            updates, opt_state = opt_disc.update(grads, state["opt_disc"])
            dparams = optax.apply_updates(state["disc_params"], updates)
            new_state = dict(state, disc_params=dparams,
                             disc_stats=new_stats, opt_disc=opt_state,
                             step=step + 1)
            return new_state, d_loss, log

        def eval_step(state, x):
            qloss, recon, rec_loss, perp, idx = ae_losses(
                state["ae_params"], x)
            return {"val/aeloss": rec_loss + qloss,
                    "val/rec_loss": rec_loss, "val/quant_loss": qloss,
                    "val/perplexity": perp}, recon, idx

        self._generator_step = jax.jit(generator_step, donate_argnums=0)
        self._discriminator_step = jax.jit(discriminator_step,
                                           donate_argnums=0)
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def train_step(self, state: TrainState,
                   x: jnp.ndarray) -> Tuple[TrainState, Dict]:
        """One full iteration = generator phase then discriminator phase
        (Lightning alternates optimizer_idx 0/1;
        reference training_step: big_model_attn_gan.py:742-766)."""
        state, ae_loss, log1 = self._generator_step(state, x)
        state, d_loss, log2 = self._discriminator_step(state, x)
        return state, {**{k: float(v) for k, v in log1.items()},
                       **{k: float(v) for k, v in log2.items()}}

    def eval_step(self, state, x):
        logs, recon, idx = self._eval_step(state, x)
        return {k: float(v) for k, v in logs.items()}, recon, idx
