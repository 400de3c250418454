"""GPT-VAE training system (the reference's ``GPT_VAE`` LightningModule,
/root/reference/transformer/Lit_GPT_VAE.py:23-1037, as jitted pure functions
over an explicit train state).

Distinctives reproduced:
  * per-step KL annealing ``kl_weight = min(1, kl_weight + anneal_rate)``
    with ``anneal_rate = (1 - kl_start) / (warm_up * steps_per_epoch)``
    (reference :69-75, 253-256) — the weight lives **in the train state** so
    it resumes exactly (reference stores it via on_save_checkpoint :959-964);
  * free-bits branches fb∈{0,1,2,3} + beta==0 AE mode (:264-292);
  * validation/test epoch aggregation: NLL = (kl + rec) / sents,
    PPL = exp(nll * sents / words) (:363-383, 571-607);
  * corpus mutual information + active units (:395-525);
  * stage-2 encoder-only warm start (checkpoint.merge_subtree).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import ExperimentConfig
from ..models import gpt_vae as V
from ..parallel.mesh import MODEL_AXIS, make_mesh, put_batch, replicated
from ..parallel.reduce import cross_process_sum
from .gpt_task import tokens_from_batch
from .optim import make_optimizer

TrainState = Dict[str, Any]


class VAETask:
    """A mesh with a ``pipe`` axis routes both GPT stacks through the
    pipeline-parallel schedule (parallel/pipeline.py); ``pp_micro`` sets
    the microbatch count (0 = 2 * n_stages)."""

    def __init__(self, exp: ExperimentConfig, steps_per_epoch: int,
                 mesh=None, use_pallas=None, pp_micro: int = 0):
        self.exp = exp
        self.cfgs = V.make_vae_configs(exp.model, exp.vae)
        self.mesh = mesh or make_mesh()
        self.use_pallas = use_pallas
        from ..parallel.pipeline import PIPE_AXIS
        self.pp = ((self.mesh, pp_micro)
                   if PIPE_AXIS in self.mesh.shape else None)
        self.optimizer = make_optimizer(
            getattr(exp.train, "optimizer", "adamw"),
            exp.train.learning_rate, exp.train.weight_decay,
            exp.train.betas, momentum=getattr(exp.train, "momentum", 0.0))
        vae = exp.vae
        # (reference: Lit_GPT_VAE.py:69-75)
        if vae.warm_up > 0 and steps_per_epoch > 0:
            self.anneal_rate = (1.0 - vae.kl_start) / (
                vae.warm_up * steps_per_epoch)
        else:
            self.anneal_rate = 0.0

        cfgs, opt, anneal = self.cfgs, self.optimizer, self.anneal_rate
        nsamples, pp = vae.nsamples, self.pp
        # "auto" (None) resolves to XLA in the differentiated loss — the
        # fused Pallas attention is inference-only (no VJP); an explicit
        # use_pallas=True is honored.
        train_pallas = bool(use_pallas) if use_pallas is not None else False

        def train_step(state, x, rng, freeze_encoder):
            if vae.beta == 0:
                kl_weight = jnp.zeros(())
            else:
                kl_weight = jnp.minimum(1.0, state["kl_weight"] + anneal)

            def loss(p):
                return V.training_loss(p, cfgs, rng, x, kl_weight,
                                       nsamples=nsamples, train=True,
                                       use_pallas=train_pallas, pp=pp)
            (l, aux), g = jax.value_and_grad(loss, has_aux=True)(
                state["params"])
            # --freeze_epoch: stop updating the encoder after N epochs
            # (reference flag: GPT_VAE_train.py:82).  The *updates* are
            # zeroed, not the grads — Adam momentum would keep moving the
            # params otherwise.
            enc_scale = jnp.where(freeze_encoder, 0.0, 1.0)
            updates, opt_state = opt.update(g, state["opt_state"],
                                            state["params"])
            updates = dict(updates, encoder=jax.tree_util.tree_map(
                lambda v: enc_scale * v, updates["encoder"]))
            params = optax.apply_updates(state["params"], updates)
            new_state = {"params": params, "opt_state": opt_state,
                         "step": state["step"] + 1, "kl_weight": kl_weight}
            aux = dict(aux, kl_weight=kl_weight)
            return new_state, l, aux

        def eval_step(params, x, rng, kl_weight):
            # validation uses kl weight 1.0 when beta != 0
            # (reference: Lit_GPT_VAE.py:331-337)
            loss, rec, kl = V.elbo_loss(params, cfgs, rng, x,
                                        kl_weight, nsamples,
                                        use_pallas=use_pallas, pp=pp)
            return {"loss": jnp.sum(loss), "loss_rc": jnp.sum(rec),
                    "loss_kl": jnp.sum(kl)}

        self._train_step_fn = train_step   # unjitted (bench_train scans it)
        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def perf_timer(self, window: int = 50):
        """StepTimer reporting tokens/s + MFU (encoder + decoder passes)."""
        from ..utils.profiling import StepTimer, count_params, gpt_fwd_flops
        shapes = jax.eval_shape(
            lambda k: V.init_vae_params(k, self.cfgs), jax.random.PRNGKey(0))
        # per-process batch -> global (see GPTTask.perf_timer)
        b = self.exp.train.batch_size * jax.process_count()
        enc, dec = self.cfgs.encoder, self.cfgs.decoder
        fwd = (gpt_fwd_flops(count_params(shapes["encoder"]), b,
                             enc.block_size, enc.n_layer, enc.n_embd)
               + gpt_fwd_flops(count_params(shapes["decoder"]), b,
                               dec.block_size, dec.n_layer, dec.n_embd))
        return StepTimer(window, tokens_per_example=enc.block_size,
                         flops_per_step=3.0 * fwd,
                         batch_scale=jax.process_count())

    def init_state(self, seed: int = 783435) -> TrainState:
        params = V.init_vae_params(jax.random.PRNGKey(seed), self.cfgs)
        if self.pp is not None:
            from ..parallel.pipeline import shard_gpt_params_pp
            params = shard_gpt_params_pp(self.mesh, params)
        elif MODEL_AXIS in self.mesh.shape:
            # --mesh ...,model=N: Megatron-TP shard both GPT stacks (the
            # pspec rules match on 'blocks' paths at any nesting depth)
            from ..parallel.mesh import shard_gpt_params
            params = shard_gpt_params(self.mesh, params)
        else:
            params = jax.device_put(params, replicated(self.mesh))
        from ..parallel.mesh import replicate_stragglers
        # scalar leaves (opt count, live LR, step, kl_weight) must span the
        # mesh like everything else or a committed restore breaks (mesh.py)
        return replicate_stragglers(self.mesh, {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "step": jnp.zeros((), jnp.int32),
            "kl_weight": jnp.asarray(self.exp.vae.kl_start, jnp.float32)})

    def _shard(self, batch: Dict) -> jnp.ndarray:
        x = tokens_from_batch(jnp.asarray(batch["codes"]))
        return put_batch(self.mesh, x)   # local rows -> global batch

    def train_step(self, state, batch, rng, epoch: int = 0):
        x = self._shard(batch)
        freeze = (self.exp.vae.freeze_epoch >= 0
                  and epoch >= self.exp.vae.freeze_epoch)
        state, loss, aux = self._train_step(state, x, rng,
                                            jnp.asarray(freeze))
        b, t = x.shape
        # Reporting normalisation (reference: Lit_GPT_VAE.py:258-315).
        # Values stay DEVICE arrays — converting to python floats here would
        # force a host sync every step; the runner materialises them only on
        # logging steps.
        report = {
            "train/loss": (aux["loss_rc"] + aux["loss_kl"]) / b
            if self.exp.vae.beta != 0 else loss,
            "train/loss_rc": aux["loss_rc"] / b,
            "train/loss_kl": aux["loss_kl"] / b,
            "train/kl_weight": aux["kl_weight"],
        }
        if "fake_loss_kl" in aux:
            report["train/fake_loss_kl"] = aux["fake_loss_kl"]
        return state, loss, report

    def eval_step(self, state, batch, rng) -> Dict[str, Any]:
        x = self._shard(batch)
        kl_w = (state["kl_weight"] if self.exp.vae.beta == 0
                else jnp.ones(()))
        out = self._eval_step(state["params"], x, rng, kl_w)
        b, t = x.shape
        out = {k: float(v) for k, v in out.items()}
        out["num_words"] = (t - 1) * b
        out["num_sents"] = b
        return out

    @staticmethod
    def sum_outputs(outputs) -> Dict[str, float]:
        """Epoch metric sums over this host's eval batches.  These are the
        quantities that must be summed ACROSS processes (sync_dist parity)
        before ``metrics_from_sums`` derives NLL/PPL."""
        return {k: float(sum(o[k] for o in outputs))
                for k in ("loss", "loss_rc", "loss_kl",
                          "num_words", "num_sents")}

    @staticmethod
    def metrics_from_sums(sums: Dict[str, float]) -> Dict[str, float]:
        """NLL/PPL aggregation from (possibly globally reduced) sums
        (reference: Lit_GPT_VAE.py:363-383)."""
        rec, kl = sums["loss_rc"], sums["loss_kl"]
        words, sents = sums["num_words"], sums["num_sents"]
        nll = (kl + rec) / sents
        return {"loss": sums["loss"] / sents, "nll": nll, "kl": kl / sents,
                "rec": rec / sents,
                "ppl": float(np.exp(nll * sents / words))}

    @classmethod
    def aggregate_epoch(cls, outputs) -> Dict[str, float]:
        return cls.metrics_from_sums(cls.sum_outputs(outputs))

    # ------------------------------------------------------------------
    # research metrics + media paths
    # ------------------------------------------------------------------

    def batch_tokens(self, batch: Dict) -> jnp.ndarray:
        """(B, 5, 53) codes -> (B, 265) tokens; the per-task token view
        callers keep instead of whole batches (LSTMTask has its own)."""
        return tokens_from_batch(jnp.asarray(batch["codes"]))

    def _tokens_iter(self, batches):
        """Accept loader batches (dicts) or pre-extracted (B, T) token
        arrays — callers that iterate the loader once keep only the tiny
        token arrays instead of hoarding full batches (incl. the 80x848
        ``image`` specs)."""
        for b in batches:
            yield self.batch_tokens(b) if isinstance(b, dict) \
                else jnp.asarray(b)

    def calc_mi_au(self, state, batches, key=None):
        """Corpus MI + AU over an eval loader
        (reference: Lit_GPT_VAE.py:395-525).

        COLLECTIVE under multi-process execution: the posteriors are
        gathered across processes (reduce.cross_process_concat) so MI/AU
        cover the full corpus — every process must call this."""
        key = key if key is not None else jax.random.PRNGKey(0)
        return V.corpus_mi_and_au(state["params"], self.cfgs, key,
                                  self._tokens_iter(batches))

    def calc_iwnll(self, state, batches, nsamples: int = 500, ns: int = 10,
                   key=None):
        """Importance-weighted NLL/PPL over an eval loader (the reference
        driver utils.py:50-77 + nll_iw, modules/Lit_vae.py:610-668), with
        cross-process sum reduction."""
        key = key if key is not None else jax.random.PRNGKey(0)
        cfgs = self.cfgs
        fn = jax.jit(lambda p, k, x: V.nll_iw(p, cfgs, k, x,
                                              nsamples=nsamples, ns=ns))
        nll_sum, words, sents = 0.0, 0, 0
        for x in self._tokens_iter(batches):
            key, k = jax.random.split(key)
            nll_sum += float(jnp.sum(fn(state["params"], k, x)))
            words += (x.shape[1] - 1) * x.shape[0]
            sents += x.shape[0]
        s = cross_process_sum({"nll": nll_sum, "words": float(words),
                               "sents": float(sents)})
        nll = s["nll"] / s["sents"]
        return nll, float(np.exp(nll * s["sents"] / s["words"]))

    def reconstruct(self, state, batch, strategy="greedy", key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        x = tokens_from_batch(jnp.asarray(batch["codes"]))
        return V.reconstruct(state["params"], self.cfgs, key, x, strategy,
                             use_pallas=self.use_pallas)

    def decode(self, state, z, strategy="greedy", key=None, top_k=None,
               temperature=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return V.vae_decode(state["params"], self.cfgs, key, z, strategy,
                            top_k=top_k, temperature=temperature,
                            use_pallas=self.use_pallas)

    def interpolate(self, state, x_from, x_to, steps: int = 5, key=None):
        """Latent interpolation: decode at linspace points between two
        posteriors (reference audio_interpolation:
        GPT_VAE_callbacks.py:324-386)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2, kd = jax.random.split(key, 3)
        mu_f, lv_f = V.encoder_forward(state["params"], self.cfgs, x_from,
                                       use_pallas=self.use_pallas)
        mu_t, lv_t = V.encoder_forward(state["params"], self.cfgs, x_to,
                                       use_pallas=self.use_pallas)
        z_from = V.reparameterize(k1, mu_f, lv_f, 1)
        z_to = V.reparameterize(k2, mu_t, lv_t, 1)
        outs = []
        # per-point keys: invisible under greedy decode, required the day
        # a stochastic strategy is passed
        for i, v in enumerate(np.linspace(0.0, 1.0, steps)):
            z = float(v) * z_to + (1.0 - float(v)) * z_from
            outs.append(self.decode(state, z, "greedy",
                                    key=jax.random.fold_in(kd, i)))
        return outs
