"""LSTM-VAE training system (the reference's legacy ``VAE`` Lightning
module, /root/reference/modules/Lit_vae.py:19-910, as jitted pure functions
over an explicit train state).

Distinctives reproduced:
  * ``get_input``: each (5, 53) code grid is cut to its first 50 time
    columns and split into five 50-token sentences wrapped in <s>/</s>
    (reference: Lit_vae.py:172-201) — so one batch of B grids trains on
    5*B sequences of length 52;
  * per-step KL annealing with the rate derived from train-set length
    (Lit_vae.py:77-81), kl_weight carried in the train state;
  * fb∈{0,1,2,3} free-bits, beta==0 AE, live IW-train objective
    (loss_iw:542) — see models/lstm_vae.lstm_training_loss;
  * SGD(momentum)/Adam optimizer choice (Lit_vae.py:85-92);
  * epoch NLL/PPL aggregation + corpus MI / active units
    (Lit_vae.py:316-453) with cross-process reduction;
  * live IW-NLL eval (nll_iw:610).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import ExperimentConfig
from ..models import gpt_vae as G
from ..models import lstm_vae as L
from ..parallel.mesh import make_mesh, put_batch, replicated
from ..parallel.reduce import cross_process_sum
from .optim import make_optimizer
from .vae_task import VAETask

TrainState = Dict[str, Any]


def lstm_tokens_from_batch(codes, bos_id: int, eos_id: int,
                           part_len: int = 50) -> jnp.ndarray:
    """(B, 5, 53) code grid -> (5B, part_len + 2) <s>-wrapped sentences
    (reference get_input: modules/Lit_vae.py:172-201: keep the first 50
    time columns, time-major flatten, split into 50-token parts).

    Grids smaller than one part (tiny test configs) become one sentence
    per item instead."""
    codes = jnp.asarray(codes).astype(jnp.int32)
    b, h, w = codes.shape
    w_keep = min(part_len, w)
    flat = jnp.swapaxes(codes[:, :, :w_keep], 1, 2).reshape(b, -1)
    total = h * w_keep
    if total % part_len == 0:
        parts = flat.reshape(-1, part_len)
    else:
        parts = flat                                     # one row per item
    bos = jnp.full((parts.shape[0], 1), bos_id, jnp.int32)
    eos = jnp.full((parts.shape[0], 1), eos_id, jnp.int32)
    return jnp.concatenate([bos, parts, eos], axis=1)


class LSTMVAETask:
    """Mirrors VAETask's surface (train_step/eval_step/sum_outputs/
    metrics_from_sums/calc_mi_au/calc_iwnll/reconstruct/decode) so the
    runner and callbacks drive both interchangeably."""

    def __init__(self, exp: ExperimentConfig, cfg: L.LSTMConfig,
                 steps_per_epoch: int, mesh=None):
        self.exp = exp
        self.cfg = cfg
        self.mesh = mesh or make_mesh()
        vae = exp.vae
        self.optimizer = make_optimizer(
            getattr(exp.train, "optimizer", "sgd"),
            exp.train.learning_rate, exp.train.weight_decay,
            exp.train.betas, momentum=getattr(exp.train, "momentum", 0.0),
            grad_clip=getattr(exp.train, "grad_clip", None))
        if vae.warm_up > 0 and steps_per_epoch > 0:
            self.anneal_rate = (1.0 - vae.kl_start) / (
                vae.warm_up * steps_per_epoch)
        else:
            self.anneal_rate = 0.0

        cfgc, opt, anneal = self.cfg, self.optimizer, self.anneal_rate
        nsamples = vae.nsamples

        def train_step(state, x, rng):
            if vae.beta == 0:
                kl_weight = jnp.zeros(())
            else:
                kl_weight = jnp.minimum(1.0, state["kl_weight"] + anneal)

            def loss(p):
                return L.lstm_training_loss(p, cfgc, vae, rng, x, kl_weight,
                                            nsamples=nsamples, train=True)
            (l, aux), g = jax.value_and_grad(loss, has_aux=True)(
                state["params"])
            updates, opt_state = opt.update(g, state["opt_state"],
                                            state["params"])
            params = optax.apply_updates(state["params"], updates)
            new_state = {"params": params, "opt_state": opt_state,
                         "step": state["step"] + 1, "kl_weight": kl_weight}
            return new_state, l, dict(aux, kl_weight=kl_weight)

        def eval_step(params, x, rng, kl_weight):
            loss, rec, kl = L.lstm_vae_loss(params, cfgc, rng, x, kl_weight,
                                            nsamples)
            return {"loss": jnp.sum(loss), "loss_rc": jnp.sum(rec),
                    "loss_kl": jnp.sum(kl)}

        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def init_state(self, seed: int = 783435) -> TrainState:
        params = L.init_lstm_vae(jax.random.PRNGKey(seed), self.cfg)
        params = jax.device_put(params, replicated(self.mesh))
        from ..parallel.mesh import replicate_stragglers
        # scalar leaves must span the mesh (see mesh.replicate_stragglers)
        return replicate_stragglers(self.mesh, {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "step": jnp.zeros((), jnp.int32),
            "kl_weight": jnp.asarray(self.exp.vae.kl_start, jnp.float32)})

    def _tokens(self, batch: Dict) -> jnp.ndarray:
        return lstm_tokens_from_batch(batch["codes"], self.cfg.bos_id,
                                      self.cfg.eos_id)

    # per-task token view for single-pass eval callers (mirrors
    # VAETask.batch_tokens)
    batch_tokens = _tokens

    def _shard(self, batch: Dict) -> jnp.ndarray:
        return put_batch(self.mesh, self._tokens(batch))

    def train_step(self, state, batch, rng, epoch: int = 0):
        x = self._shard(batch)
        state, loss, aux = self._train_step(state, x, rng)
        b, t = x.shape
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

    # same epoch aggregation as the GPT flavor (identical in the reference:
    # Lit_vae.py:316-339 vs Lit_GPT_VAE.py:363-383)
    sum_outputs = staticmethod(VAETask.sum_outputs)
    metrics_from_sums = staticmethod(VAETask.metrics_from_sums)

    @classmethod
    def aggregate_epoch(cls, outputs) -> Dict[str, float]:
        return cls.metrics_from_sums(cls.sum_outputs(outputs))

    # ------------------------------------------------------------------
    # research metrics + media paths
    # ------------------------------------------------------------------

    def calc_mi_au(self, state, batches, key=None):
        """Corpus MI + AU (reference: Lit_vae.py:341-453).  COLLECTIVE
        under multi-process execution (posterior gather), like
        VAETask.calc_mi_au — every process must call it."""
        key = key if key is not None else jax.random.PRNGKey(0)
        mus, logvars = [], []
        fwd = jax.jit(lambda p, x: L.lstm_encoder_forward(p, self.cfg, x))
        for b in batches:
            x = self.batch_tokens(b) if isinstance(b, dict) \
                else jnp.asarray(b)
            mu, lv = fwd(state["params"]["encoder"], x)
            mus.append(np.asarray(mu))
            logvars.append(np.asarray(lv))
        from ..parallel.reduce import pool_posteriors
        pooled = pool_posteriors(mus, logvars, self.cfg.nz)
        if pooled is None:   # global corpus < 2 rows
            return float("nan"), 0, jnp.zeros((self.cfg.nz,), jnp.float32)
        mu, lv = pooled
        mi = float(G.mi_from_posteriors(key, mu, lv))
        au, au_var = G.active_units_from_means(mu)
        return mi, int(au), au_var

    def calc_iwnll(self, state, batches, nsamples: int = 500, ns: int = 10,
                   key=None):
        """IW NLL/PPL (the reference's live nll_iw: Lit_vae.py:610-643),
        cross-process reduced."""
        key = key if key is not None else jax.random.PRNGKey(0)
        cfg = self.cfg
        fn = jax.jit(lambda p, k, x: L.lstm_nll_iw(p, cfg, k, x,
                                                   nsamples=nsamples, ns=ns))
        nll_sum, words, sents = 0.0, 0, 0
        for b in batches:
            x = self.batch_tokens(b) if isinstance(b, dict) \
                else jnp.asarray(b)
            key, k = jax.random.split(key)
            nll_sum += float(jnp.sum(fn(state["params"], k, x)))
            words += (x.shape[1] - 1) * x.shape[0]
            sents += x.shape[0]
        s = cross_process_sum({"nll": nll_sum, "words": float(words),
                               "sents": float(sents)})
        nll = s["nll"] / s["sents"]
        return nll, float(np.exp(nll * s["sents"] / s["words"]))

    def reconstruct(self, state, batch, strategy: str = "greedy", key=None):
        """Encode + decode with greedy / TRUE beam / ancestral sampling
        (reference VAE.reconstruct: Lit_vae.py:133-147)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        x = self._tokens(batch)
        z, _ = L.lstm_encode(state["params"]["encoder"], self.cfg, k1, x, 1)
        return self.decode(state, z[:, 0], strategy, key=k2)

    def decode(self, state, z, strategy: str = "greedy", key=None,
               beam: int = 5):
        """z (B, nz) -> tokens (reference VAE.decode: Lit_vae.py:111-131)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        p = state["params"]["decoder"]
        if strategy == "beam":
            toks, _ = L.lstm_beam_search(p, self.cfg, z, beam=beam)
            return toks
        toks, _ = L.lstm_sample_decode(p, self.cfg, key, z,
                                       greedy=(strategy == "greedy"))
        return toks

    def sample_from_prior(self, state, n: int, strategy: str = "sample",
                          key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        z = jax.random.normal(k1, (n, self.cfg.nz))
        return self.decode(state, z, strategy, key=k2)
