"""Legacy LSTM VAE family (capability parity with the reference's
``modules/`` package, SURVEY.md §2.2).

  * ``GaussianLSTMEncoder`` (/root/reference/modules/encoders/enc_lstm.py:
    10-83): embed -> 1-layer LSTM -> bias-free linear to (mean, logvar)
    from the last hidden state; ``fix_var`` support.
  * ``LSTMDecoder`` (/root/reference/modules/decoders/dec_lstm.py:17-357):
    z concatenated to every input embedding, hidden state initialised as
    c0 = W z, h0 = tanh(c0); per-(sample, sequence) summed CE; greedy /
    ancestral sampling with </s> termination; **true beam search** (the
    GPT stack's "beam" is top-k sampling; this one keeps K hypotheses).
  * ``LSTM_LM`` (/root/reference/modules/lm/lm_lstm.py:14): unconditional
    LSTM language model baseline.
  * ``LinearDiscriminator`` / ``MLPDiscriminator``
    (/root/reference/modules/discriminators/discriminator_linear.py:7,35):
    latent-probe classifiers over frozen encoder means.
  * ``mh_sample_posterior``: Metropolis-Hastings posterior sampling
    (/root/reference/modules/Lit_vae.py:723).

TPU-first: the LSTM is a fused-gate ``lax.scan`` cell (one (ni+nh, 4nh)
matmul per step on the MXU); decoding loops are ``lax.scan`` with
finished-beam masking instead of Python hypothesis lists; beam search is
fully batched over (batch, beam).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .gpt import cross_entropy_loss
from .gpt_vae import (gaussian_kl, log_prior, log_sum_exp, reparameterize)

Params = Dict[str, Any]


class LSTMConfig(NamedTuple):
    """(reference: config/config_vas.py)"""
    vocab_size: int = 130          # 128 codes + <s> + </s>
    nz: int = 32
    ni: int = 512
    enc_nh: int = 1024
    dec_nh: int = 1024
    dec_dropout_in: float = 0.5
    dec_dropout_out: float = 0.5
    bos_id: int = 128
    eos_id: int = 129
    max_len: int = 265
    fix_var: float = -1.0


# ---------------------------------------------------------------------------
# LSTM cell (fused gates, torch gate order i,f,g,o for ckpt conversion)
# ---------------------------------------------------------------------------


def init_lstm(key, input_size: int, hidden: int, scale: float = 0.01):
    k1, k2, k3 = jax.random.split(key, 3)
    u = lambda k, s: jax.random.uniform(k, s, jnp.float32, -scale, scale)
    return {"wx": u(k1, (input_size, 4 * hidden)),
            "wh": u(k2, (hidden, 4 * hidden)),
            "b": jnp.zeros((4 * hidden,))}


def lstm_cell(p, x, h, c):
    gates = x @ p["wx"] + h @ p["wh"] + p["b"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h = jax.nn.sigmoid(o) * jnp.tanh(c)
    return h, c


def lstm_run(p, xs, h0, c0):
    """xs: (B, T, in) -> (outputs (B, T, nh), (hT, cT))."""
    def step(carry, x):
        h, c = carry
        h, c = lstm_cell(p, x, h, c)
        return (h, c), h
    (h, c), ys = jax.lax.scan(step, (h0, c0), jnp.swapaxes(xs, 0, 1))
    return jnp.swapaxes(ys, 0, 1), (h, c)


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def init_lstm_encoder(key, cfg: LSTMConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    u = lambda k, s, sc: jax.random.uniform(k, s, jnp.float32, -sc, sc)
    return {"embed": u(k1, (cfg.vocab_size, cfg.ni), 0.1),
            "lstm": init_lstm(k2, cfg.ni, cfg.enc_nh),
            "linear": {"w": u(k3, (cfg.enc_nh, 2 * cfg.nz), 0.01)}}


def lstm_encoder_forward(p: Params, cfg: LSTMConfig,
                         x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """x (B, T) -> (mean, logvar) each (B, nz)
    (reference: enc_lstm.py:47-73)."""
    emb = jnp.take(p["embed"], x, axis=0)
    b = x.shape[0]
    h0 = jnp.zeros((b, cfg.enc_nh))
    _, (h, _) = lstm_run(p["lstm"], emb, h0, h0)
    mean, logvar = jnp.split(h @ p["linear"]["w"], 2, axis=-1)
    if cfg.fix_var > 0:
        logvar = jnp.full_like(mean, math.log(cfg.fix_var))
    return mean, logvar


def lstm_encode(p, cfg, key, x, nsamples=1):
    mu, logvar = lstm_encoder_forward(p, cfg, x)
    z = reparameterize(key, mu, logvar, nsamples)
    return z, gaussian_kl(mu, logvar)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def init_lstm_decoder(key, cfg: LSTMConfig) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)
    u = lambda k, s, sc: jax.random.uniform(k, s, jnp.float32, -sc, sc)
    return {"embed": u(k1, (cfg.vocab_size, cfg.ni), 0.1),
            "trans": {"w": u(k2, (cfg.nz, cfg.dec_nh), 0.01)},
            "lstm": init_lstm(k3, cfg.ni + cfg.nz, cfg.dec_nh),
            "pred": {"w": u(k4, (cfg.dec_nh, cfg.vocab_size), 0.01)}}


def _dec_init_state(p, z):
    c0 = z @ p["trans"]["w"]
    return jnp.tanh(c0), c0


def lstm_decode_logits(p: Params, cfg: LSTMConfig, src: jnp.ndarray,
                       z: jnp.ndarray, *, train: bool = False,
                       rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Teacher-forced logits (reference decode: dec_lstm.py:98-143).

    src: (B, T); z: (B, nz) -> (B, T, V).
    """
    emb = jnp.take(p["embed"], src, axis=0)
    if train and rng is not None and cfg.dec_dropout_in > 0:
        rng, r = jax.random.split(rng)
        keep = jax.random.bernoulli(r, 1 - cfg.dec_dropout_in, emb.shape)
        emb = jnp.where(keep, emb / (1 - cfg.dec_dropout_in), 0.0)
    zt = jnp.broadcast_to(z[:, None, :], emb.shape[:2] + (z.shape[-1],))
    inp = jnp.concatenate([emb, zt], axis=-1)
    h0, c0 = _dec_init_state(p, z)
    out, _ = lstm_run(p["lstm"], inp, h0, c0)
    if train and rng is not None and cfg.dec_dropout_out > 0:
        keep = jax.random.bernoulli(rng, 1 - cfg.dec_dropout_out, out.shape)
        out = jnp.where(keep, out / (1 - cfg.dec_dropout_out), 0.0)
    return out @ p["pred"]["w"]


def lstm_reconstruct_error(p, cfg, x, z, *, train=False, rng=None):
    """x (B, T) with <s>...</s>; z (B, ns, nz) -> (B, ns)
    (reference: dec_lstm.py:145-181)."""
    src, tgt = x[:, :-1], x[:, 1:]

    def one(z_s, k):
        logits = lstm_decode_logits(p, cfg, src, z_s, train=train, rng=k)
        return jnp.sum(cross_entropy_loss(logits, tgt, reduce="none"),
                       axis=-1)
    ns = z.shape[1]
    if rng is not None:
        keys = jax.random.split(rng, ns)
    else:
        from .gpt import _raw_key_zeros
        keys = _raw_key_zeros((ns,))
    return jax.vmap(one, in_axes=(1, 0), out_axes=1)(z, keys)


def lstm_log_probability(p, cfg, x, z):
    return -lstm_reconstruct_error(p, cfg, x, z)


@functools.partial(jax.jit, static_argnames=("cfg", "greedy"))
def lstm_sample_decode(p: Params, cfg: LSTMConfig, key: jax.Array,
                       z: jnp.ndarray, greedy: bool = False):
    """Greedy/ancestral decoding with </s> termination masking
    (reference: dec_lstm.py:304-357).  Returns (tokens (B, max_len),
    lengths (B,)); positions past </s> hold eos_id.
    """
    b = z.shape[0]
    h, c = _dec_init_state(p, z)
    tok0 = jnp.full((b,), cfg.bos_id, jnp.int32)

    def step(carry, k):
        h, c, tok, alive = carry
        emb = jnp.take(p["embed"], tok, axis=0)
        inp = jnp.concatenate([emb, z], axis=-1)
        h, c = lstm_cell(p["lstm"], inp, h, c)
        logits = h @ p["pred"]["w"]
        nxt = (jnp.argmax(logits, -1) if greedy
               else jax.random.categorical(k, logits, -1)).astype(jnp.int32)
        nxt = jnp.where(alive, nxt, cfg.eos_id)
        alive_next = jnp.logical_and(alive, nxt != cfg.eos_id)
        return (h, c, nxt, alive_next), (nxt, alive)

    keys = jax.random.split(key, cfg.max_len)
    _, (toks, alive) = jax.lax.scan(
        step, (h, c, tok0, jnp.ones((b,), bool)), keys)
    return toks.T, jnp.sum(alive.T, axis=1)


@functools.partial(jax.jit, static_argnames=("cfg", "beam"))
def lstm_beam_search(p: Params, cfg: LSTMConfig, z: jnp.ndarray,
                     beam: int = 5):
    """Batched true beam search (reference: dec_lstm.py:195-302 decodes
    sentence-by-sentence with Python hypothesis lists; here all (batch,
    beam) lanes advance in one scan step).

    Returns the top hypothesis per item: (tokens (B, max_len), scores (B,)).
    """
    b, nz = z.shape
    V = cfg.vocab_size
    h, c = _dec_init_state(p, z)                       # (B, nh)
    h = jnp.repeat(h[:, None], beam, 1)                # (B, K, nh)
    c = jnp.repeat(c[:, None], beam, 1)
    tok = jnp.full((b, beam), cfg.bos_id, jnp.int32)
    # only beam 0 is live initially (all start identical)
    scores = jnp.where(jnp.arange(beam)[None, :] == 0, 0.0, -1e30)
    scores = jnp.broadcast_to(scores, (b, beam))
    finished = jnp.zeros((b, beam), bool)
    toks_acc = jnp.full((b, beam, cfg.max_len), cfg.eos_id, jnp.int32)

    zb = jnp.repeat(z[:, None], beam, 1)               # (B, K, nz)

    def step(carry, t):
        h, c, tok, scores, finished, toks_acc = carry
        emb = jnp.take(p["embed"], tok, axis=0)        # (B, K, ni)
        inp = jnp.concatenate([emb, zb], axis=-1)
        h2, c2 = lstm_cell(p["lstm"],
                           inp.reshape(b * beam, -1),
                           h.reshape(b * beam, -1),
                           c.reshape(b * beam, -1))
        logits = (h2 @ p["pred"]["w"]).reshape(b, beam, V)
        logp = jax.nn.log_softmax(logits, -1)
        # finished beams only extend with eos at no cost
        eos_only = jnp.full((V,), -1e30).at[cfg.eos_id].set(0.0)
        logp = jnp.where(finished[..., None], eos_only[None, None, :], logp)
        cand = scores[..., None] + logp                # (B, K, V)
        flat = cand.reshape(b, beam * V)
        new_scores, idx = jax.lax.top_k(flat, beam)    # (B, K)
        src_beam = idx // V
        new_tok = (idx % V).astype(jnp.int32)

        take = lambda a: jnp.take_along_axis(
            a.reshape(b, beam, -1), src_beam[..., None], axis=1)
        h = take(h2.reshape(b, beam, -1)).reshape(b, beam, -1)
        c = take(c2.reshape(b, beam, -1)).reshape(b, beam, -1)
        toks_acc = jnp.take_along_axis(toks_acc, src_beam[..., None], axis=1)
        toks_acc = toks_acc.at[:, :, t].set(new_tok)
        finished = jnp.take_along_axis(finished, src_beam, axis=1)
        finished = jnp.logical_or(finished, new_tok == cfg.eos_id)
        return (h, c, new_tok, new_scores, finished, toks_acc), None

    carry = (h, c, tok, scores, finished, toks_acc)
    carry, _ = jax.lax.scan(step, carry, jnp.arange(cfg.max_len))
    _, _, _, scores, _, toks_acc = carry
    best = jnp.argmax(scores, axis=1)
    top = jnp.take_along_axis(toks_acc, best[:, None, None], axis=1)[:, 0]
    return top, jnp.take_along_axis(scores, best[:, None], axis=1)[:, 0]


# ---------------------------------------------------------------------------
# VAE wrapper + MH posterior sampling
# ---------------------------------------------------------------------------


def init_lstm_vae(key, cfg: LSTMConfig) -> Params:
    k1, k2 = jax.random.split(key)
    return {"encoder": init_lstm_encoder(k1, cfg),
            "decoder": init_lstm_decoder(k2, cfg)}


def lstm_vae_loss(p, cfg, key, x, kl_weight, nsamples=1, *, train=False):
    """(loss, rec, kl) per item (reference Lit_vae.loss:
    modules/Lit_vae.py — same ELBO as the GPT flavor)."""
    k1, k2 = jax.random.split(key)
    z, kl = lstm_encode(p["encoder"], cfg, k1, x, nsamples)
    rec = jnp.mean(lstm_reconstruct_error(p["decoder"], cfg, x, z,
                                          train=train,
                                          rng=k2 if train else None), axis=1)
    return rec + kl_weight * kl, rec, kl


def lstm_nll_iw(p: Params, cfg: LSTMConfig, key: jax.Array, x: jnp.ndarray,
                nsamples: int = 100, ns: int = 10) -> jnp.ndarray:
    """IW estimate of -log p(x) per item -> (B,) (the reference's LIVE
    ``nll_iw``: modules/Lit_vae.py:610-643)."""
    mu, logvar = lstm_encoder_forward(p["encoder"], cfg, x)
    chunks = max(1, nsamples // ns)

    def one_chunk(k):
        z = reparameterize(k, mu, logvar, ns)                  # (B, ns, nz)
        log_px_z = lstm_log_probability(p["decoder"], cfg, x, z)
        log_pz = log_prior(z)
        log_qz = lstm_eval_inference_dist(p, cfg, x, z, param=(mu, logvar))
        return log_px_z + log_pz - log_qz

    keys = jax.random.split(key, chunks)
    lls = jax.lax.map(one_chunk, keys)                         # (C, B, ns)
    lls = jnp.moveaxis(lls, 0, 1).reshape(x.shape[0], -1)
    return -(log_sum_exp(lls, axis=1) - math.log(lls.shape[1]))


def lstm_loss_iw(p, cfg, key, x, kl_weight, nsamples: int = 50,
                 ns: int = 10):
    """IW training objective -> (loss, rec, kl) per item (the reference's
    live ``loss_iw``: modules/Lit_vae.py:542-608)."""
    k1, k2 = jax.random.split(key)
    mu, logvar = lstm_encoder_forward(p["encoder"], cfg, x)
    kl = gaussian_kl(mu, logvar)
    nll = lstm_nll_iw(p, cfg, k2, x, nsamples=nsamples, ns=ns)
    return nll + kl_weight * kl, nll, kl


def lstm_training_loss(p: Params, cfg: LSTMConfig, vae, key: jax.Array,
                       x: jnp.ndarray, kl_weight, *, nsamples: int = 1,
                       train: bool = True) -> Tuple[jnp.ndarray, Dict]:
    """Scalar training loss with the fb∈{0,1,2,3} / beta==0 / IW-train
    branch structure (reference training_step: modules/Lit_vae.py:204-272;
    same shape as the GPT flavor's gpt_vae.training_loss).  ``vae`` is a
    VAEConfig carrying beta/fb/target_kl/iw_train_nsamples."""
    from .gpt_vae import gaussian_kl_per_dim
    aux: Dict[str, jnp.ndarray] = {}

    def elbo(kw):
        return lstm_vae_loss(p, cfg, key, x, kw, nsamples, train=train)

    if vae.beta == 0 and vae.iw_train_nsamples > 0:
        loss, rec, kl = lstm_loss_iw(p, cfg, key, x, kl_weight,
                                     nsamples=vae.iw_train_nsamples,
                                     ns=max(1, vae.iw_train_ns))
    elif vae.beta == 0:
        loss, rec, kl = elbo(0.0)
    elif vae.fb == 0:
        loss, rec, kl = elbo(kl_weight)
    elif vae.fb == 1:
        _, rec, kl = elbo(kl_weight)
        kl_mask = (kl > vae.target_kl).astype(kl.dtype)
        loss = rec + kl_mask * kl_weight * kl
    elif vae.fb == 2:
        k_enc, k_dec = jax.random.split(key)
        mu, logvar = lstm_encoder_forward(p["encoder"], cfg, x)
        z = reparameterize(k_enc, mu, logvar, nsamples)
        kl_dim = gaussian_kl_per_dim(mu, logvar)
        dim_target = vae.target_kl / float(cfg.nz)
        kl_mask = (kl_dim > dim_target).astype(kl_dim.dtype)
        fake_kl = jnp.sum(kl_mask * kl_dim, axis=1)
        rec = jnp.mean(lstm_reconstruct_error(
            p["decoder"], cfg, x, z, train=train,
            rng=k_dec if train else None), axis=1)
        loss = rec + kl_weight * fake_kl
        kl = jnp.sum(kl_dim, axis=1)
        aux["fake_loss_kl"] = jnp.mean(fake_kl)
    elif vae.fb == 3:
        _, rec, kl = elbo(kl_weight)
        kl_mask = (jnp.mean(kl) > vae.target_kl).astype(kl.dtype)
        loss = rec + kl_mask * kl_weight * kl
    else:
        raise ValueError(f"unknown fb mode {vae.fb}")

    aux["loss_rc"] = jnp.sum(rec)
    aux["loss_kl"] = jnp.sum(kl)
    return jnp.mean(loss), aux


def lstm_eval_inference_dist(p, cfg, x, z, param=None):
    nz = z.shape[2]
    mu, logvar = param if param is not None else \
        lstm_encoder_forward(p, cfg, x)
    mu, logvar = mu[:, None, :], logvar[:, None, :]
    var = jnp.exp(logvar)
    dev = z - mu
    return (-0.5 * jnp.sum(dev ** 2 / var, -1)
            - 0.5 * (nz * math.log(2 * math.pi) + jnp.sum(logvar, -1)))


def mh_sample_posterior(p, cfg, key, x, nsamples: int = 10,
                        burn_in: int = 5, step_size: float = 1.0):
    """Metropolis-Hastings sampling from the true posterior p(z|x)
    (reference sample_from_posterior: modules/Lit_vae.py:723): proposals
    z' ~ N(z, step^2 I), acceptance via log p(x|z) + log p(z).
    Returns (B, nsamples, nz)."""
    mu, logvar = lstm_encoder_forward(p["encoder"], cfg, x)
    b, nz = mu.shape
    key, k0 = jax.random.split(key)
    z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(k0, mu.shape)

    def log_joint(z):
        ll = lstm_log_probability(p["decoder"], cfg, x, z[:, None, :])[:, 0]
        return ll + log_prior(z)

    def mh_step(carry, k):
        z, lj = carry
        k1, k2 = jax.random.split(k)
        prop = z + step_size * jax.random.normal(k1, z.shape)
        lj_prop = log_joint(prop)
        accept = jnp.log(jax.random.uniform(k2, (b,))) < (lj_prop - lj)
        z = jnp.where(accept[:, None], prop, z)
        lj = jnp.where(accept, lj_prop, lj)
        return (z, lj), z

    keys = jax.random.split(key, burn_in + nsamples)
    (_, _), zs = jax.lax.scan(mh_step, (z, log_joint(z)), keys)
    return jnp.swapaxes(zs[burn_in:], 0, 1)           # (B, nsamples, nz)


# ---------------------------------------------------------------------------
# LSTM language model baseline
# ---------------------------------------------------------------------------


def init_lstm_lm(key, cfg: LSTMConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    u = lambda k, s, sc: jax.random.uniform(k, s, jnp.float32, -sc, sc)
    return {"embed": u(k1, (cfg.vocab_size, cfg.ni), 0.1),
            "lstm": init_lstm(k2, cfg.ni, cfg.dec_nh),
            "pred": {"w": u(k3, (cfg.dec_nh, cfg.vocab_size), 0.01)}}


def lstm_lm_nll(p, cfg: LSTMConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Per-item summed NLL (reference: modules/lm/lm_lstm.py:14+)."""
    src, tgt = x[:, :-1], x[:, 1:]
    emb = jnp.take(p["embed"], src, axis=0)
    h0 = jnp.zeros((x.shape[0], p["lstm"]["wh"].shape[0]))
    out, _ = lstm_run(p["lstm"], emb, h0, h0)
    logits = out @ p["pred"]["w"]
    return jnp.sum(cross_entropy_loss(logits, tgt, reduce="none"), axis=-1)


# ---------------------------------------------------------------------------
# Latent-probe discriminators
# ---------------------------------------------------------------------------


def init_linear_discriminator(key, nz: int, ncls: int) -> Params:
    return {"w": 0.01 * jax.random.normal(key, (nz, ncls)),
            "b": jnp.zeros((ncls,))}


def linear_discriminator_logits(p, mean):
    """(reference: discriminator_linear.py:7)"""
    return mean @ p["w"] + p["b"]


def init_mlp_discriminator(key, nz: int, ncls: int, hidden: int = 128):
    k1, k2 = jax.random.split(key)
    return {"w1": 0.01 * jax.random.normal(k1, (nz, hidden)),
            "b1": jnp.zeros((hidden,)),
            "w2": 0.01 * jax.random.normal(k2, (hidden, ncls)),
            "b2": jnp.zeros((ncls,))}


def mlp_discriminator_logits(p, mean):
    """(reference: discriminator_linear.py:35)"""
    h = jax.nn.relu(mean @ p["w1"] + p["b1"])
    return h @ p["w2"] + p["b2"]
