"""GPT-VAE: unmasked-GPT Gaussian encoder + latent-conditioned causal GPT
decoder, with the full ELBO / free-bits / MI / AU machinery.

Capability parity with the reference stack:
  * ``GPTEncoder`` (/root/reference/transformer/encoders.py:11-170): a GPT
    run fully unmasked (``n_unmasked = block_size``) with a ``2*n_embd``
    head; the **last position's** output chunks into (mean, logvar);
    optional ``fix_var``; reparameterised sampling; closed-form KL vs
    N(0, I); log q(z|x); per-batch MI estimate.
  * ``GPTDecoder`` (/root/reference/transformer/decoders.py:10-124): causal
    GPT with z prepended as one soft token (block 266); per-(sample,
    sequence) summed CE ``reconstruct_error``; ``log_probability``;
    KV-cached AR sampling (the reference loops full forwards).
  * ``GPT_VAE`` losses (/root/reference/transformer/Lit_GPT_VAE.py:176-195,
    246-315): ELBO with KL weight, free-bits variants fb∈{0,1,2,3}, AE mode
    (beta=0), corpus MI (:395-482) and active units (:485-525).

Everything is a pure function over a {'encoder','decoder'} param pytree —
the KL-anneal schedule state lives in the train state (training/vae_task).
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs import GPTConfig, VAEConfig
from .gpt import (cross_entropy_loss, gpt_apply, gpt_generate,
                  init_gpt_params)

Params = Dict[str, Any]


class VAEConfigs(NamedTuple):
    """Derived encoder/decoder transformer configs
    (reference: Lit_GPT_VAE.py:42-43 — the encoder is built without dropout
    since GPTEncoder's ctor defaults are 0; the decoder gets args dropouts
    and block_size+1 for the z token)."""

    encoder: GPTConfig
    decoder: GPTConfig
    vae: VAEConfig

    @property
    def nz(self) -> int:
        return self.encoder.n_embd


def make_vae_configs(base: GPTConfig, vae: VAEConfig) -> VAEConfigs:
    enc = base.replace(n_unmasked=base.block_size,
                       last_linear=2 * base.n_embd,
                       embd_pdrop=0.0, resid_pdrop=0.0, attn_pdrop=0.0)
    dec = base.replace(block_size=base.block_size + 1, n_unmasked=0,
                       last_linear=None)
    return VAEConfigs(enc, dec, vae)


def init_vae_params(key: jax.Array, cfgs: VAEConfigs) -> Params:
    k1, k2 = jax.random.split(key)
    return {"encoder": init_gpt_params(k1, cfgs.encoder),
            "decoder": init_gpt_params(k2, cfgs.decoder)}


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encoder_forward(params: Params, cfgs: VAEConfigs, x: jnp.ndarray, *,
                    return_attn: bool = False, use_pallas=None, pp=None):
    """x (B, T) tokens -> (mean (B, nz), logvar (B, nz)[, attn]).

    (reference: encoders.py:21-42 — last position, chunk(2), fix_var).
    ``pp=(mesh, n_micro)`` routes the block stack through the
    pipeline-parallel schedule (parallel/pipeline.py); attention-map
    requests stay on the sequential path (media/eval only)."""
    if pp is not None and not return_attn:
        from ..parallel.pipeline import gpt_apply_pp
        logits = gpt_apply_pp(params["encoder"], cfgs.encoder, x,
                              mesh=pp[0], n_micro=pp[1],
                              use_pallas=use_pallas)
        att = None
    else:
        logits, att = gpt_apply(params["encoder"], cfgs.encoder, x,
                                return_attn=return_attn,
                                use_pallas=use_pallas)
    last = logits[:, -1, :]
    mean, logvar = jnp.split(last, 2, axis=-1)
    if cfgs.vae.fix_var > 0:
        logvar = jnp.full_like(mean, math.log(cfgs.vae.fix_var))
    if return_attn:
        return mean, logvar, att
    return mean, logvar


def reparameterize(key: jax.Array, mu: jnp.ndarray, logvar: jnp.ndarray,
                   nsamples: int = 1) -> jnp.ndarray:
    """(B, nz) -> (B, nsamples, nz) (reference: encoders.py:81-104)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(key, (mu.shape[0], nsamples, mu.shape[1]),
                            mu.dtype)
    return mu[:, None, :] + eps * std[:, None, :]


def gaussian_kl(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """KL(q || N(0, I)) summed over dims -> (B,)
    (reference: encoders.py:77)."""
    return 0.5 * jnp.sum(mu ** 2 + jnp.exp(logvar) - logvar - 1.0, axis=1)


def gaussian_kl_per_dim(mu: jnp.ndarray, logvar: jnp.ndarray) -> jnp.ndarray:
    """(B, nz) per-dimension KL (for fb=2 free bits,
    reference: Lit_GPT_VAE.py:277-285)."""
    return 0.5 * (mu ** 2 + jnp.exp(logvar) - logvar - 1.0)


def encode(params: Params, cfgs: VAEConfigs, key: jax.Array, x: jnp.ndarray,
           nsamples: int = 1, *, use_pallas=None, pp=None):
    """-> (z (B, ns, nz), KL (B,)) (reference: encoders.py:62-79)."""
    mu, logvar = encoder_forward(params, cfgs, x, use_pallas=use_pallas,
                                 pp=pp)
    z = reparameterize(key, mu, logvar, nsamples)
    return z, gaussian_kl(mu, logvar)


def eval_inference_dist(params: Params, cfgs: VAEConfigs, x: jnp.ndarray,
                        z: jnp.ndarray, param=None) -> jnp.ndarray:
    """log q(z|x) -> (B, nsamples) (reference: encoders.py:106-134)."""
    nz = z.shape[2]
    if param is None:
        mu, logvar = encoder_forward(params, cfgs, x)
    else:
        mu, logvar = param
    mu, logvar = mu[:, None, :], logvar[:, None, :]
    var = jnp.exp(logvar)
    dev = z - mu
    return (-0.5 * jnp.sum(dev ** 2 / var, axis=-1)
            - 0.5 * (nz * math.log(2 * math.pi) + jnp.sum(logvar, -1)))


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decoder_logits(params: Params, cfgs: VAEConfigs, x: jnp.ndarray,
                   z_one: jnp.ndarray, *, train: bool = False,
                   rng: Optional[jax.Array] = None, use_pallas=None,
                   pp=None):
    """Teacher-forced decoder logits for one z sample.

    x: (B, T) targets; z_one: (B, nz).  Input is [z, x[:, :-1]], output is
    cut so position i predicts p(x_i | x_<i, z)
    (reference: decoders.py:23-38 with cond length 1).
    """
    cond = z_one[:, None, :]
    if pp is not None:
        from ..parallel.pipeline import gpt_apply_pp
        return gpt_apply_pp(params["decoder"], cfgs.decoder, x[:, :-1],
                            cond, mesh=pp[0], n_micro=pp[1], train=train,
                            rng=rng, use_pallas=use_pallas)
    logits, _ = gpt_apply(params["decoder"], cfgs.decoder, x[:, :-1], cond,
                          train=train, rng=rng, use_pallas=use_pallas)
    return logits  # (B, T, V): cond contributes 1, x contributes T-1


def reconstruct_error(params: Params, cfgs: VAEConfigs, x: jnp.ndarray,
                      z: jnp.ndarray, *, train: bool = False,
                      rng: Optional[jax.Array] = None,
                      use_pallas=None, pp=None) -> jnp.ndarray:
    """Summed CE per (batch, sample) -> (B, ns)
    (reference: decoders.py:40-68)."""
    def one(z_s, k):
        logits = decoder_logits(params, cfgs, x, z_s, train=train, rng=k,
                                use_pallas=use_pallas, pp=pp)
        nll = cross_entropy_loss(logits, x, reduce="none")  # (B, T)
        return jnp.sum(nll, axis=-1)

    ns = z.shape[1]
    if rng is not None:
        keys = jax.random.split(rng, ns)
    else:
        from .gpt import _raw_key_zeros
        keys = _raw_key_zeros((ns,))
    if ns == 1:
        # the common path: skip vmap entirely (batching a 24-layer remat
        # scan through vmap multiplies compile time for nothing)
        return one(z[:, 0, :], keys[0])[:, None]
    if pp is not None:
        # vmap-of-shard_map is off the beaten path; ns is a small static
        # count, so an unrolled stack is the safe equivalent
        return jnp.stack([one(z[:, i, :], keys[i]) for i in range(ns)],
                         axis=1)
    errs = jax.vmap(one, in_axes=(1, 0), out_axes=1)(z, keys)
    return errs  # (B, ns)


def log_probability(params, cfgs, x, z, *, pp=None) -> jnp.ndarray:
    """log p(x|z) = -reconstruct_error (reference: decoders.py:71-81)."""
    return -reconstruct_error(params, cfgs, x, z, pp=pp)


@functools.partial(jax.jit, static_argnames=("cfgs", "strategy", "top_k",
                                             "temperature", "use_pallas",
                                             "segments"))
def vae_decode(params: Params, cfgs: VAEConfigs, key: jax.Array,
               z: jnp.ndarray, strategy: str = "greedy",
               top_k: Optional[int] = None,
               temperature: Optional[float] = None,
               use_pallas=None, segments: int = 4) -> jnp.ndarray:
    """Generate token sequences from z.

    Strategies mirror the reference (Lit_GPT_VAE.py:108-143): "greedy" and
    "sample" are deterministic argmax; "beam" is actually top-k sampling
    (see the TODO acknowledged at GPT_VAE_callbacks.py:249-250).
    Returns (B, block_size) tokens.
    """
    cond = z[:, 0:1, :] if z.ndim == 3 else z[:, None, :]
    steps = cfgs.encoder.block_size
    if strategy == "beam":
        return gpt_generate(params["decoder"], cfgs.decoder, key, cond, None,
                            steps=steps, sample=True,
                            top_k=top_k if top_k is not None else 100,
                            temperature=temperature or 1.0,
                            use_pallas=use_pallas, segments=segments)
    return gpt_generate(params["decoder"], cfgs.decoder, key, cond, None,
                        steps=steps, sample=False, use_pallas=use_pallas,
                        segments=segments)


def reconstruct(params: Params, cfgs: VAEConfigs, key: jax.Array,
                x: jnp.ndarray, strategy: str = "greedy",
                use_pallas=None) -> jnp.ndarray:
    """Encode -> sample one z -> decode
    (reference: Lit_GPT_VAE.py:157-173)."""
    k1, k2 = jax.random.split(key)
    mu, logvar = encoder_forward(params, cfgs, x, use_pallas=use_pallas)
    z = reparameterize(k1, mu, logvar, 1)
    return vae_decode(params, cfgs, k2, z, strategy, use_pallas=use_pallas)


def sample_from_prior(key: jax.Array, cfgs: VAEConfigs,
                      nsamples: int) -> jnp.ndarray:
    """(nsamples, nz) ~ N(0, I) (reference: Lit_GPT_VAE.py:611-617)."""
    return jax.random.normal(key, (nsamples, cfgs.nz))


# ---------------------------------------------------------------------------
# Losses (ELBO + free-bits variants)
# ---------------------------------------------------------------------------


def elbo_loss(params: Params, cfgs: VAEConfigs, key: jax.Array,
              x: jnp.ndarray, kl_weight: float | jnp.ndarray,
              nsamples: int = 1, *, train: bool = False,
              use_pallas=None, pp=None) -> Tuple[jnp.ndarray, jnp.ndarray,
                                                 jnp.ndarray]:
    """-> (loss (B,), rec (B,), kl (B,))
    (reference ``GPT_VAE.loss``: Lit_GPT_VAE.py:176-195)."""
    k_enc, k_dec = jax.random.split(key)
    z, kl = encode(params, cfgs, k_enc, x, nsamples, use_pallas=use_pallas,
                   pp=pp)
    rec = jnp.mean(reconstruct_error(params, cfgs, x, z, train=train,
                                     rng=k_dec if train else None,
                                     use_pallas=use_pallas, pp=pp), axis=1)
    return rec + kl_weight * kl, rec, kl


def loss_iw(params: Params, cfgs: VAEConfigs, key: jax.Array,
            x: jnp.ndarray, kl_weight, nsamples: int = 50, ns: int = 10, *,
            use_pallas=None, pp=None):
    """Importance-weighted training objective -> (loss (B,), rec (B,), kl (B,))
    (the reference's ``loss_iw``, live in modules/Lit_vae.py:542 and
    commented at Lit_GPT_VAE.py:622-745): loss = -IW-logp + analytic-KL
    reweighting; here simply the differentiable IW NLL plus kl_weight*KL so
    beta scheduling still applies."""
    k1, k2 = jax.random.split(key)
    mu, logvar = encoder_forward(params, cfgs, x, use_pallas=use_pallas,
                                 pp=pp)
    kl = gaussian_kl(mu, logvar)
    # pass the posterior through so nll_iw does not trace a second
    # encoder forward (CSE across remat-wrapped scans is not guaranteed)
    nll = nll_iw(params, cfgs, k2, x, nsamples=nsamples, ns=ns,
                 use_pallas=use_pallas, pp=pp, posterior=(mu, logvar))
    return nll + kl_weight * kl, nll, kl


def training_loss(params: Params, cfgs: VAEConfigs, key: jax.Array,
                  x: jnp.ndarray, kl_weight: jnp.ndarray, *,
                  nsamples: int = 1, train: bool = True,
                  use_pallas=None, pp=None) -> Tuple[jnp.ndarray, Dict]:
    """Scalar training loss with the fb∈{0,1,2,3} / beta==0 branch structure
    (reference: Lit_GPT_VAE.py:246-315).  Branches are static (config),
    matching XLA's compile-once model.
    """
    vae = cfgs.vae
    aux: Dict[str, jnp.ndarray] = {}

    if vae.beta == 0 and vae.iw_train_nsamples > 0:
        # beta==0 + IW flag: IW objective (reference: Lit_GPT_VAE.py:264-268)
        loss, rec, kl = loss_iw(params, cfgs, key, x, kl_weight,
                                nsamples=vae.iw_train_nsamples,
                                ns=max(1, vae.iw_train_ns),
                                use_pallas=use_pallas, pp=pp)
    elif vae.beta == 0:  # plain AE: kl ignored (kl_weight forced 0 upstream)
        loss, rec, kl = elbo_loss(params, cfgs, key, x, 0.0, nsamples,
                                  train=train, use_pallas=use_pallas, pp=pp)
    elif vae.fb == 0:
        loss, rec, kl = elbo_loss(params, cfgs, key, x, kl_weight, nsamples,
                                  train=train, use_pallas=use_pallas, pp=pp)
    elif vae.fb == 1:
        _, rec, kl = elbo_loss(params, cfgs, key, x, kl_weight, nsamples,
                               train=train, use_pallas=use_pallas, pp=pp)
        kl_mask = (kl > vae.target_kl).astype(kl.dtype)
        loss = rec + kl_mask * kl_weight * kl
    elif vae.fb == 2:
        k_enc, k_dec = jax.random.split(key)
        mu, logvar = encoder_forward(params, cfgs, x, use_pallas=use_pallas,
                                     pp=pp)
        z = reparameterize(k_enc, mu, logvar, nsamples)
        kl_dim = gaussian_kl_per_dim(mu, logvar)
        dim_target = vae.target_kl / float(cfgs.nz)
        kl_mask = (kl_dim > dim_target).astype(kl_dim.dtype)
        fake_kl = jnp.sum(kl_mask * kl_dim, axis=1)
        rec = jnp.mean(reconstruct_error(params, cfgs, x, z, train=train,
                                         rng=k_dec if train else None,
                                         use_pallas=use_pallas, pp=pp),
                       axis=1)
        loss = rec + kl_weight * fake_kl
        kl = jnp.sum(kl_dim, axis=1)
        aux["fake_loss_kl"] = jnp.mean(fake_kl)
    elif vae.fb == 3:
        _, rec, kl = elbo_loss(params, cfgs, key, x, kl_weight, nsamples,
                               train=train, use_pallas=use_pallas, pp=pp)
        kl_mask = (jnp.mean(kl) > vae.target_kl).astype(kl.dtype)
        loss = rec + kl_mask * kl_weight * kl
    else:
        raise ValueError(f"unknown fb mode {vae.fb}")

    aux["loss_rc"] = jnp.sum(rec)
    aux["loss_kl"] = jnp.sum(kl)
    return jnp.mean(loss), aux


# ---------------------------------------------------------------------------
# Importance-weighted NLL (the reference's calc_iwnll / nll_iw path:
# /root/reference/utils.py:50-77 + modules/Lit_vae.py:610-668; the GPT flavor
# exists only as commented-out code at Lit_GPT_VAE.py:620-882 — here it is a
# live, jitted implementation)
# ---------------------------------------------------------------------------


def log_prior(z: jnp.ndarray) -> jnp.ndarray:
    """log N(z; 0, I) summed over the last dim."""
    return jnp.sum(-0.5 * (z ** 2) - 0.5 * math.log(2 * math.pi), axis=-1)


def nll_iw(params: Params, cfgs: VAEConfigs, key: jax.Array, x: jnp.ndarray,
           nsamples: int = 500, ns: int = 10, *,
           use_pallas=None, pp=None, posterior=None) -> jnp.ndarray:
    """IW estimate of -log p(x) per item -> (B,).

    -log p(x) ~= -[logsumexp_i (log p(x|z_i) + log p(z_i) - log q(z_i|x))
                   - log nsamples],  z_i ~ q(z|x), in chunks of ``ns``.
    ``posterior``: optional precomputed (mu, logvar) from a caller that
    already ran the encoder (loss_iw), saving a duplicate forward.
    """
    mu, logvar = posterior if posterior is not None else encoder_forward(
        params, cfgs, x, use_pallas=use_pallas, pp=pp)
    chunks = max(1, nsamples // ns)

    def one_chunk(k):
        z = reparameterize(k, mu, logvar, ns)              # (B, ns, nz)
        log_px_z = log_probability(params, cfgs, x, z, pp=pp)  # (B, ns)
        log_pz = log_prior(z)                              # (B, ns)
        log_qz = eval_inference_dist(params, cfgs, x, z,
                                     param=(mu, logvar))   # (B, ns)
        return log_px_z + log_pz - log_qz

    keys = jax.random.split(key, chunks)
    # lax.map keeps the compiled program one-chunk-sized (50 chunks of a
    # 24-layer decoder would otherwise unroll into a huge jaxpr)
    lls = jax.lax.map(one_chunk, keys)                     # (chunks, B, ns)
    lls = jnp.moveaxis(lls, 0, 1).reshape(x.shape[0], -1)  # (B, chunks*ns)
    return -(log_sum_exp(lls, axis=1) - math.log(lls.shape[1]))


# ---------------------------------------------------------------------------
# Mutual information / active units (corpus-level research metrics)
# ---------------------------------------------------------------------------


def log_sum_exp(value: jnp.ndarray, axis: int) -> jnp.ndarray:
    return jax.scipy.special.logsumexp(value, axis=axis)


def mi_from_posteriors(key: jax.Array, mu: jnp.ndarray,
                       logvar: jnp.ndarray,
                       chunk: int = 512) -> jnp.ndarray:
    """I(x, z) estimate from a corpus of posterior params
    (reference calc_mi v3: Lit_GPT_VAE.py:395-482, encoders.py:136-170).

    mu, logvar: (N, nz) for the whole eval corpus.

    Memory-bounded: the reference streams z-batches against the full
    posterior list, materialising (B, N, nz) per step
    (Lit_GPT_VAE.py:424-462).  A direct JAX translation
    (``z[:, None] - mu[None]``) is an (N, N, nz) tensor — ~2.1 TB at
    VGGSound scale (19,034² × 1472).  Instead the Mahalanobis quadratic is
    expanded into matmuls,

        sum_d (z_id - mu_jd)² / var_jd
            = (z²) @ (1/var)ᵀ - 2 z @ (mu/var)ᵀ + Σ_d mu_jd²/var_jd,

    and ``lax.map`` walks z in chunks of ``chunk`` rows, so peak memory is
    O(chunk · N) and the FLOPs land on the MXU.  z and mu are re-centered
    on the corpus posterior mean first (dev is translation-invariant) to
    keep the expanded terms small; the matmuls run at precision=HIGHEST so
    the f32 cancellation stays benign on TPU (bf16 passes otherwise).
    """
    n, nz = mu.shape
    neg_entropy = jnp.mean(-0.5 * nz * math.log(2 * math.pi)
                           - 0.5 * jnp.sum(1 + logvar, axis=-1))
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    z = mu + eps * jnp.exp(0.5 * logvar)              # (N, nz), one z per x
    # log q(z_i) = logsumexp_j log N(z_i; mu_j, var_j) - log N
    center = jnp.mean(mu, axis=0)
    zc, muc = z - center, mu - center
    inv_var = jnp.exp(-logvar)                        # (N, nz)
    a = inv_var.T                                     # (nz, N)
    b = (muc * inv_var).T                             # (nz, N)
    cvec = (jnp.sum(muc ** 2 * inv_var, axis=-1)
            + nz * math.log(2 * math.pi) + jnp.sum(logvar, axis=-1))  # (N,)

    chunk = min(chunk, n)
    pad = (-n) % chunk
    zp = jnp.pad(zc, ((0, pad), (0, 0)))

    def body(z_chunk):                                # (chunk, nz) -> (chunk,)
        quad = (jnp.dot(z_chunk ** 2, a, precision=jax.lax.Precision.HIGHEST)
                - 2.0 * jnp.dot(z_chunk, b,
                                precision=jax.lax.Precision.HIGHEST))
        log_density = -0.5 * (quad + cvec[None, :])
        return log_sum_exp(log_density, axis=1) - math.log(n)

    log_qz = jax.lax.map(body, zp.reshape(-1, chunk, nz)).reshape(-1)[:n]
    return neg_entropy - jnp.mean(log_qz)


def active_units_from_means(means: jnp.ndarray,
                            delta: float = 0.01) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """AU = #dims whose posterior-mean variance across the corpus >= delta
    (reference calc_au: Lit_GPT_VAE.py:485-525)."""
    mean_mean = jnp.mean(means, axis=0, keepdims=True)
    au_var = jnp.sum((means - mean_mean) ** 2, axis=0) / (means.shape[0] - 1)
    return jnp.sum(au_var >= delta), au_var


def corpus_mi_and_au(params: Params, cfgs: VAEConfigs, key: jax.Array,
                     batches, delta: float = 0.01):
    """Stream posterior params over eval batches, then compute MI + AU.

    ``batches`` yields (B, T) token arrays (host loop; each encoder forward
    is jitted).  COLLECTIVE under multi-process execution: the posteriors
    are pooled across processes (``parallel.reduce.pool_posteriors``) so
    the statistics cover the FULL corpus — matching the reference, which
    computes MI/AU over the whole val set on every rank
    (callbacks/GPT_VAE_callbacks.py:429-436).  Returns ``(nan, 0, zeros)``
    when the global corpus has fewer than 2 rows.
    """
    from ..parallel.reduce import (concat_gather_fn, cross_process_sharded,
                                   pool_posteriors)
    if concat_gather_fn() is not None and cross_process_sharded(params):
        # raised by EVERY rank (the sharding of the global param arrays is
        # identical everywhere), never by a subset mid-collective
        raise NotImplementedError(
            "corpus MI/AU under multi-process eval needs host-fetchable "
            "posteriors; run eval with replicated (data-parallel) params, "
            "not cross-process model/pipe sharding")
    mus, logvars = [], []
    # params passed as a traced arg (closing over them would bake 24L of
    # weights into the jaxpr as constants)
    enc = jax.jit(lambda p, x: encoder_forward(p, cfgs, x))
    for x in batches:
        mu, logvar = enc(params, jnp.asarray(x))
        mus.append(mu)
        logvars.append(logvar)
    pooled = pool_posteriors(mus, logvars, cfgs.nz)
    if pooled is None:
        return float("nan"), 0, jnp.zeros((cfgs.nz,), jnp.float32)
    mu, logvar = pooled
    mi = mi_from_posteriors(key, mu, logvar)
    au, au_var = active_units_from_means(mu, delta)
    return float(mi), int(au), au_var
