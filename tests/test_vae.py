"""GPT-VAE tests: ELBO math, KL closed forms, free-bits branches, MI/AU on
synthetic posteriors, decode strategies.

Semantics pinned by /root/reference/transformer/encoders.py, decoders.py and
Lit_GPT_VAE.py (see module docstrings in models/gpt_vae.py).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import GPTConfig, VAEConfig
from melspec_gpt_vqvae_tpu.models import gpt_vae as V

BASE = GPTConfig(vocab_size=11, block_size=12, n_layer=2, n_head=2, n_embd=16)


def _setup(vae_kw=None, seed=0):
    cfgs = V.make_vae_configs(BASE, VAEConfig(nz=16, **(vae_kw or {})))
    params = V.init_vae_params(jax.random.PRNGKey(seed), cfgs)
    return cfgs, params


def test_config_derivation():
    cfgs, _ = _setup()
    # encoder fully unmasked with a 2*nz head (reference: Lit_GPT_VAE.py:42)
    assert cfgs.encoder.n_unmasked == 12
    assert cfgs.encoder.last_linear == 32
    # decoder gets one extra slot for the z token (reference: :43)
    assert cfgs.decoder.block_size == 13
    assert cfgs.decoder.last_linear is None


def test_encoder_outputs_and_fix_var():
    cfgs, params = _setup()
    x = jnp.asarray(np.random.default_rng(0).integers(0, 11, (3, 12)))
    mu, logvar = V.encoder_forward(params, cfgs, x)
    assert mu.shape == (3, 16) and logvar.shape == (3, 16)

    cfgs_fv, _ = _setup({"fix_var": 0.25})
    _, logvar_fv = V.encoder_forward(params, cfgs_fv, x)
    np.testing.assert_allclose(np.asarray(logvar_fv),
                               math.log(0.25), atol=1e-6)


def test_gaussian_kl_closed_form():
    # KL(N(mu, var) || N(0,1)) hand-computed
    mu = jnp.asarray([[1.0, 0.0]])
    logvar = jnp.asarray([[0.0, math.log(4.0)]])
    kl = float(V.gaussian_kl(mu, logvar)[0])
    expected = 0.5 * (1.0 + 1.0 - 0.0 - 1.0) + 0.5 * (4.0 - math.log(4.0) - 1)
    assert abs(kl - expected) < 1e-5
    # per-dim version sums to the total
    per = V.gaussian_kl_per_dim(mu, logvar)
    assert abs(float(per.sum()) - kl) < 1e-5


def test_reparameterize_stats():
    key = jax.random.PRNGKey(0)
    mu = jnp.ones((2, 4)) * 3.0
    logvar = jnp.zeros((2, 4))
    z = V.reparameterize(key, mu, logvar, 2000)
    assert z.shape == (2, 2000, 4)
    assert abs(float(z.mean()) - 3.0) < 0.05
    assert abs(float(z.std()) - 1.0) < 0.05


def test_eval_inference_dist_matches_gaussian_logpdf():
    cfgs, params = _setup()
    mu = jnp.asarray([[0.5] * 16])
    logvar = jnp.asarray([[math.log(2.0)] * 16])
    z = jnp.zeros((1, 1, 16))
    got = float(V.eval_inference_dist(None, cfgs, None, z,
                                      param=(mu, logvar))[0, 0])
    expected = 16 * float(
        -0.5 * np.log(2 * np.pi * 2.0) - (0.0 - 0.5) ** 2 / (2 * 2.0))
    assert abs(got - expected) < 1e-3


def test_reconstruct_error_shape_and_consistency():
    cfgs, params = _setup()
    x = jnp.asarray(np.random.default_rng(1).integers(0, 11, (2, 12)))
    z = jnp.asarray(np.random.default_rng(2).standard_normal((2, 3, 16)),
                    jnp.float32)
    err = V.reconstruct_error(params, cfgs, x, z)
    assert err.shape == (2, 3)
    assert (np.asarray(err) > 0).all()
    # log_probability is its negation (reference: decoders.py:71-81)
    np.testing.assert_allclose(np.asarray(V.log_probability(params, cfgs, x, z)),
                               -np.asarray(err), atol=1e-6)
    # per-sample errors differ for different z
    assert not np.allclose(np.asarray(err[:, 0]), np.asarray(err[:, 1]))


def test_elbo_and_fb_branches():
    x = jnp.asarray(np.random.default_rng(3).integers(0, 11, (4, 12)))
    key = jax.random.PRNGKey(0)

    cfgs, params = _setup()
    loss, rec, kl = V.elbo_loss(params, cfgs, key, x, 0.5)
    np.testing.assert_allclose(np.asarray(loss),
                               np.asarray(rec + 0.5 * kl), rtol=1e-5)

    for fb, kw in [(0, {}), (1, {"fb": 1, "target_kl": 1.0}),
                   (2, {"fb": 2, "target_kl": 1.0}),
                   (3, {"fb": 3, "target_kl": 1.0})]:
        cfgs_fb, params_fb = _setup(kw)
        l, aux = V.training_loss(params_fb, cfgs_fb, key, x,
                                 jnp.asarray(0.7))
        assert np.isfinite(float(l)), f"fb={fb}"
        assert "loss_rc" in aux and "loss_kl" in aux
    # AE mode
    cfgs_ae, params_ae = _setup({"beta": 0.0})
    l, aux = V.training_loss(params_ae, cfgs_ae, key, x, jnp.asarray(0.0))
    assert np.isfinite(float(l))


def test_decode_strategies():
    cfgs, params = _setup()
    z = jnp.asarray(np.random.default_rng(4).standard_normal((2, 1, 16)),
                    jnp.float32)
    key = jax.random.PRNGKey(0)
    greedy = V.vae_decode(params, cfgs, key, z, "greedy", use_pallas=False)
    assert greedy.shape == (2, 12)
    # "sample" is also deterministic argmax (reference: Lit_GPT_VAE.py:134-138)
    sample = V.vae_decode(params, cfgs, key, z, "sample", use_pallas=False)
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sample))
    beam = V.vae_decode(params, cfgs, key, z, "beam", top_k=5,
                        use_pallas=False)
    assert beam.shape == (2, 12)


def test_reconstruct_roundtrip_shapes():
    cfgs, params = _setup()
    x = jnp.asarray(np.random.default_rng(5).integers(0, 11, (2, 12)))
    rec = V.reconstruct(params, cfgs, jax.random.PRNGKey(0), x,
                        use_pallas=False)
    assert rec.shape == x.shape
    assert int(rec.max()) < 11


def test_mi_on_synthetic_posteriors():
    key = jax.random.PRNGKey(0)
    n, nz = 128, 8
    # posteriors all equal to the prior => MI ~ 0
    mu = jnp.zeros((n, nz))
    logvar = jnp.zeros((n, nz))
    mi0 = float(V.mi_from_posteriors(key, mu, logvar))
    assert abs(mi0) < 0.3
    # well-separated means, tiny variance => high MI (~log n achievable)
    mu2 = jnp.asarray(np.random.default_rng(0).standard_normal((n, nz)) * 10,
                      jnp.float32)
    logvar2 = jnp.full((n, nz), -6.0)
    mi2 = float(V.mi_from_posteriors(key, mu2, logvar2))
    assert mi2 > 3.0
    assert mi2 <= math.log(n) + 0.1


def _mi_direct(key, mu, logvar):
    """Direct (N, N, nz) reference form of the MI estimator, for
    equivalence-testing the matmul-expanded chunked implementation."""
    n, nz = mu.shape
    neg_entropy = jnp.mean(-0.5 * nz * math.log(2 * math.pi)
                           - 0.5 * jnp.sum(1 + logvar, axis=-1))
    eps = jax.random.normal(key, mu.shape, mu.dtype)
    z = mu + eps * jnp.exp(0.5 * logvar)
    dev = z[:, None, :] - mu[None, :, :]
    var = jnp.exp(logvar)[None, :, :]
    log_density = (-0.5 * jnp.sum(dev ** 2 / var, axis=-1)
                   - 0.5 * (nz * math.log(2 * math.pi)
                            + jnp.sum(logvar, -1)[None, :]))
    log_qz = V.log_sum_exp(log_density, axis=1) - math.log(n)
    return neg_entropy - jnp.mean(log_qz)


def test_mi_matches_direct_form():
    """The chunked matmul expansion equals the direct (N,N,nz) estimator,
    including when N is not a multiple of the chunk size."""
    rng = np.random.default_rng(7)
    key = jax.random.PRNGKey(3)
    n, nz = 77, 13
    mu = jnp.asarray(rng.standard_normal((n, nz)) * 3 + 5, jnp.float32)
    logvar = jnp.asarray(rng.standard_normal((n, nz)) * 0.5, jnp.float32)
    direct = float(_mi_direct(key, mu, logvar))
    chunked = float(V.mi_from_posteriors(key, mu, logvar, chunk=16))
    assert abs(direct - chunked) < 1e-3, (direct, chunked)
    one_chunk = float(V.mi_from_posteriors(key, mu, logvar, chunk=4096))
    assert abs(direct - one_chunk) < 1e-3


@pytest.mark.slow
def test_mi_bounded_memory_at_vggsound_width():
    """N=4096 posteriors at the VGGSound latent width (nz=1472): the direct
    form would need N²·nz·4 = ~99 GB; the chunked form peaks at
    O(chunk·N) and must simply run on this host."""
    rng = np.random.default_rng(0)
    n, nz = 4096, 1472
    mu = jnp.asarray(rng.standard_normal((n, nz)), jnp.float32)
    logvar = jnp.asarray(rng.standard_normal((n, nz)) * 0.1 - 1.0,
                         jnp.float32)
    mi = float(V.mi_from_posteriors(jax.random.PRNGKey(0), mu, logvar,
                                    chunk=512))
    assert np.isfinite(mi)


def test_active_units():
    means = jnp.asarray(np.concatenate([
        np.random.default_rng(0).standard_normal((64, 3)),  # active dims
        np.zeros((64, 5)) + 0.001,                          # dead dims
    ], axis=1), jnp.float32)
    au, au_var = V.active_units_from_means(means, delta=0.01)
    assert int(au) == 3
    assert au_var.shape == (8,)


def test_sample_from_prior():
    cfgs, _ = _setup()
    z = V.sample_from_prior(jax.random.PRNGKey(0), cfgs, 7)
    assert z.shape == (7, 16)


def test_iw_nll_tighter_than_elbo():
    """IW bound with many samples is tighter (lower NLL) than the 1-sample
    ELBO bound, and finite."""
    cfgs, params = _setup()
    x = jnp.asarray(np.random.default_rng(11).integers(0, 11, (3, 12)))
    key = jax.random.PRNGKey(0)
    nll_iw_est = V.nll_iw(params, cfgs, key, x, nsamples=20, ns=5,
                          use_pallas=False)
    assert nll_iw_est.shape == (3,)
    assert np.isfinite(np.asarray(nll_iw_est)).all()
    _, rec, kl = V.elbo_loss(params, cfgs, key, x, 1.0, nsamples=1,
                             use_pallas=False)
    elbo_bound = np.asarray(rec + kl)
    # log-sum-exp over samples can only tighten the bound (up to MC noise)
    assert (np.asarray(nll_iw_est) <= elbo_bound + 5.0).all()


def test_loss_iw_training_objective():
    cfgs, params = _setup({"beta": 0.0, "iw_train_nsamples": 10})
    x = jnp.asarray(np.random.default_rng(12).integers(0, 11, (2, 12)))
    l, aux = V.training_loss(params, cfgs, jax.random.PRNGKey(0), x,
                             jnp.asarray(0.5), use_pallas=False)
    assert np.isfinite(float(l))
    # differentiable
    g = jax.grad(lambda p: V.training_loss(p, cfgs, jax.random.PRNGKey(0),
                                           x, jnp.asarray(0.5),
                                           use_pallas=False)[0])(params)
    gn = sum(float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0
