"""MelGAN vocoder tests: upsampling geometry (hop 256) and determinism."""

import jax
import jax.numpy as jnp
import numpy as np

from melspec_gpt_vqvae_tpu.configs import VocoderConfig
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator, vocode

SMALL = VocoderConfig(n_mel_channels=8, ngf=4, n_residual_layers=1)


def test_generator_upsamples_by_hop():
    gen = MelGANGenerator(SMALL)
    mel = jnp.zeros((1, 20, 8))
    params = gen.init(jax.random.PRNGKey(0), mel)["params"]
    wav = gen.apply({"params": params}, mel)
    assert wav.shape == (1, 20 * int(np.prod(SMALL.ratios)))


def test_output_bounded_by_tanh():
    gen = MelGANGenerator(SMALL)
    mel = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 12, 8)),
                      jnp.float32)
    params = gen.init(jax.random.PRNGKey(1), mel)["params"]
    wav = np.asarray(gen.apply({"params": params}, mel))
    assert (np.abs(wav) <= 1.0).all()
    assert wav.shape == (2, 12 * 256)


def test_vocode_convention():
    """vocode takes (B, n_mels, T) like the reference callback
    (/root/reference/callbacks/GPT_callbacks.py:96-102)."""
    gen = MelGANGenerator(SMALL)
    mel_tc = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 10, 8)),
                         jnp.float32)
    params = gen.init(jax.random.PRNGKey(2), mel_tc)["params"]
    wav = vocode(params, jnp.swapaxes(mel_tc, 1, 2), SMALL)
    wav2 = gen.apply({"params": params}, mel_tc)
    np.testing.assert_allclose(np.asarray(wav), np.asarray(wav2), atol=1e-6)
