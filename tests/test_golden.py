"""Golden regression tests: pin the mel frontend, VQ argmin and GPT forward
numerics across rounds (files generated on CPU at round 1; see
tests/golden/).  A failure here means a numerics-visible change — intended
changes must regenerate the goldens deliberately."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from melspec_gpt_vqvae_tpu.configs import GPTConfig, MelConfig
from melspec_gpt_vqvae_tpu.models.gpt import gpt_apply, init_gpt_params
from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
from melspec_gpt_vqvae_tpu.ops.vq import vq_nearest_index_xla

GOLD = os.path.join(os.path.dirname(__file__), "golden")


def test_mel_frontend_golden():
    cfg = MelConfig()
    t = np.arange(cfg.clip_samples) / cfg.sample_rate
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    mel = np.asarray(waveform_to_mel(jnp.asarray(wav), cfg))[:, :64]
    gold = np.load(os.path.join(GOLD, "mel_440hz.npy"))
    np.testing.assert_allclose(mel, gold, atol=1e-5)


def test_vq_indices_golden():
    rng = np.random.default_rng(12345)
    x = rng.standard_normal((265, 256)).astype(np.float32)
    cb = rng.standard_normal((128, 256)).astype(np.float32)
    idx = np.asarray(vq_nearest_index_xla(jnp.asarray(x), jnp.asarray(cb)))
    gold = np.load(os.path.join(GOLD, "vq_idx.npy"))
    np.testing.assert_array_equal(idx, gold)


def test_gpt_forward_golden():
    cfg = GPTConfig(vocab_size=17, block_size=16, n_layer=2, n_head=2,
                    n_embd=32)
    p = init_gpt_params(jax.random.PRNGKey(42), cfg)
    rng = np.random.default_rng(12345)
    _ = rng.standard_normal((265, 256))  # keep the stream position identical
    _ = rng.standard_normal((128, 256))
    toks = jnp.asarray(rng.integers(0, 17, (2, 10)), jnp.int32)
    logits, _ = gpt_apply(p, cfg, toks, use_pallas=False)
    gold = np.load(os.path.join(GOLD, "gpt_logits.npy"))
    np.testing.assert_allclose(np.asarray(logits), gold, atol=1e-5)
