"""Media-callback tests with real (tiny, random) frozen decoders: the
codes->spec->audio chain, attention heatmaps, TB logging end-to-end."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import (ExperimentConfig, GPTConfig,
                                           TrainConfig, VAEConfig,
                                           VocoderConfig, VQVAEConfig)
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator
from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
from melspec_gpt_vqvae_tpu.parallel import make_mesh
from melspec_gpt_vqvae_tpu.training.callbacks import (FrozenDecoders,
                                                      GPTImageLogger,
                                                      VAETextLogger)
from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask
from melspec_gpt_vqvae_tpu.training.logging import TBLogger, attention_image
from melspec_gpt_vqvae_tpu.training.vae_task import VAETask

pytestmark = pytest.mark.slow  # training loops; default lane: -m 'not slow'

VQ_TINY = VQVAEConfig(num_embeddings=16, embedding_dim=8, ch=8,
                      ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
                      resolution=16, z_channels=8, code_h=4, code_w=5)
VOC_TINY = VocoderConfig(n_mel_channels=8, ngf=4, n_residual_layers=1)


@pytest.fixture(scope="module")
def decoders():
    vq = VQModel(VQ_TINY)
    vq_params = vq.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 8, 10, 1)))["params"]
    gen = MelGANGenerator(VOC_TINY)
    voc_params = gen.init(jax.random.PRNGKey(1),
                          jnp.zeros((1, 10, 8)))["params"]
    return FrozenDecoders(VQ_TINY, vq_params, VOC_TINY, voc_params,
                          code_h=4, code_w=5)


def _batch(b=2):
    rng = np.random.default_rng(0)
    return {"codes": rng.integers(0, 16, (b, 4, 5)).astype(np.int32),
            "target": rng.integers(0, 2, (b,)).astype(np.int32),
            "label": ["dog"] * b,
            "image": rng.uniform(-1, 1, (b, 8, 10)).astype(np.float32)}


def test_codes_to_spec_and_audio(decoders):
    seq = np.random.default_rng(1).integers(0, 16, (2, 20))
    spec = decoders.codes_to_spec(seq)
    assert spec.shape == (2, 8, 10)
    audio = decoders.spec_to_audio(spec[0])
    assert audio.shape == (10 * 256,)
    assert np.isfinite(audio).all()


def test_attention_image_normalised():
    att = np.random.default_rng(2).uniform(0, 1, (1, 2, 6, 6))
    att = att / att.sum(-1, keepdims=True)
    img = attention_image(att)
    assert img.shape == (1, 6, 6)
    assert img.min() >= 0 and img.max() <= 1.0 + 1e-6


def test_gpt_image_logger_with_decoders(decoders, tmp_path):
    cfg = GPTConfig(vocab_size=16, block_size=21, n_layer=1, n_head=2,
                    n_embd=16, class_size=2)
    exp = ExperimentConfig(model=cfg, vae=VAEConfig(nz=16),
                           train=TrainConfig(batch_size=2))
    task = GPTTask(exp, mesh=make_mesh({"data": 2}), use_pallas=False)
    state = task.init_state(0)
    log = TBLogger(str(tmp_path / "logs"))
    cb = GPTImageLogger(task, log, decoders, sample_rate=22050)
    cb(state, _batch(), step=1, split="train")
    log.flush()
    files = os.listdir(log.log_dir)
    assert any("tfevents" in f for f in files)
    # a second call advances the PRNG (different samples)
    cb(state, _batch(), step=2, split="val")


def test_vae_text_logger_with_decoders(decoders, tmp_path):
    cfg = GPTConfig(vocab_size=16, block_size=20, n_layer=1, n_head=2,
                    n_embd=16)
    exp = ExperimentConfig(model=cfg, vae=VAEConfig(nz=16),
                           train=TrainConfig(batch_size=2))
    task = VAETask(exp, steps_per_epoch=2, mesh=make_mesh({"data": 2}),
                   use_pallas=False)
    state = task.init_state(0)
    log = TBLogger(str(tmp_path / "logs"))
    cb = VAETextLogger(task, log, decoders, interpolation_steps=3)
    cb(state, _batch(), step=1, split="val")
    assert any("tfevents" in f for f in os.listdir(log.log_dir))
