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


def _write_wav(path, n=64, sr=22050):
    import wave as _w
    pcm = (np.sin(np.linspace(0, 8 * np.pi, n)) * 20000).astype("<i2")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with _w.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return pcm.astype(np.float32) / 32768.0


def test_find_raw_audio_fallback(tmp_path):
    """Original-audio source preference (reference TextLogger tries the
    raw source from disk before vocoding the spec,
    GPT_VAE_callbacks.py:140-157): a wav next to the features is found and
    decoded; absent/mismatched-rate/damaged sources return None (vocode
    fallback)."""
    from melspec_gpt_vqvae_tpu.training.callbacks import find_raw_audio

    cls = tmp_path / "features" / "dog"
    spec_path = cls / "melspec_10s_22050hz" / "video_00007_mel.npy"
    os.makedirs(spec_path.parent, exist_ok=True)
    spec_path.touch()

    # no raw audio yet -> None
    assert find_raw_audio(str(spec_path)) is None
    # present -> decoded float32 in [-1, 1]
    want = _write_wav(cls / "audio_10s_22050hz" / "video_00007.wav")
    got = find_raw_audio(str(spec_path))
    np.testing.assert_allclose(got, want, atol=1e-6)
    # wrong sample rate -> None (the reference resamples via librosa; we
    # skip rather than mislabel the rate)
    _write_wav(cls / "audio_10s_22050hz" / "video_00007.wav", sr=16000)
    assert find_raw_audio(str(spec_path)) is None
    # damaged file -> swallowed, None (reference swallows too)
    (cls / "audio_10s_22050hz" / "video_00007.wav").write_bytes(b"nope")
    assert find_raw_audio(str(spec_path)) is None


def test_vae_text_logger_prefers_raw_audio(decoders, tmp_path, monkeypatch):
    """VAETextLogger logs the raw source audio when the batch's
    file_path_ has one on disk, and vocodes otherwise."""
    cfg = GPTConfig(vocab_size=16, block_size=20, n_layer=1, n_head=2,
                    n_embd=16)
    exp = ExperimentConfig(model=cfg, vae=VAEConfig(nz=16),
                           train=TrainConfig(batch_size=2))
    task = VAETask(exp, steps_per_epoch=2, mesh=make_mesh({"data": 2}),
                   use_pallas=False)
    state = task.init_state(0)
    log = TBLogger(str(tmp_path / "logs"))
    cb = VAETextLogger(task, log, decoders, interpolation_steps=3)

    cls = tmp_path / "features" / "dog"
    spec_path = cls / "melspec_10s_22050hz" / "video_00001_mel.npy"
    os.makedirs(spec_path.parent, exist_ok=True)
    want = _write_wav(cls / "audio_10s_22050hz" / "video_00001.wav")

    logged = {}
    orig_audio = TBLogger.audio

    def spy(self, tag, wav, step, sr=22050):
        logged[tag] = np.asarray(wav)
        return orig_audio(self, tag, wav, step, sr)

    monkeypatch.setattr(TBLogger, "audio", spy)
    batch = dict(_batch(), file_path_=[str(spec_path)] * 2)
    cb(state, batch, step=1, split="val")
    np.testing.assert_allclose(logged["val/original_audio"].reshape(-1),
                               want, atol=1e-6)
    # without the raw file the vocoded spec is logged instead
    logged.clear()
    batch2 = dict(_batch(), file_path_=[str(tmp_path / "f" / "m" /
                                            "nope_mel.npy")] * 2)
    cb(state, batch2, step=2, split="val")
    assert logged["val/original_audio"].reshape(-1).shape != want.shape
