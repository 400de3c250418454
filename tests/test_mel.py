"""Mel frontend tests.

Golden behaviour is pinned by the reference chain
(/root/reference/feature_extraction/extract_mel_spectrogram.py:141-163,
librosa 0.8.1): STFT n_fft=1024 hop=256 center/reflect, Slaney mel 125-7600Hz,
then LowerThresh/Log10/*20/-20/+100//100/Clip/Trim(860).  librosa is not
installed here, so the STFT is validated against an independent numpy
implementation and the filterbank against its defining mathematical
properties; round-trips validate the inverse chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import MelConfig
from melspec_gpt_vqvae_tpu.ops import mel as M


def _numpy_stft_mag(y, n_fft=1024, hop=256):
    """Independent reference: center=True reflect pad, periodic hann."""
    y = np.pad(y, n_fft // 2, mode="reflect")
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)
    n_frames = 1 + (len(y) - n_fft) // hop
    out = np.empty((n_fft // 2 + 1, n_frames), np.float32)
    for i in range(n_frames):
        frame = y[i * hop: i * hop + n_fft] * win
        out[:, i] = np.abs(np.fft.rfft(frame))
    return out


def test_stft_matches_numpy():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(22050).astype(np.float32)
    ours = np.asarray(M.stft_magnitude(jnp.asarray(y)))
    ref = _numpy_stft_mag(y)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_filterbank_properties():
    fb = M.mel_filterbank()
    assert fb.shape == (80, 513)
    # non-negative, every filter has support
    assert (fb >= 0).all()
    assert (fb.sum(axis=1) > 0).all()
    # filters only respond inside [fmin, fmax]
    freqs = np.linspace(0, 22050 / 2, 513)
    active = fb.sum(axis=0) > 0
    assert freqs[active].min() >= 100.0
    assert freqs[active].max() <= 7650.0
    # Slaney norm: each filter integrates to ~2/(width); check area formula
    mel_pts = np.linspace(M._hz_to_mel(np.array(125.0)),
                          M._hz_to_mel(np.array(7600.0)), 82)
    hz = M._mel_to_hz(mel_pts)
    df = 22050 / 2 / 512
    areas = fb.sum(axis=1) * df
    expected = 2.0 / (hz[2:] - hz[:-2]) * (hz[2:] - hz[:-2]) / 2
    np.testing.assert_allclose(areas, expected, rtol=0.1)


def test_mel_scale_slaney_breakpoint():
    # linear below 1 kHz: mel(500) == 500 / (200/3)
    assert abs(M._hz_to_mel(np.array(500.0)) - 500.0 / (200.0 / 3)) < 1e-9
    # invertible
    f = np.array([125.0, 999.0, 1000.0, 3000.0, 7600.0])
    np.testing.assert_allclose(M._mel_to_hz(M._hz_to_mel(f)), f, rtol=1e-10)


def test_waveform_to_mel_shape_and_range():
    cfg = MelConfig()
    wav = jnp.asarray(np.random.default_rng(1).standard_normal(220500),
                      jnp.float32) * 0.1
    mel = M.waveform_to_mel(wav, cfg)
    assert mel.shape == (80, 860)
    assert float(mel.min()) >= 0.0 and float(mel.max()) <= 1.0
    # batch axis broadcasts
    mel_b = M.waveform_to_mel(jnp.stack([wav, wav]), cfg)
    assert mel_b.shape == (2, 80, 860)
    np.testing.assert_allclose(np.asarray(mel_b[0]), np.asarray(mel),
                               atol=1e-6)


def test_short_wave_padded():
    cfg = MelConfig()
    wav = jnp.ones((1000,), jnp.float32)
    mel = M.waveform_to_mel(wav, cfg)
    assert mel.shape == (80, 860)


def test_scalar_chain_roundtrip():
    cfg = MelConfig()
    # values above the clip threshold round-trip exactly
    x = jnp.asarray(np.random.default_rng(2).uniform(1e-4, 10.0, (80, 100)),
                    jnp.float32)
    y = M.mel_forward_chain(x, cfg)
    back = M.mel_inverse_chain(y, cfg)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), rtol=1e-3)


def test_istft_inverts_stft():
    rng = np.random.default_rng(3)
    y = rng.standard_normal(8192).astype(np.float32)
    spec = M.stft_complex(jnp.asarray(y))
    back = np.asarray(M.istft(spec, length=len(y)))
    np.testing.assert_allclose(back, y, atol=1e-4)


@pytest.mark.slow
def test_mel_to_waveform_roundtrip():
    """A synthetic tone survives mel -> wav -> mel (Griffin-Lim tolerance)."""
    cfg = MelConfig()
    t = np.arange(44100) / cfg.sample_rate
    wav = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    wav = np.asarray(M.pad_or_trim(jnp.asarray(wav), cfg.clip_samples))
    mel = M.waveform_to_mel(jnp.asarray(wav), cfg)
    wav2 = M.mel_to_waveform(mel, jax.random.PRNGKey(0), cfg, gl_iters=16)
    mel2 = M.waveform_to_mel(M.pad_or_trim(wav2, cfg.clip_samples), cfg)
    # compare on the active region (first 2 s of frames)
    a = np.asarray(mel)[:, :170]
    b = np.asarray(mel2)[:, :170]
    assert np.abs(a - b).mean() < 0.05


def test_pallas_mel_matches_xla_path():
    """The fused Pallas frontend kernel (DFT-as-matmul) matches the rFFT
    path on a short config (interpret mode on CPU)."""
    from melspec_gpt_vqvae_tpu.ops.mel_pallas import waveform_to_mel_pallas
    cfg = MelConfig(clip_samples=22050, trim_len=80)
    wav = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 22050)) * 0.1,
        jnp.float32)
    a = np.asarray(M.waveform_to_mel(wav, cfg))[:, :, :80]
    b = np.asarray(waveform_to_mel_pallas(wav, cfg, block_frames=64))
    assert b.shape == (2, 80, 80)
    np.testing.assert_allclose(a, b, atol=2e-3)
