"""Mel-spectrogram frontend: invertible transform chain as pure JAX.

Behavioural parity with the reference chain at
/root/reference/feature_extraction/extract_mel_spectrogram.py:141-163
(librosa==0.8.1 semantics), rebuilt TPU-first:

  * the STFT is a framed gather + rFFT under ``jit`` (static shapes, batched);
  * the mel projection is a single (n_freq x n_mels) matmul that XLA fuses
    with the magnitude computation and maps to the MXU;
  * the scalar chain LowerThresh/Log10/Multiply/Subtract/Add/Divide/Clip/Trim
    (reference :40-151) collapses into a handful of fused elementwise ops;
  * the inverse (mel->STFT via NNLS, Griffin-Lim) runs as ``lax``-looped
    on-device iteration instead of librosa's CPU solvers (reference :29-34).

Forward:  wav (220500,) -> mel (80, 860) in [0, 1]
Inverse:  mel (80, T)   -> wav
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import MelConfig

# ---------------------------------------------------------------------------
# Mel filterbank (Slaney scale + Slaney norm, librosa.filters.mel-compatible).
# Built in numpy at trace time; it is a compile-time constant.
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale: linear below 1 kHz, log above."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mel)
    return mel


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = m * f_sp
    log_region = m >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), f)
    return f


@functools.lru_cache(maxsize=8)
def mel_filterbank(sr: int = 22050, n_fft: int = 1024, n_mels: int = 80,
                   fmin: float = 125.0, fmax: float = 7600.0) -> np.ndarray:
    """(n_mels, 1 + n_fft//2) triangular filterbank, Slaney-normalised.

    Matches librosa.filters.mel(sr, n_fft, fmin, fmax, n_mels) with the
    defaults htk=False, norm='slaney' used by the reference
    (extract_mel_spectrogram.py:26).
    """
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(np.array(fmin)), _hz_to_mel(np.array(fmax)), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney normalisation: equal area per filter.
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT / ISTFT
# ---------------------------------------------------------------------------


def _hann(n_fft: int) -> np.ndarray:
    """Periodic (fftbins=True) Hann window, librosa's default."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)).astype(np.float32)


def _frame(y: jnp.ndarray, n_fft: int, hop: int) -> jnp.ndarray:
    """(..., samples) -> (..., n_frames, n_fft) by strided gather."""
    n = y.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[..., idx]


def stft_magnitude(y: jnp.ndarray, n_fft: int = 1024, hop: int = 256,
                   power: float = 1.0) -> jnp.ndarray:
    """|STFT|^power with center=True reflect padding (librosa 0.8.1 default).

    y: (..., samples) -> (..., 1 + n_fft//2, n_frames)
    """
    pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    y = jnp.pad(y, pad, mode="reflect")
    frames = _frame(y, n_fft, hop) * jnp.asarray(_hann(n_fft))
    spec = jnp.abs(jnp.fft.rfft(frames, axis=-1))
    if power != 1.0:
        spec = spec ** power
    return jnp.swapaxes(spec, -1, -2)


def istft(stft_complex: jnp.ndarray, n_fft: int = 1024, hop: int = 256,
          length: Optional[int] = None) -> jnp.ndarray:
    """Inverse STFT with Hann overlap-add and window-sum-square correction.

    stft_complex: (..., 1 + n_fft//2, n_frames) -> (..., samples)
    """
    win = jnp.asarray(_hann(n_fft))
    frames = jnp.fft.irfft(jnp.swapaxes(stft_complex, -1, -2), n=n_fft, axis=-1)
    frames = frames * win

    n_frames = frames.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)

    # overlap-add via scatter-add on a zero buffer
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    flat_idx = jnp.asarray(idx.reshape(-1))
    lead = frames.shape[:-2]
    sig = jnp.zeros(lead + (out_len,), frames.dtype)
    sig = sig.at[..., flat_idx].add(frames.reshape(lead + (-1,)))

    wss = np.zeros(out_len, np.float32)
    np.add.at(wss, idx.reshape(-1), np.tile(_hann(n_fft) ** 2, n_frames))
    wss = np.where(wss > 1e-10, wss, 1.0)
    sig = sig / jnp.asarray(wss)

    sig = sig[..., n_fft // 2: out_len - n_fft // 2]
    if length is not None:
        sig = sig[..., :length]
    return sig


# ---------------------------------------------------------------------------
# Forward chain (wav -> normalised log-mel in [0, 1])
# ---------------------------------------------------------------------------


def pad_or_trim(wav: jnp.ndarray, length: int) -> jnp.ndarray:
    """Zero-pad or truncate to ``length`` samples
    (reference: extract_mel_spectrogram.py:169-173)."""
    n = wav.shape[-1]
    if n < length:
        pad = [(0, 0)] * (wav.ndim - 1) + [(0, length - n)]
        return jnp.pad(wav, pad)
    return wav[..., :length]


def mel_forward_chain(mel_linear: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """LowerThresh -> Log10 -> *20 -> -20 -> +100 -> /100 -> Clip -> Trim
    (reference: extract_mel_spectrogram.py:141-151)."""
    x = jnp.maximum(cfg.lower_thresh, mel_linear)
    x = jnp.log10(x)
    x = x * cfg.multiply - cfg.subtract + cfg.add
    x = x / cfg.divide
    x = jnp.clip(x, cfg.clip_min, cfg.clip_max)
    return x[..., :cfg.trim_len]


def mel_inverse_chain(mel_norm: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """Inverse of the scalar chain back to linear mel
    (reference: extract_mel_spectrogram.py:154-163; Clip/Trim/LowerThresh are
    identity in inverse mode)."""
    x = mel_norm * cfg.divide
    x = x - cfg.add + cfg.subtract
    x = x / cfg.multiply
    return jnp.power(10.0, x)


@functools.partial(jax.jit, static_argnames=("cfg",))
def waveform_to_mel(wav: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """wav (..., 220500) -> normalised mel (..., 80, 860).

    End-to-end fused forward path (reference:
    extract_mel_spectrogram.py:166-190 ``get_spectrogram``).
    """
    wav = pad_or_trim(wav, cfg.clip_samples)
    spec = stft_magnitude(wav, cfg.n_fft, cfg.hop_length, cfg.spec_power)
    basis = jnp.asarray(mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                                       cfg.fmin, cfg.fmax))
    mel = jnp.einsum("mf,...ft->...mt", basis, spec,
                     preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
    return mel_forward_chain(mel, cfg)


# ---------------------------------------------------------------------------
# Inverse: mel -> STFT magnitude (NNLS) -> Griffin-Lim -> waveform
# ---------------------------------------------------------------------------


def mel_to_stft(mel_linear: jnp.ndarray, cfg: MelConfig = MelConfig(),
                n_iter: int = 200) -> jnp.ndarray:
    """Approximately invert the mel projection with projected-gradient NNLS.

    librosa.feature.inverse.mel_to_stft solves nnls(mel_basis, M) on CPU
    (reference: extract_mel_spectrogram.py:30-32); here the solve is a
    ``lax.fori_loop`` of matmuls so it stays on-device and batches.
    Returns |STFT| (power 1/spec_power applied), shape (..., n_freq, T).
    """
    basis_np = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels,
                              cfg.fmin, cfg.fmax)  # (M, F) host numpy
    basis = jnp.asarray(basis_np)
    # init: transpose projection (librosa uses nnls on B @ S = mel)
    bt_mel = jnp.einsum("mf,...mt->...ft", basis, mel_linear)
    gram_diag_inv = 1.0 / (jnp.sum(basis * basis, axis=0) + 1e-10)  # (F,)
    s0 = bt_mel * gram_diag_inv[..., :, None]
    # Lipschitz step from the gram spectral norm — the filterbank is a
    # trace-time constant, so this is a Python float (a jnp.linalg.norm
    # here would lower a 513x513 SVD custom call into every program; XLA
    # does not constant-fold it)
    step = 1.0 / (float(np.linalg.norm(basis_np.T @ basis_np, 2)) + 1e-10)

    def body(_, s):
        resid = jnp.einsum("mf,...ft->...mt", basis, s) - mel_linear
        grad = jnp.einsum("mf,...mt->...ft", basis, resid)
        return jnp.maximum(0.0, s - step * grad)

    s = jax.lax.fori_loop(0, n_iter, body, jnp.maximum(s0, 0.0))
    if cfg.spec_power != 1.0:
        s = jnp.power(s, 1.0 / cfg.spec_power)
    return s


def griffin_lim(mag: jnp.ndarray, key: jax.Array, n_iter: int = 32,
                n_fft: int = 1024, hop: int = 256, momentum: float = 0.99,
                length: Optional[int] = None) -> jnp.ndarray:
    """Griffin-Lim phase reconstruction with momentum (librosa.griffinlim
    defaults: n_iter=32, momentum=0.99, random init).

    mag: (..., n_freq, T) magnitude -> (..., samples)
    """
    angles = jnp.exp(2j * jnp.pi * jax.random.uniform(key, mag.shape))

    def project(c):
        y = istft(c, n_fft, hop)
        return stft_complex(y, n_fft, hop)

    def body(_, carry):
        angles, tprev = carry
        rebuilt = project(mag * angles)
        update = rebuilt - (momentum / (1.0 + momentum)) * tprev
        angles = update / (jnp.abs(update) + 1e-16)
        return angles, rebuilt

    angles, _ = jax.lax.fori_loop(
        0, n_iter, body, (angles, jnp.zeros_like(angles)))
    return istft(mag * angles, n_fft, hop, length=length)


def stft_complex(y: jnp.ndarray, n_fft: int = 1024, hop: int = 256) -> jnp.ndarray:
    """Complex STFT (center=True, reflect pad), (..., n_freq, T)."""
    pad = [(0, 0)] * (y.ndim - 1) + [(n_fft // 2, n_fft // 2)]
    y = jnp.pad(y, pad, mode="reflect")
    frames = _frame(y, n_fft, hop) * jnp.asarray(_hann(n_fft))
    return jnp.swapaxes(jnp.fft.rfft(frames, axis=-1), -1, -2)


@functools.partial(jax.jit, static_argnames=("cfg", "gl_iters"))
def mel_to_waveform(mel_norm: jnp.ndarray, key: jax.Array,
                    cfg: MelConfig = MelConfig(), gl_iters: int = 32) -> jnp.ndarray:
    """Full inverse: normalised mel -> waveform
    (reference ``inv_transforms``: extract_mel_spectrogram.py:154-163)."""
    mel_linear = mel_inverse_chain(mel_norm, cfg)
    mag = mel_to_stft(mel_linear, cfg)
    return griffin_lim(mag, key, n_iter=gl_iters, n_fft=cfg.n_fft,
                       hop=cfg.hop_length)
