"""Fused Pallas mel-spectrogram kernel.

The BASELINE north-star calls for the librosa STFT->mel frontend to become a
"fused Pallas framing+matmul kernel".  FFT is not a Pallas primitive, so the
DFT is expressed as two MXU matmuls against precomputed cos/sin bases —
more FLOPs than an FFT but every step (framing, windowing, DFT, magnitude,
mel projection, log chain) fuses into one VMEM-resident kernel with a single
HBM write of the (80, T) output.  At 10 s / 860 frames this is ~0.9 GFLOP
per clip — noise for an MXU — while the XLA path round-trips the (513, 860)
spectrogram through HBM.

Parity: matches ops/mel.py::waveform_to_mel (same reflect pad, periodic
hann, Slaney mel, scalar chain) to ~1e-3 absolute.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..configs import MelConfig
from .mel import _hann, mel_filterbank, pad_or_trim


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=4)
def _dft_mel_bases(cfg: MelConfig):
    """Windowed-DFT-to-mel compile-time constants.

    Returns (cos_w (n_fft, F), sin_w (n_fft, F), mel_T (F, n_mels)) where
    the hann window is folded into the DFT bases.
    """
    n_fft = cfg.n_fft
    freqs = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(freqs)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    win = _hann(n_fft)[:, None].astype(np.float64)
    cos_w = (np.cos(ang) * win).astype(np.float32)
    sin_w = (-np.sin(ang) * win).astype(np.float32)
    mel = mel_filterbank(cfg.sample_rate, n_fft, cfg.n_mels, cfg.fmin,
                         cfg.fmax).T.astype(np.float32)   # (F, n_mels)
    return cos_w, sin_w, mel


def _mel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref, *, cfg):
    # HIGHEST: the default bf16 MXU passes shift mel values enough to flip
    # downstream VQ code indices (measured: 70% TPU-vs-CPU code match with
    # default precision vs ~99% with HIGHEST — see PARITY_CODES.json)
    hi = jax.lax.Precision.HIGHEST
    frames = frames_ref[...]                               # (BT, n_fft)
    re = jax.lax.dot_general(frames, cos_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=hi)
    im = jax.lax.dot_general(frames, sin_ref[...],
                             (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=hi)
    mag = jnp.sqrt(re * re + im * im)                      # (BT, F)
    if cfg.spec_power != 1.0:
        mag = mag ** cfg.spec_power
    mel = jax.lax.dot_general(mag, mel_ref[...],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32,
                              precision=hi)
    # scalar chain (reference: extract_mel_spectrogram.py:141-151)
    x = jnp.maximum(cfg.lower_thresh, mel)
    x = jnp.log10(x) * cfg.multiply - cfg.subtract + cfg.add
    x = x / cfg.divide
    out_ref[...] = jnp.clip(x, cfg.clip_min, cfg.clip_max)


@functools.partial(jax.jit, static_argnames=("cfg", "block_frames"))
def waveform_to_mel_pallas(wav: jnp.ndarray, cfg: MelConfig = MelConfig(),
                           block_frames: int = 256) -> jnp.ndarray:
    """wav (B, samples) -> normalised mel (B, n_mels, trim_len).

    Frames are gathered on the XLA side (a cheap strided gather), then one
    Pallas program per block of frames does window+DFT+mel+log fused.
    """
    if wav.ndim == 1:
        wav = wav[None]
        squeeze = True
    else:
        squeeze = False
    b = wav.shape[0]
    n_fft, hop = cfg.n_fft, cfg.hop_length

    wav = pad_or_trim(wav, cfg.clip_samples)
    wav = jnp.pad(wav, ((0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    n_frames = cfg.trim_len  # trim before compute: frames beyond are dropped
    idx = np.arange(n_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    frames = wav[:, idx].reshape(b * n_frames, n_fft)

    total = b * n_frames
    total_pad = _round_up(total, block_frames)
    if total_pad != total:
        frames = jnp.pad(frames, ((0, total_pad - total), (0, 0)))

    cos_w, sin_w, mel_t = _dft_mel_bases(cfg)
    freqs = cos_w.shape[1]
    # pad the lane dims to 128 multiples for clean tiling
    f_pad = _round_up(freqs, 128)
    m_pad = _round_up(cfg.n_mels, 128)
    cos_w = np.pad(cos_w, ((0, 0), (0, f_pad - freqs)))
    sin_w = np.pad(sin_w, ((0, 0), (0, f_pad - freqs)))
    mel_t = np.pad(mel_t, ((0, f_pad - freqs), (0, m_pad - cfg.n_mels)))

    out = pl.pallas_call(
        functools.partial(_mel_kernel, cfg=cfg),
        grid=(total_pad // block_frames,),
        in_specs=[
            pl.BlockSpec((block_frames, n_fft), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, f_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_pad, m_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_frames, m_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((total_pad, m_pad), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(frames, jnp.asarray(cos_w), jnp.asarray(sin_w), jnp.asarray(mel_t))

    mel = out[:total, :cfg.n_mels].reshape(b, n_frames, cfg.n_mels)
    mel = jnp.swapaxes(mel, 1, 2)                          # (B, n_mels, T)
    return mel[0] if squeeze else mel
