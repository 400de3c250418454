"""Demo helpers: ffmpeg discovery, audio extraction from video, single-clip
mel extraction.

Parity with /root/reference/feature_extraction/demo_utils.py:25-105
(``which_ffmpeg``, ``extract_melspectrogram``, ``show_grid``), on the
TPU-native mel frontend.
"""

from __future__ import annotations

import os
import subprocess


def which_ffmpeg() -> str:
    """Path to ffmpeg or '' (reference: demo_utils.py:25)."""
    try:
        result = subprocess.run(["which", "ffmpeg"], capture_output=True,
                                text=True)
        return result.stdout.replace("\n", "")
    except Exception:
        return ""


def extract_audio_from_video(video_path: str, out_wav: str,
                             sample_rate: int = 22050) -> str:
    """ffmpeg video -> mono wav at the target rate
    (reference: demo_utils.py:31-53)."""
    ffmpeg = which_ffmpeg()
    if not ffmpeg:
        raise RuntimeError("ffmpeg is not found (zero-egress image); "
                           "provide a .wav input instead")
    cmd = [ffmpeg, "-i", video_path, "-vn", "-acodec", "pcm_s16le",
           "-ar", str(sample_rate), "-ac", "1", "-y", out_wav]
    subprocess.run(cmd, check=True, capture_output=True)
    return out_wav


def extract_melspectrogram(in_path: str, sr: int = 22050,
                           duration: int = 10, tmp_dir: str = "/tmp"):
    """Single-clip mel extraction (reference: demo_utils.py:56-82).

    Accepts a wav directly or a video (extracted via ffmpeg first).
    Returns (80, 860) normalised mel.
    """
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu.configs import MelConfig
    from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
    from .extract_mel_spectrogram import read_wav

    if not in_path.endswith(".wav"):
        name = os.path.basename(in_path).rsplit(".", 1)[0]
        in_path = extract_audio_from_video(
            in_path, os.path.join(tmp_dir, f"{name}_{sr}hz.wav"), sr)
    wav = read_wav(in_path)
    cfg = MelConfig(sample_rate=sr, clip_samples=sr * duration)
    import numpy as np
    y = np.zeros(cfg.clip_samples, np.float32)
    n = min(len(wav), cfg.clip_samples)
    y[:n] = wav[:n]
    return np.asarray(waveform_to_mel(jnp.asarray(y), cfg))


def show_grid(imgs):
    """matplotlib grid display (reference: demo_utils.py:85-105)."""
    import matplotlib.pyplot as plt
    import numpy as np
    imgs = [np.asarray(i) for i in imgs]
    fig, axes = plt.subplots(len(imgs), 1, squeeze=False)
    for ax, im in zip(axes[:, 0], imgs):
        ax.imshow(im[::-1], aspect="auto", origin="upper")
        ax.set_xticks([])
        ax.set_yticks([])
    return fig
