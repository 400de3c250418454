"""TensorBoard logging: scalars, images, audio, text, histograms.

Parity with the reference's observability surface (TensorBoardLogger +
callback media logging: /root/reference/GPT_train.py:93,
callbacks/GPT_callbacks.py:93-152, big_model_attn_gan.py:795-804), built on
tensorboardX with rank-0 gating (the ``@rank_zero_only`` equivalent).
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


class TBLogger:
    """Thin tensorboardX wrapper.  No-ops on non-primary hosts."""

    def __init__(self, save_dir: str, name: str = "TensorBoardLoggs",
                 enabled: Optional[bool] = None):
        if enabled is None:
            try:
                import jax
                enabled = jax.process_index() == 0
            except Exception:
                enabled = True
        self.enabled = enabled
        self.log_dir = None
        self._writer = None
        if enabled:
            from tensorboardX import SummaryWriter
            base = os.path.join(save_dir, name)
            version = 0
            while os.path.exists(os.path.join(base, f"version_{version}")):
                version += 1
            self.version = version
            self.log_dir = os.path.join(base, f"version_{version}")
            os.makedirs(self.log_dir, exist_ok=True)
            self._writer = SummaryWriter(self.log_dir)
        else:
            self.version = 0

    def scalar(self, tag: str, value, step: int):
        if self._writer:
            self._writer.add_scalar(tag, float(value), step)

    def scalars(self, values: dict, step: int):
        for k, v in values.items():
            self.scalar(k, v, step)

    def image(self, tag: str, img: np.ndarray, step: int,
              dataformats: str = "HWC"):
        """img in [0, 1]."""
        if self._writer:
            self._writer.add_image(tag, np.asarray(img), step,
                                   dataformats=dataformats)

    def spectrogram(self, tag: str, spec: np.ndarray, step: int, *,
                    input_range: str = "pm1"):
        """(F, T), flipped so low mels are at the bottom (reference flips
        dims for display: GPT_callbacks.py:141-143).  ``input_range``:
        'pm1' = [-1, 1] (the dataset/codec convention, remapped to [0, 1])
        or 'unit' = already [0, 1].  Explicit because a min()-based guess
        mis-renders loud clips whose [-1,1] spec happens to be all >= 0."""
        s = np.asarray(spec, np.float32)
        if input_range == "pm1":
            s = (s + 1.0) / 2.0
        elif input_range != "unit":
            raise ValueError(f"input_range {input_range!r}")
        s = np.clip(s, 0.0, 1.0)[::-1, :]   # flip frequency axis
        self.image(tag, s[..., None], step)

    def audio(self, tag: str, wav: np.ndarray, step: int,
              sample_rate: int = 22050):
        """tensorboardX's add_audio requires soundfile (absent in this
        image); encode PCM16 WAV with the stdlib and emit the Summary proto
        directly."""
        if not self._writer:
            return
        import io
        import wave

        from tensorboardX.proto.summary_pb2 import Summary

        data = np.asarray(wav, np.float32).reshape(-1)
        data = np.clip(data, -1.0, 1.0)
        pcm = (data * 32767.0).astype("<i2")
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sample_rate)
            w.writeframes(pcm.tobytes())
        audio = Summary.Audio(sample_rate=sample_rate, num_channels=1,
                              length_frames=len(pcm),
                              encoded_audio_string=buf.getvalue(),
                              content_type="audio/wav")
        summary = Summary(value=[Summary.Value(tag=tag, audio=audio)])
        self._writer._get_file_writer().add_summary(summary, step)

    def text(self, tag: str, text: str, step: int):
        if self._writer:
            self._writer.add_text(tag, text, step)

    def histogram(self, tag: str, values: np.ndarray, step: int):
        if self._writer:
            self._writer.add_histogram(tag, np.asarray(values), step)

    def flush(self):
        if self._writer:
            self._writer.flush()

    def close(self):
        if self._writer:
            self._writer.close()


def attention_image(att: np.ndarray, scale_by_prior: bool = True) -> np.ndarray:
    """Aggregate per-head attention into a single (T, T) heatmap, minus the
    causal uniform prior (reference _visualize_attention:
    GPT_callbacks.py:81-91).  att: (B, H, T, T) -> (B, T, T) in [0, 1]."""
    att = np.asarray(att, np.float32)
    b, h, t, _ = att.shape
    if scale_by_prior:
        prior = np.tril(np.ones((t, t), np.float32))
        prior = prior / np.arange(1, t + 1, dtype=np.float32)[:, None]
        att = att - prior[None, None]
    agg = att.sum(axis=1)
    lo = agg.min(axis=(1, 2), keepdims=True)
    hi = agg.max(axis=(1, 2), keepdims=True)
    return (agg - lo) / (hi - lo + 1e-8)
