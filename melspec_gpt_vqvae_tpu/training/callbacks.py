"""Media-logging callbacks: the reference's ImageLogger / TextLogger /
callbeck_of_my_dreams equivalents.

  * ``GPTImageLogger`` (/root/reference/callbacks/GPT_callbacks.py:30-272):
    every ``logging_frequency`` batches logs code sequences as text,
    attention heatmaps minus the causal uniform prior, spectrogram grids
    (frequency-flipped), and vocoded audio for inputs / reconstructions /
    half / nopix / det samples.
  * ``VAETextLogger`` (/root/reference/callbacks/GPT_VAE_callbacks.py:29-409):
    original + greedy/"beam" reconstructions (codes -> text -> spec -> audio)
    plus latent interpolation galleries.
  * ``metrics_epoch_end`` (reference callbeck_of_my_dreams :421-522):
    corpus MI + active units + ppl/nll scalars at validation end.

These run on the host between jitted steps; the VQ decode / vocoder forward
themselves are jitted device code (frozen params).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.vocoder import MelGANGenerator
from ..models.vqvae import VQModel
from ..parallel.mesh import is_primary
from ..utils.codes import sequence_to_grid
from .logging import TBLogger, attention_image


class FrozenDecoders:
    """Holds frozen VQ-VAE + vocoder params with jitted decode fns
    (the reference callbacks each load their own copies:
    GPT_VAE_callbacks.py:33-54)."""

    def __init__(self, vq_cfg=None, vq_params=None, vocoder_cfg=None,
                 vocoder_params=None, code_h: int = 5, code_w: int = 53):
        self.code_h, self.code_w = code_h, code_w
        self.vq = None
        self.vocoder = None
        # params are jit ARGS, not closures — closing over them would bake
        # the frozen weights into the program as constants
        if vq_params is not None:
            model = VQModel(vq_cfg)
            self._vq_params = vq_params
            self._vq_jit = jax.jit(
                lambda p, codes: model.apply({"params": p}, codes,
                                             method="decode_code"))
            self._vq_apply = lambda codes: self._vq_jit(self._vq_params,
                                                        codes)
            self.vq = True
        if vocoder_params is not None:
            gen = MelGANGenerator(vocoder_cfg)
            self._voc_params = vocoder_params
            self._voc_jit = jax.jit(
                lambda p, mel_tc: gen.apply({"params": p}, mel_tc))
            self._voc_apply = lambda mel_tc: self._voc_jit(self._voc_params,
                                                           mel_tc)
            self.vocoder = True

    def codes_to_spec(self, seq: np.ndarray) -> Optional[np.ndarray]:
        """(B, 265) GPT-order tokens -> (B, 80, 848) spec in [-1, 1]
        (reference codes_to_spec: GPT_VAE_callbacks.py:388-398)."""
        if not self.vq:
            return None
        grid = jnp.asarray(sequence_to_grid(np.asarray(seq),
                                            self.code_h, self.code_w))
        out = self._vq_apply(grid)          # (B, H, W, 1) NHWC
        return np.asarray(out)[..., 0]

    def spec_to_audio(self, spec: np.ndarray) -> Optional[np.ndarray]:
        """spec (80, T) in [-1, 1] -> waveform (the callback convention:
        vocoder eats (spec+1)/2, GPT_callbacks.py:96-102)."""
        if not self.vocoder:
            return None
        s01 = (np.asarray(spec, np.float32) + 1.0) / 2.0
        mel_tc = jnp.asarray(s01.T)[None]   # (1, T, 80)
        return np.asarray(self._voc_apply(mel_tc))[0]


def find_raw_audio(spec_path: str, sample_rate: int = 22050
                   ) -> Optional[np.ndarray]:
    """Raw source audio for a spec file, or None.

    The reference TextLogger tries the raw ``.mp4`` from disk before
    falling back to vocoding the spec
    (/root/reference/callbacks/GPT_VAE_callbacks.py:140-157:
    ``../AV_Datasets/VAS/<label>/videos/<vid>.mp4`` via librosa).  The
    feature downloads don't ship raw videos, so the practical sources
    here are (in order):
      1. ``<cls>/audio_10s_22050hz/<vid>.wav`` — the extracted-audio tree
         the mel frontend reads from (stdlib wave, no librosa);
      2. ``<cls>/videos/<vid>.mp4`` — decoded through ffmpeg when the
         binary exists (demo_utils.extract_audio_from_video), silently
         skipped otherwise (this image has no ffmpeg).
    """
    import os
    base = os.path.basename(spec_path)
    vid = base[:-len("_mel.npy")] if base.endswith("_mel.npy") \
        else os.path.splitext(base)[0]
    cls_dir = os.path.dirname(os.path.dirname(os.path.abspath(spec_path)))

    def _read_wav(path):
        import wave as _wave
        with _wave.open(path, "rb") as w:
            if w.getframerate() != sample_rate:
                return None   # reference resamples via librosa; we skip
            raw = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
            if w.getnchannels() > 1:
                raw = raw.reshape(-1, w.getnchannels()).mean(axis=1)
            return raw.astype(np.float32) / 32768.0

    wav_path = os.path.join(cls_dir, "audio_10s_22050hz", f"{vid}.wav")
    if os.path.isfile(wav_path):
        try:
            return _read_wav(wav_path)
        except (OSError, ValueError, EOFError):
            pass   # damaged file: fall through (reference swallows too)
    mp4_path = os.path.join(cls_dir, "videos", f"{vid}.mp4")
    if os.path.isfile(mp4_path):
        try:
            import tempfile

            from feature_extraction.demo_utils import (
                extract_audio_from_video, which_ffmpeg)
            if which_ffmpeg():
                with tempfile.TemporaryDirectory() as td:
                    out = os.path.join(td, "a.wav")
                    extract_audio_from_video(mp4_path, out, sample_rate)
                    return _read_wav(out)
        except (OSError, ValueError, RuntimeError, ImportError):
            pass
    return None


class GPTImageLogger:
    def __init__(self, task, log: TBLogger, decoders: FrozenDecoders,
                 sample_rate: int = 22050, max_images: int = 1,
                 top_k: int = 100):
        self.task = task
        self.log = log
        self.dec = decoders
        self.sample_rate = sample_rate
        self.max_images = max_images
        self.top_k = top_k
        self._key = jax.random.PRNGKey(0)

    def __call__(self, state, batch, step: int, split: str):
        if not is_primary() or "codes" not in batch:
            return
        self._key, key = jax.random.split(self._key)
        gallery = self.task.log_samples(state["params"], key, batch,
                                        top_k=self.top_k, n=self.max_images)
        labels = batch.get("label", [])
        if len(labels):
            self.log.text(f"{split}/conditioning",
                          "; ".join(labels[:self.max_images]), step)
        for name in ("codes", "codes_half", "codes_nopix", "codes_det"):
            self.log.text(f"{split}/{name}",
                          str(gallery[name].tolist()), step)
        att = attention_image(gallery["att_nopix"])
        self.log.image(f"{split}/att_nopix", att[0][..., None], step)

        specs = {"reconstructions": gallery["codes"],
                 "samples_half": gallery["codes_half"],
                 "samples_nopix": gallery["codes_nopix"],
                 "samples_det": gallery["codes_det"]}
        if "image" in batch:
            inp = np.asarray(batch["image"][0])
            self.log.spectrogram(f"{split}/inputs", inp, step)
            audio = self.dec.spec_to_audio(inp)
            if audio is not None:
                self.log.audio(f"{split}/inputs_audio", audio, step,
                               self.sample_rate)
        for name, seq in specs.items():
            spec = self.dec.codes_to_spec(seq)
            if spec is None:
                continue
            self.log.spectrogram(f"{split}/{name}", spec[0], step)
            audio = self.dec.spec_to_audio(spec[0])
            if audio is not None:
                self.log.audio(f"{split}/{name}_audio", audio, step,
                               self.sample_rate)
        self.log.flush()


class VAETextLogger:
    def __init__(self, task, log: TBLogger, decoders: FrozenDecoders,
                 sample_rate: int = 22050, interpolation_steps: int = 5):
        self.task = task
        self.log = log
        self.dec = decoders
        self.sample_rate = sample_rate
        self.interpolation_steps = interpolation_steps
        self._key = jax.random.PRNGKey(0)

    def _log_codes(self, tag, seq, step):
        self.log.text(tag, str(np.asarray(seq).tolist()), step)
        spec = self.dec.codes_to_spec(seq)
        if spec is not None:
            self.log.spectrogram(tag + "_spec", spec[0], step)
            audio = self.dec.spec_to_audio(spec[0])
            if audio is not None:
                self.log.audio(tag + "_audio", audio, step, self.sample_rate)

    def __call__(self, state, batch, step: int, split: str):
        if not is_primary() or "codes" not in batch:
            return
        from .gpt_task import tokens_from_batch
        self._key, k1, k2 = jax.random.split(self._key, 3)
        x = tokens_from_batch(jnp.asarray(batch["codes"]))[:1]

        if "image" in batch:
            inp = np.asarray(batch["image"][0])
            self.log.spectrogram(f"{split}/original_spec", inp, step)
            # raw source audio first, vocoded spec as the fallback
            # (reference: GPT_VAE_callbacks.py:140-157)
            audio = None
            paths = batch.get("file_path_")
            if paths is not None and len(paths):
                audio = find_raw_audio(str(paths[0]), self.sample_rate)
            if audio is None:
                audio = self.dec.spec_to_audio(inp)
            if audio is not None:
                self.log.audio(f"{split}/original_audio", audio, step,
                               self.sample_rate)
        self._log_codes(f"{split}/original_codes", np.asarray(x), step)

        rec_greedy = self.task.reconstruct(state, {"codes":
                                                   batch["codes"][:1]},
                                           "greedy", key=k1)
        self._log_codes(f"{split}/greedy_reconstruction",
                        np.asarray(rec_greedy), step)
        rec_beam = self.task.reconstruct(state, {"codes": batch["codes"][:1]},
                                         "beam", key=k2)
        self._log_codes(f"{split}/beam_reconstruction",
                        np.asarray(rec_beam), step)

        # latent interpolation between the first two items
        # (reference audio_interpolation: GPT_VAE_callbacks.py:324-386)
        self.log_interpolation(state, batch, step, split=split)
        self.log.flush()

    def log_interpolation(self, state, batch, step: int, split: str = "val"):
        """Decode at linspace points between the first two items' posteriors
        (the --test_interpolation path; reference audio_interpolation:
        GPT_VAE_callbacks.py:324-386)."""
        if not is_primary() or np.asarray(batch["codes"]).shape[0] < 2:
            return
        from .gpt_task import tokens_from_batch
        toks = tokens_from_batch(jnp.asarray(batch["codes"]))
        outs = self.task.interpolate(state, toks[:1], toks[1:2],
                                     steps=self.interpolation_steps)
        for i, seq in enumerate(outs):
            self._log_codes(f"{split}/interpolation_{i}",
                            np.asarray(seq), step)
        self.log.flush()


class LSTMTextLogger:
    """LSTM-flavor TextLogger (reference callbacks/VAE_callbacks.py:30-370):
    original / greedy-reconstruction / TRUE-beam-reconstruction /
    sample-from-prior sentences decoded through ``VocabEntry`` word ids."""

    def __init__(self, task, log: TBLogger, vocab=None):
        from ..data.vocab import VocabEntry
        self.task = task
        self.log = log
        self.vocab = vocab or VocabEntry()
        self._key = jax.random.PRNGKey(0)

    def _sentence(self, row) -> str:
        return " ".join(str(w) for w in
                        self.vocab.decode_sentence(np.asarray(row)))

    def _log_text(self, tag: str, toks, step: int):
        self.log.text(tag, self._sentence(np.asarray(toks)[0]), step)

    def __call__(self, state, batch, step: int, split: str):
        if not is_primary() or "codes" not in batch:
            return
        from .lstm_task import lstm_tokens_from_batch
        self._key, k1, k2, k3 = jax.random.split(self._key, 4)
        cfg = self.task.cfg
        x = lstm_tokens_from_batch(np.asarray(batch["codes"])[:1],
                                   cfg.bos_id, cfg.eos_id)[:1]
        self._log_text(f"{split}/original", x, step)
        one = {"codes": np.asarray(batch["codes"])[:1]}
        self._log_text(f"{split}/greedy_reconstruction",
                       self.task.reconstruct(state, one, "greedy", key=k1),
                       step)
        self._log_text(f"{split}/beam_reconstruction",
                       self.task.reconstruct(state, one, "beam", key=k2),
                       step)
        self._log_text(f"{split}/sampled_from_prior",
                       self.task.sample_from_prior(state, 1, key=k3), step)
        self.log.flush()


def metrics_epoch_end(task, dm, log: TBLogger,
                      limit_batches: Optional[int] = None) -> Callable:
    """``callbeck_of_my_dreams`` equivalent: corpus MI + AU + best-loss
    tracking at validation end
    (reference: GPT_VAE_callbacks.py:421-522)."""

    def cb(state, epoch, agg: Dict[str, float], extras: Dict[str, Any],
           tokens=None):
        # fit_vae hands down the (B, T) token arrays it already extracted
        # during ITS val pass (one loader pass per epoch); the re-read
        # below is only the fallback for direct callers.  Either way only
        # the tiny token arrays are held — hoarding whole batches would
        # keep every 80x848 f32 `image` spec of the val set in memory.
        if tokens is None:
            tokens = []
            for i, b in enumerate(dm.val_dataloader()):
                if limit_batches and i >= limit_batches:
                    break
                tokens.append(np.asarray(task.batch_tokens(b)))
        # calc_mi_au is COLLECTIVE (cross-process posterior gather) and so
        # runs on every process — matching the reference, where each rank
        # computes full-corpus MI/AU (GPT_VAE_callbacks.py:429-436); only
        # the logging below is primary-gated.  It runs even with an EMPTY
        # local token list (the tasks gather a (0, nz) shard) — a skipping
        # rank would deadlock the ranks that do hold data.
        mi, au, _ = task.calc_mi_au(state, tokens)
        if not tokens and not np.isfinite(mi):
            return   # (near-)empty corpus, nothing to report — but a
            # non-finite MI over REAL data is divergence and is logged
        extras["pre_mi"] = mi
        if not is_primary():
            return
        step = int(jax.device_get(state["step"]))
        log.scalar("metrics/mutual_info", mi, step)
        log.scalar("metrics/active_units", au, step)
        if agg:
            log.scalar("metrics/ppl", agg["ppl"], step)
            log.scalar("metrics/nll", agg["nll"], step)
        log.scalar("metrics/starting_best_loss", extras["best_loss"], step)
        print(f"epoch {epoch}: mutual_info {mi:.4f} active_units {au}")

    return cb
