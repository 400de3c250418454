#!/usr/bin/env python
"""Offline mel-spectrogram extraction CLI.

Entry-point parity with
/root/reference/feature_extraction/extract_mel_spectrogram.py:193-211
(-i/--input_dir, -o/--output_dir, -l/--length, -n/--num_worker), rebuilt
TPU-first: instead of a CPU multiprocessing.Pool of librosa calls, wavs are
batched onto the accelerator and run through the jitted fused
STFT+mel+scalar-chain kernel (melspec_gpt_vqvae_tpu.ops.mel) — one device
program per batch instead of one librosa pipeline per file.
"""

import argparse
import os
import os.path as P
from glob import glob
from pathlib import Path

import numpy as np

sys_path_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
import sys  # noqa: E402
sys.path.insert(0, sys_path_root)


def get_spectrogram(audio_path, save_dir, length,
                    folder_name="melspec_10s_22050hz", save_results=True):
    """Single-file API parity with the reference ``get_spectrogram``
    (extract_mel_spectrogram.py:166-190)."""
    import jax.numpy as jnp
    from melspec_gpt_vqvae_tpu.configs import MelConfig
    from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
    if folder_name != "melspec_10s_22050hz":
        raise NotImplementedError(folder_name)
    wav = read_wav(audio_path)
    y = np.zeros(length, np.float32)
    n = min(len(wav), length)
    y[:n] = wav[:n]
    mel = np.asarray(waveform_to_mel(jnp.asarray(y),
                                     MelConfig(clip_samples=length)))
    if save_results:
        os.makedirs(save_dir, exist_ok=True)
        name = os.path.basename(audio_path).split(".")[0]
        np.save(P.join(save_dir, name + "_mel.npy"), mel)
        return None
    return y, mel


def inv_transforms(x, folder_name="melspec_10s_22050hz", key=None,
                   gl_iters=32):
    """Inverse chain API parity (extract_mel_spectrogram.py:154-163):
    normalised mel -> waveform via NNLS + Griffin-Lim on device."""
    import jax
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    from melspec_gpt_vqvae_tpu.configs import MelConfig
    from melspec_gpt_vqvae_tpu.ops.mel import mel_to_waveform
    if folder_name != "melspec_10s_22050hz":
        raise NotImplementedError(folder_name)
    key = key if key is not None else jax.random.PRNGKey(0)
    return np.asarray(mel_to_waveform(jnp.asarray(x), key, MelConfig(),
                                      gl_iters=gl_iters))


def read_wav(path: str) -> np.ndarray:
    """Load a wav at native rate as float32 (librosa.load(sr=None)
    equivalent for PCM/float wavs; scipy handles the container)."""
    from scipy.io import wavfile
    _, wav = wavfile.read(path)
    if wav.ndim == 2:
        wav = wav.mean(axis=1)
    if wav.dtype == np.int16:
        wav = wav.astype(np.float32) / 32768.0
    elif wav.dtype == np.int32:
        wav = wav.astype(np.float32) / 2147483648.0
    elif wav.dtype == np.uint8:
        wav = (wav.astype(np.float32) - 128.0) / 128.0
    else:
        wav = wav.astype(np.float32)
    return wav


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input_dir",
                        default="data/features/dog/audio_10s_22050hz")
    parser.add_argument("-o", "--output_dir",
                        default="data/features/dog/melspec_10s_22050hz")
    parser.add_argument("-l", "--length", type=int, default=220500)
    parser.add_argument("-n", "--num_worker", type=int, default=32,
                        help="accepted for parity; batching replaces the pool")
    parser.add_argument("-b", "--batch_size", type=int, default=16)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu.configs import MelConfig
    from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel

    folder_name = Path(args.output_dir).name
    if folder_name != "melspec_10s_22050hz":
        raise NotImplementedError(folder_name)
    cfg = MelConfig(clip_samples=args.length)

    audio_paths = sorted(glob(P.join(args.input_dir, "*.wav")))
    os.makedirs(args.output_dir, exist_ok=True)
    print(f"{len(audio_paths)} wavs -> {args.output_dir} "
          f"(batch {args.batch_size} on {jax.devices()[0].platform})")

    fn = jax.jit(lambda w: waveform_to_mel(w, cfg))
    for start in range(0, len(audio_paths), args.batch_size):
        chunk = audio_paths[start:start + args.batch_size]
        wavs = np.zeros((len(chunk), args.length), np.float32)
        for i, p in enumerate(chunk):
            w = read_wav(p)
            n = min(len(w), args.length)
            wavs[i, :n] = w[:n]
        mels = np.asarray(fn(jnp.asarray(wavs)))
        for p, mel in zip(chunk, mels):
            name = os.path.basename(p).split(".")[0]
            np.save(P.join(args.output_dir, name + "_mel.npy"), mel)
        print(f"\r{min(start + len(chunk), len(audio_paths))}"
              f"/{len(audio_paths)}", end="", flush=True)
    print()


if __name__ == "__main__":
    main()
