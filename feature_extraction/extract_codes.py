#!/usr/bin/env python
"""Offline tokenizer: mel spectrograms -> VQ code grids.

Entry-point parity with
/root/reference/feature_extraction/extract_codes.py:63-120
(-i/--input_dir, -m/--model_dir, -emb_dim, -n_e, -crop flags; idempotent
skip of existing files; damaged files skipped), rebuilt TPU-first: mels are
center-cropped and batched onto the accelerator, the conv encoder + fused
Pallas argmin-quantiser run as one jitted program per batch, and the 5x53
int grids are written to the sibling ``codes_10s/`` directory
(``*_mel_code.npy``).
"""

import argparse
import os
import sys
from glob import glob

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def iter_mel_dirs(input_dir: str):
    if "vggsound" in input_dir:
        mel_dir = os.path.join(input_dir, "melspec_10s_22050hz")
        if os.path.isdir(mel_dir):
            yield mel_dir
    else:  # VAS: features/<cls>/melspec_10s_22050hz
        for folder in sorted(os.listdir(input_dir)):
            mel_dir = os.path.join(input_dir, folder, "melspec_10s_22050hz")
            if os.path.isdir(mel_dir):
                yield mel_dir


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-i", "--input_dir", default="data/vas/features")
    parser.add_argument("-m", "--model_dir", required=True,
                        help="VQ-VAE ckpt (torch .pt or orbax dir)")
    parser.add_argument("-emb_dim", "--embedding_dim", type=int, default=256)
    parser.add_argument("-n_e", "--num_embeddings", type=int, default=128)
    parser.add_argument("-crop", "--spec_crop_len", type=int, default=848)
    parser.add_argument("-b", "--batch_size", type=int, default=8)
    parser.add_argument("--int8", action="store_true",
                        help="int8 encoder convs: 1.4-1.7x throughput, but "
                             "code indices can flip vs the f32 parity path "
                             "(flip rate in INT8_DECODE.json) — NOT for "
                             "parity-checked corpora")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    # Offline tokenization is the reference-parity gate
    # (extract_codes.py:48-50 runs in f32): full-precision MXU passes keep
    # TPU code indices matching the CPU/reference path (default bf16 passes
    # flip indices near codebook decision boundaries — PARITY_CODES.json).
    # --int8 opts OUT of that guarantee for speed.
    if not args.int8:
        jax.config.update("jax_default_matmul_precision", "highest")

    from melspec_gpt_vqvae_tpu.configs import VQVAEConfig
    from melspec_gpt_vqvae_tpu.data.transforms import center_crop
    from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
    from melspec_gpt_vqvae_tpu.utils.convert import load_vqvae_params

    cfg = VQVAEConfig(num_embeddings=args.num_embeddings,
                      embedding_dim=args.embedding_dim,
                      resolution=args.spec_crop_len)
    params = load_vqvae_params(args.model_dir, cfg)
    model = VQModel(cfg)
    if args.int8:
        # calibrated int8 encoder convs (models/quantized.py); activation
        # scales calibrated on the first real batch of this corpus
        from melspec_gpt_vqvae_tpu.models import quantized as qz
        _enc = jax.jit(lambda p, qs, x: qz.encode_to_indices_apply(
            p, cfg, x, qz.Int8Convs(qs)))
        _box = {}

        def encode(x):
            if "qs" not in _box:
                _box["qs"] = qz.build_encode_qstate(params, cfg, x,
                                                    batch=x.shape[0])
                print("\nint8: encoder calibrated on the first batch")
            return _enc(params, _box["qs"], x)
    else:
        encode = jax.jit(lambda x: model.apply({"params": params}, x,
                                               method="encode_to_indices"))

    for mel_dir in iter_mel_dirs(args.input_dir):
        save_dir = os.path.join(os.path.dirname(mel_dir), "codes_10s")
        os.makedirs(save_dir, exist_ok=True)
        mel_paths = sorted(glob(os.path.join(mel_dir, "*.npy")))

        pending, names = [], []

        def flush():
            if not pending:
                return
            batch = jnp.asarray(np.stack(pending))[..., None]  # NHWC
            codes = np.asarray(encode(batch))
            for name, grid in zip(names, codes):
                np.save(os.path.join(save_dir, name + "_code.npy"), grid)
            pending.clear()
            names.clear()

        for mel_path in mel_paths:
            audio_name = os.path.basename(mel_path).split(".")[0]
            out_path = os.path.join(save_dir, audio_name + "_code.npy")
            if os.path.isfile(out_path):
                print(f"\rfile exists: {mel_path}", end="", flush=True)
                continue
            try:
                mel = np.load(mel_path).astype(np.float32)
                mel = center_crop(mel, mel.shape[0], args.spec_crop_len)
                pending.append(2.0 * mel - 1.0)
                names.append(audio_name)
            except Exception:
                print(f"\n{mel_path} is damaged")
                continue
            if len(pending) == args.batch_size:
                print(f"\rworking on {mel_path}", end="", flush=True)
                flush()
        flush()
    print()


if __name__ == "__main__":
    main()
