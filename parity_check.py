#!/usr/bin/env python
"""TPU<->CPU code-index parity artifact (the BASELINE.json correctness gate).

The reference tokenizes offline on CPU/GPU in float32
(/root/reference/feature_extraction/extract_codes.py:48-50).  This script
drives a DETERMINISTIC battery of tones/chirps/harmonic stacks through
wav -> mel -> VQ encode on the current (TPU) backend in three variants:

  f32_xla_mel     float32 convs, XLA mel          (isolation: kernels only)
  f32_pallas_mel  float32 convs, fused Pallas mel (adds the mel kernel)
  bf16_pallas_mel bfloat16 convs, Pallas mel      (the bench/production path)

then re-runs the float32 XLA path in a CPU subprocess on identical weights
and records per-variant index match rates into PARITY_CODES.json.

Usage:  python parity_check.py            (on the TPU box)
        python parity_check.py --worker out.npz   (internal: CPU reference)
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile


def make_battery(n_samples: int, sr: int = 22050):
    """Deterministic stimulus battery: tones, chirps, harmonics, AM, and
    seeded noise mixes.  Returns (B, n_samples) float32."""
    import numpy as np
    t = np.arange(n_samples, dtype=np.float64) / sr
    wavs = []
    # 16 pure tones, log-spaced across the mel range (fmin 125, fmax 7600)
    for f in np.geomspace(80.0, 7400.0, 16):
        wavs.append(0.3 * np.sin(2 * np.pi * f * t))
    # 8 linear chirps
    for f0, f1 in [(100, 2000), (2000, 100), (50, 7000), (7000, 50),
                   (300, 900), (900, 300), (1000, 4000), (4000, 1000)]:
        phase = 2 * np.pi * (f0 * t + (f1 - f0) * t ** 2 / (2 * t[-1]))
        wavs.append(0.3 * np.sin(phase))
    # 8 harmonic stacks (sawtooth-like partial sums)
    for f in np.geomspace(90.0, 1800.0, 8):
        w = sum(np.sin(2 * np.pi * f * k * t) / k for k in range(1, 6))
        wavs.append(0.25 * w / np.max(np.abs(w)))
    # 8 AM tones
    for f, fm in [(440, 2), (440, 8), (1000, 4), (1000, 16),
                  (3000, 3), (3000, 12), (200, 5), (5000, 7)]:
        wavs.append(0.3 * np.sin(2 * np.pi * f * t)
                    * (0.5 + 0.5 * np.sin(2 * np.pi * fm * t)))
    # 8 seeded noise mixes (broadband coverage; deterministic by seed)
    for seed in range(8):
        rng = np.random.default_rng(1000 + seed)
        wavs.append(0.15 * rng.standard_normal(n_samples)
                    + 0.15 * np.sin(2 * np.pi * (200 + 500 * seed) * t))
    return np.stack(wavs).astype(np.float32)


def encode_battery(wavs, *, bf16: bool, pallas_mel: bool, use_pallas_vq):
    """wav battery -> (B, 5, 53) code indices on the current backend."""
    import jax
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu.configs import MelConfig, load_preset
    from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
    from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
    from melspec_gpt_vqvae_tpu.ops.mel_pallas import waveform_to_mel_pallas
    from melspec_gpt_vqvae_tpu.ops import vq as vq_ops

    exp = load_preset("GPT", "vas")
    vcfg = exp.vqvae
    mcfg = MelConfig()
    vq = VQModel(vcfg)
    # identical f32 master weights on every path/platform (seed 0)
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 80, 848, 1)))[
        "params"]
    if bf16:
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), params)

    def tokenize(p, wav):
        mel = (waveform_to_mel_pallas(wav, mcfg) if pallas_mel
               else waveform_to_mel(wav, mcfg))
        mel = mel[:, :, 6:854]
        x = (2.0 * mel - 1.0)[..., None]
        if bf16:
            x = x.astype(jnp.bfloat16)
        return vq.apply({"params": p}, x, method="encode_to_indices")

    # pin the VQ dispatch (pallas on TPU, XLA on CPU) for the whole trace
    orig = vq_ops.vq_nearest_index
    if use_pallas_vq is not None:
        vq_ops.vq_nearest_index = lambda x, cb, use_pallas=None: orig(
            x, cb, use_pallas=use_pallas_vq)
    try:
        import numpy as np
        out = jax.jit(tokenize)(params, jnp.asarray(wavs))
        return np.asarray(jax.device_get(out))
    finally:
        vq_ops.vq_nearest_index = orig


def run_worker(out_path: str):
    """CPU float32 XLA reference path (the reference's offline tokenizer
    numerics: extract_codes.py:48-50)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from melspec_gpt_vqvae_tpu.configs import MelConfig
    wavs = make_battery(MelConfig().clip_samples)
    idx = encode_battery(wavs, bf16=False, pallas_mel=False,
                         use_pallas_vq=False)
    np.savez(out_path, idx=idx)
    print(f"cpu reference -> {out_path} {idx.shape}")


def main():
    import numpy as np
    import jax
    from melspec_gpt_vqvae_tpu.configs import MelConfig
    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    platform = jax.devices()[0].platform
    wavs = make_battery(MelConfig().clip_samples)

    variants = {
        # the extract_codes CLI path: full-precision MXU passes everywhere
        "f32_highest": dict(bf16=False, pallas_mel=False, highest=True),
        "f32_xla_mel": dict(bf16=False, pallas_mel=False),
        "f32_pallas_mel": dict(bf16=False, pallas_mel=True),
        "bf16_pallas_mel": dict(bf16=True, pallas_mel=True),
    }
    if platform == "cpu":   # no TPU: degenerate but still runnable
        variants = {"f32_xla_mel": dict(bf16=False, pallas_mel=False)}

    got = {}
    for name, kw in variants.items():
        highest = kw.pop("highest", False)
        if highest:
            with jax.default_matmul_precision("highest"):
                got[name] = encode_battery(wavs, use_pallas_vq=None, **kw)
        else:
            got[name] = encode_battery(wavs, use_pallas_vq=None, **kw)
        print(f"{name}: encoded {got[name].shape}")

    # CPU float32 reference in a subprocess (one process = one backend)
    with tempfile.TemporaryDirectory() as td:
        ref_path = os.path.join(td, "cpu_ref.npz")
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        subprocess.run([sys.executable, os.path.abspath(__file__),
                        "--worker", ref_path], check=True, env=env,
                       cwd=os.path.dirname(os.path.abspath(__file__)))
        ref = np.load(ref_path)["idx"]

    result = {"platform": platform, "battery_clips": int(wavs.shape[0]),
              "codes_per_clip": int(ref[0].size),
              "reference_path": "CPU float32 XLA "
                                "(= reference extract_codes numerics)",
              "variants": {}}
    for name, idx in got.items():
        match = float((idx == ref).mean())
        per_clip = (idx == ref).reshape(idx.shape[0], -1).mean(axis=1)
        result["variants"][name] = {
            "match_rate": round(match, 6),
            "worst_clip_match": round(float(per_clip.min()), 6),
            "mismatched_codes": int((idx != ref).sum()),
        }
        print(f"{name}: match {match:.6f} "
              f"(worst clip {per_clip.min():.4f})")

    with open("PARITY_CODES.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", type=str, default="")
    a = ap.parse_args()
    if a.worker:
        run_worker(a.worker)
    else:
        main()
