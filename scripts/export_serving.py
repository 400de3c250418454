#!/usr/bin/env python
"""Export the serving pipeline as an AOT StableHLO artifact (jax.export).

Builds the same pipeline as sample.py / serve.py (shared
serving.build_pipeline loading path), traces it at a fixed serving batch
with the given sampling knobs, and writes a versioned, self-describing
artifact a fleet process can run with only jax + the weight pytrees —
no model code (melspec_gpt_vqvae_tpu/export.py documents the contract).

Usage:
  python scripts/export_serving.py --dataset vas --experiment my_gpt \
      --resume best --vqvae_ckpt vq.ckpt --vocoder_ckpt vocoder/logs/x \
      --batch 8 --temperature 1.0 --top_k 100 --out pipe_b8.stablehlo
  # smoke: --init_random skips checkpoints
  # cross-platform build: --platforms cpu,tpu
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="vas")
    p.add_argument("--experiment", default=None)
    p.add_argument("--resume", default="best")
    p.add_argument("--init_random", action="store_true")
    p.add_argument("--vqvae_ckpt", default=None)
    p.add_argument("--vocoder_ckpt", default=None)
    p.add_argument("--override", default="")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--top_p", type=float, default=None)
    p.add_argument("--deterministic", action="store_true",
                   help="bake greedy decode instead of sampling")
    p.add_argument("--segments", type=int, default=8)
    p.add_argument("--platforms", default="",
                   help="comma list, e.g. 'cpu,tpu' (default: current)")
    p.add_argument("--platform", default="",
                   help="force the local jax platform (e.g. cpu)")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from melspec_gpt_vqvae_tpu import export as aot
    from melspec_gpt_vqvae_tpu.serving import build_pipeline

    # DEFAULT pipeline build (fused vocoder on where supported): export
    # itself traces the kernel-free conv path for the artifact
    # (export.serving_fn), so no fused_vocoder=False is needed here
    _, pipe, _ = build_pipeline(
        args.dataset, experiment=args.experiment, resume=args.resume,
        init_random=args.init_random, vqvae_ckpt=args.vqvae_ckpt,
        vocoder_ckpt=args.vocoder_ckpt, override=args.override,
        segments=args.segments)
    platforms = [s for s in args.platforms.split(",") if s] or None
    ex = aot.export_serving(pipe, args.batch,
                            temperature=args.temperature,
                            top_k=args.top_k or None, top_p=args.top_p,
                            sample=not args.deterministic,
                            platforms=platforms)
    meta = {"batch": args.batch, "temperature": args.temperature,
            "top_k": args.top_k or None, "top_p": args.top_p,
            "sample": not args.deterministic, "dataset": args.dataset,
            # per-leaf dtypes of the trees the artifact was traced with:
            # serve.py --artifact casts its live trees to these, so an
            # artifact exported under one dtype policy (CPU f32) runs on
            # a server built under another (TPU bf16)
            "weight_dtypes": aot.tree_dtypes(pipe)}
    n = aot.save_exported(ex, args.out, meta)
    print(f"wrote {args.out}: {n / 1e6:.2f} MB, batch={args.batch}, "
          f"platforms={platforms or [jax.devices()[0].platform]}, "
          f"temperature={args.temperature} top_k={args.top_k} "
          f"top_p={args.top_p}")
    print("run with: melspec_gpt_vqvae_tpu.export.load_exported(path)"
          ".call(gpt_params, vq_params, voc_params, classes, seed)")


if __name__ == "__main__":
    main()
