#!/usr/bin/env python
"""Standalone generation CLI: sample class-conditional 10-second clips.

Serving entry point for the trained GPT + frozen VQ-VAE + MelGAN stack —
the capability the reference exposes only through its training-time
ImageLogger galleries (/root/reference/transformer/minGPT.py:530-612,
callbacks/GPT_callbacks.py:93-152).  Loads a GPT checkpoint (orbax, from
GPT_train.py runs), the frozen VQ-VAE and vocoder (torch-format converts),
generates N clips per class with the KV-cached segmented sampler, and
writes WAV (+ optionally code/spectrogram .npy) files.

Examples:
  python sample.py --dataset vas --experiment myrun --resume best \
      --vqvae_ckpt vqvae.ckpt --vocoder_ckpt vocoder/logs/vggsound \
      --classes all --num 4 --out_dir samples
  python sample.py --dataset vas --init_random --num 1 --classes 0,3 \
      --out_dir /tmp/smoke          # random weights, pipeline smoke test
"""

import argparse
import json
import os
import time


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="vas",
                   choices=["vas"],
                   help="class-conditional GPT presets exist for VAS only "
                        "(the reference ships no config_GPT_vggsound "
                        "either; VGGSound's flagship is the GPT-VAE)")
    p.add_argument("--experiment", type=str, default=None,
                   help="run name: checkpoint is read from "
                        "lightning_logs/{experiment}-{dataset}/checkpoints")
    p.add_argument("--resume", type=str, default="best",
                   help="'best', 'last', or an explicit checkpoint dir")
    p.add_argument("--init_random", action="store_true",
                   help="random GPT weights (no checkpoint; smoke/demo)")
    p.add_argument("--vqvae_ckpt", type=str, default=None,
                   help="torch VQ-VAE ckpt to convert (frozen decoder); "
                        "random init if omitted")
    p.add_argument("--vocoder_ckpt", type=str, default=None,
                   help="MelGAN log dir (best_netG.pt + args.yml); "
                        "random init if omitted")
    p.add_argument("--classes", type=str, default="all",
                   help="'all' or comma-separated class indices")
    p.add_argument("--num", type=int, default=4, help="clips per class")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--top_p", type=float, default=0.0,
                   help="nucleus sampling threshold in (0,1]; 0/1 disable "
                        "(applies after --top_k; beyond the reference, "
                        "which only has top-k, minGPT.py:287-291)")
    p.add_argument("--deterministic", action="store_true",
                   help="greedy decode (reference sample(sample=False))")
    p.add_argument("--segments", type=int, default=8)
    p.add_argument("--chunk", type=int, default=128,
                   help="conv-stage chunk size (bounds activation memory)")
    p.add_argument("--seed", type=int, default=783435)
    p.add_argument("--out_dir", type=str, default="samples")
    p.add_argument("--save_codes", action="store_true")
    p.add_argument("--save_spec", action="store_true")
    p.add_argument("--kv_cache", type=str, default=None,
                   choices=["auto", "int8"],
                   help="default: int8 on TPU, auto elsewhere")
    p.add_argument("--int8_weights", type=int, default=None,
                   help="stream int8 decode weights (default: 1 on TPU)")
    p.add_argument("--int8_decode", action="store_true",
                   help="calibrated int8 VQ-decoder + vocoder convs "
                        "(quality-gated; measured SLOWER e2e than bf16 "
                        "on v5e — BENCH_NOTES.md; kept as an experiment)")
    p.add_argument("--mesh", type=str, default="",
                   help="serve over a device mesh, e.g. 'data=4' (batch "
                        "sharded) or 'data=2,model=2' (Megatron-TP GPT "
                        "weights + head-sharded KV cache); default: "
                        "single device")
    p.add_argument("--override", type=str, default="",
                   help="comma k=v preset overrides, e.g. "
                        "'n_layer=2,n_embd=32'")
    p.add_argument("--platform", type=str, default="",
                   help="force a jax platform (e.g. 'cpu')")
    p.add_argument("--draft_experiment", type=str, default=None,
                   help="speculative decoding: run name of a smaller GPT "
                        "to use as the draft (exact target distribution; "
                        "fewer serial target passes at small batch)")
    p.add_argument("--draft_resume", type=str, default="best")
    p.add_argument("--draft_override", type=str, default="",
                   help="draft preset overrides, e.g. 'n_layer=4'")
    p.add_argument("--draft_random", type=str, default="",
                   help="random-init draft config (mechanics smoke), "
                        "e.g. 'n_layer=2'")
    p.add_argument("--gamma", type=int, default=4,
                   help="draft tokens proposed per speculative round")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)

    import numpy as np

    from melspec_gpt_vqvae_tpu.pipeline import write_wav
    from melspec_gpt_vqvae_tpu.serving import build_pipeline

    exp, pipe, mesh = build_pipeline(
        args.dataset, experiment=args.experiment, resume=args.resume,
        init_random=args.init_random, vqvae_ckpt=args.vqvae_ckpt,
        vocoder_ckpt=args.vocoder_ckpt, override=args.override,
        seed=args.seed, segments=args.segments, chunk=args.chunk,
        kv_cache=args.kv_cache, int8_weights=args.int8_weights,
        mesh_spec=args.mesh, draft_experiment=args.draft_experiment,
        draft_resume=args.draft_resume, draft_override=args.draft_override,
        draft_random=args.draft_random, gamma=args.gamma,
        int8_decode=args.int8_decode)

    # --- sampling --------------------------------------------------------
    if args.classes == "all":
        classes = list(range(exp.model.class_size))
    else:
        classes = [int(c) for c in args.classes.split(",")]
    requests = np.repeat(np.asarray(classes, np.int32), args.num)
    # a data-sharded batch must divide the data axis; pad the tail batch
    # (extra clips are generated but not written)
    dp = dict(mesh.shape).get("data", 1) if mesh is not None else 1
    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    written = 0
    spec_agg = {"rounds": 0, "drafted": 0, "accepted": 0}
    counters = {}
    for start in range(0, len(requests), args.batch):
        batch_cls = requests[start:start + args.batch]
        n_real = len(batch_cls)
        if n_real % dp:
            batch_cls = np.concatenate(
                [batch_cls, np.repeat(batch_cls[-1:], dp - n_real % dp)])
        key, k = jax.random.split(key)
        out = pipe.generate(batch_cls, k, temperature=args.temperature,
                            top_k=args.top_k or None,  # 0 disables
                            top_p=(args.top_p
                                   if 0.0 < args.top_p < 1.0 else None),
                            sample=not args.deterministic)
        batch_cls = batch_cls[:n_real]
        for f in spec_agg:  # run-level stats, not last-batch-only
            spec_agg[f] += out.get("spec_stats", {}).get(f, 0)
        for j, c in enumerate(batch_cls):
            i = counters.get(int(c), 0)
            counters[int(c)] = i + 1
            stem = os.path.join(args.out_dir, f"class{int(c):02d}_{i:03d}")
            write_wav(stem + ".wav", out["wavs"][j],
                      exp.data.sample_rate)
            if args.save_codes:
                np.save(stem + "_codes.npy", out["tokens"][j])
            if args.save_spec:
                np.save(stem + "_mel.npy", out["specs"][j])
            written += 1
    dt = time.time() - t0
    summary = {"written": written, "out_dir": args.out_dir,
               "seconds": round(dt, 2),
               "clips_per_sec": round(written / dt, 2)}
    if spec_agg["drafted"]:
        spec_agg["accept_rate"] = round(
            spec_agg["accepted"] / spec_agg["drafted"], 4)
        summary["speculative"] = spec_agg
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
