#!/usr/bin/env python
"""Online serving: HTTP endpoint for class-conditional clip generation.

Holds the jitted KV-cached generation pipeline resident and answers
requests with WAV audio.  The reference has no serving at all (generation
exists only inside training callbacks, /root/reference/transformer/
minGPT.py:530-612); ``sample.py`` is the offline batch form of the same
pipeline (shared loader: melspec_gpt_vqvae_tpu/serving.py).

API (stdlib http.server, JSON in / WAV or JSON out):
  GET  /healthz                 -> {"status": "ok", platform, model, ...}
  GET  /generate?class=3        -> audio/wav (one 10-second clip)
  POST /generate {"classes": [0, 1], "num": 2, "temperature": 1.0,
                  "top_k": 100, "top_p": 0.9, "deterministic": false,
                  "seed": 7, "format": "json"}
       -> {"clips": [{"class": 0, "wav_base64": ...}, ...], ...}

Requests are padded to the fixed --batch so every call reuses the one
compiled program; changing temperature/top_k/top_p compiles that combo
once (then cached).  Generation is serialized internally (one chip).

Example:
  python serve.py --dataset vas --experiment myrun --resume best \
      --vqvae_ckpt vqvae.ckpt --vocoder_ckpt vocoder/logs/vggsound \
      --batch 8 --port 8000
  curl -o clip.wav 'localhost:8000/generate?class=3&top_p=0.9'
"""

import argparse


def parse_args():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--dataset", type=str, default="vas", choices=["vas"])
    p.add_argument("--experiment", type=str, default=None)
    p.add_argument("--resume", type=str, default="best")
    p.add_argument("--init_random", action="store_true",
                   help="random GPT weights (no checkpoint; smoke/demo)")
    p.add_argument("--vqvae_ckpt", type=str, default=None)
    p.add_argument("--vocoder_ckpt", type=str, default=None)
    p.add_argument("--batch", type=int, default=8,
                   help="fixed serving batch (compiled once; latency/"
                        "throughput knee is ~128, docs/PERF.md)")
    p.add_argument("--temperature", type=float, default=1.0)
    p.add_argument("--top_k", type=int, default=100)
    p.add_argument("--top_p", type=float, default=0.0)
    p.add_argument("--segments", type=int, default=8)
    p.add_argument("--chunk", type=int, default=128)
    p.add_argument("--seed", type=int, default=783435)
    p.add_argument("--kv_cache", type=str, default=None,
                   choices=["auto", "int8"])
    p.add_argument("--int8_weights", type=int, default=None)
    p.add_argument("--int8_decode", action="store_true",
                   help="calibrated int8 VQ-decoder + vocoder convs "
                        "(quality-gated; measured SLOWER e2e than bf16 "
                        "on v5e — BENCH_NOTES.md; kept as an experiment)")
    p.add_argument("--mesh", type=str, default="",
                   help="e.g. 'data=4' or 'data=2,model=2' (multi-chip)")
    p.add_argument("--override", type=str, default="")
    p.add_argument("--platform", type=str, default="")
    p.add_argument("--draft_experiment", type=str, default=None,
                   help="speculative decoding: run name of a smaller GPT "
                        "draft (exact target distribution, lower latency)")
    p.add_argument("--draft_resume", type=str, default="best")
    p.add_argument("--draft_override", type=str, default="")
    p.add_argument("--draft_random", type=str, default="",
                   help="random-init draft config (mechanics smoke)")
    p.add_argument("--gamma", type=int, default=4)
    p.add_argument("--artifact", type=str, default="",
                   help="serve from an AOT StableHLO export "
                        "(scripts/export_serving.py): no retracing; the "
                        "batch + sampling knobs come from its sidecar and "
                        "differing requests get a 400")
    p.add_argument("--max_queue", type=int, default=16,
                   help="bounded request queue: requests beyond this many "
                        "in flight get 503 + Retry-After (load shedding)")
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the startup compile (first request pays it)")
    return p.parse_args()


def main():
    args = parse_args()
    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

    from melspec_gpt_vqvae_tpu.serving import (GenerationService,
                                               build_pipeline, serve)

    if args.artifact and (args.mesh or args.draft_experiment
                          or args.draft_random or args.int8_decode):
        # reject BEFORE build_pipeline: these flags would otherwise burn
        # an expensive build (int8 calibration, mesh shardings) that
        # ArtifactPipeline then silently drops (export.py contract:
        # single-device, no draft, no int8-decode state)
        raise SystemExit("--artifact is single-device, no draft, no "
                         "--int8_decode (export.py contract)")
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
    if args.artifact:
        # AOT path: the artifact's sidecar dictates batch + knobs (the
        # program is fixed); weights come from the just-built pipeline so
        # trees/dtypes match the export
        from melspec_gpt_vqvae_tpu.export import ArtifactPipeline
        pipe = ArtifactPipeline.from_file(args.artifact, pipe)
        m = pipe.meta
        svc = GenerationService(
            exp, pipe, None, batch=pipe.batch, seed=args.seed,
            temperature=m["temperature"], top_k=m["top_k"],
            top_p=m["top_p"], max_queue=args.max_queue)
        print(f"artifact: {args.artifact} (batch {pipe.batch}, "
              f"temperature {m['temperature']}, top_k {m['top_k']}, "
              f"top_p {m['top_p']}, sample {m['sample']})")
    else:
        svc = GenerationService(
            exp, pipe, mesh, batch=args.batch, seed=args.seed,
            temperature=args.temperature, top_k=args.top_k,
            top_p=args.top_p if 0.0 < args.top_p < 1.0 else None,
            max_queue=args.max_queue)
    if not args.no_warmup:
        svc.warmup()
    httpd = serve(svc, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"(batch {svc.batch}, {jax.devices()[0].platform})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
