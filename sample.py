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
import dataclasses
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

    import jax.numpy as jnp
    import numpy as np

    from melspec_gpt_vqvae_tpu.configs import load_preset
    from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params
    from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator
    from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
    from melspec_gpt_vqvae_tpu.pipeline import GenerationPipeline, write_wav

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    from melspec_gpt_vqvae_tpu.configs import parse_overrides
    exp = load_preset("GPT", args.dataset,
                      **parse_overrides(args.override))
    kv = args.kv_cache or ("int8" if on_tpu else "auto")
    int8_w = args.int8_weights if args.int8_weights is not None else int(on_tpu)
    exp = dataclasses.replace(exp, model=exp.model.replace(
        dtype="bfloat16" if on_tpu else "float32",
        cache_dtype=kv,
        decode_weight_dtype="int8" if int8_w else "auto"))

    # --- GPT weights -----------------------------------------------------
    if args.init_random:
        gpt_params = init_gpt_params(jax.random.PRNGKey(args.seed),
                                     exp.model)
        print("GPT: random init (--init_random)")
    else:
        if not args.experiment:
            raise SystemExit("--experiment (or --init_random) is required")
        from melspec_gpt_vqvae_tpu.training.checkpoint import \
            CheckpointManager
        from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask
        run_dir = os.path.join("lightning_logs",
                               f"{args.experiment}-{args.dataset}")
        ckpt_root = os.path.join(run_dir, "checkpoints")
        if not os.path.isdir(ckpt_root):
            raise SystemExit(
                f"no checkpoints dir at {ckpt_root} (wrong --experiment, "
                f"or the run never saved, e.g. --ckpt_every -1)")
        versions = sorted((d for d in os.listdir(ckpt_root)
                           if d.startswith("version_")),
                          key=lambda d: int(d.split("_")[-1]))
        if not versions:
            raise SystemExit(f"no checkpoints under {ckpt_root}")
        ckpt = CheckpointManager(os.path.join(ckpt_root, versions[-1]))
        task = GPTTask(exp)
        from melspec_gpt_vqvae_tpu.training.checkpoint import \
            shape_template
        template = {"state": shape_template(task.init_state(args.seed)),
                    "epoch": 0}
        restored = ckpt.restore(args.resume, template=template)
        gpt_params = restored["state"]["params"]
        print(f"GPT: restored {args.resume} "
              f"(epoch {int(restored['epoch'])})")

    # --- frozen decoders -------------------------------------------------
    if args.vqvae_ckpt:
        from melspec_gpt_vqvae_tpu.utils.convert import load_vqvae_params
        vq_params = load_vqvae_params(args.vqvae_ckpt, exp.vqvae)
        print(f"VQ-VAE: {args.vqvae_ckpt}")
    else:
        vq_params = VQModel(exp.vqvae).init(
            jax.random.PRNGKey(1), jnp.zeros((1, 80, 848, 1)))["params"]
        print("VQ-VAE: random init (pass --vqvae_ckpt for real audio)")
    if args.vocoder_ckpt:
        from melspec_gpt_vqvae_tpu.utils.convert import load_vocoder_params
        voc_params, voc_cfg = load_vocoder_params(args.vocoder_ckpt)
        exp = dataclasses.replace(exp, vocoder=voc_cfg)
        print(f"vocoder: {args.vocoder_ckpt}")
    else:
        voc_params = MelGANGenerator(exp.vocoder).init(
            jax.random.PRNGKey(2), jnp.zeros((1, 848, 80)))["params"]
        print("vocoder: random init (pass --vocoder_ckpt for real audio)")

    # --- sampling --------------------------------------------------------
    if args.classes == "all":
        classes = list(range(exp.model.class_size))
    else:
        classes = [int(c) for c in args.classes.split(",")]
    requests = np.repeat(np.asarray(classes, np.int32), args.num)

    mesh = None
    if args.mesh:
        from melspec_gpt_vqvae_tpu.parallel.mesh import make_mesh, parse_mesh
        mesh = make_mesh(parse_mesh(args.mesh))
        print(f"mesh: {dict(mesh.shape)}")
    pipe = GenerationPipeline(exp, gpt_params, vq_params, voc_params,
                              segments=args.segments, chunk=args.chunk,
                              mesh=mesh)
    # a data-sharded batch must divide the data axis; pad the tail batch
    # (extra clips are generated but not written)
    dp = dict(mesh.shape).get("data", 1) if mesh is not None else 1
    os.makedirs(args.out_dir, exist_ok=True)
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    written = 0
    counters = {}
    for start in range(0, len(requests), args.batch):
        batch_cls = requests[start:start + args.batch]
        n_real = len(batch_cls)
        if n_real % dp:
            batch_cls = np.concatenate(
                [batch_cls, np.repeat(batch_cls[-1:], dp - n_real % dp)])
        key, k = jax.random.split(key)
        out = pipe.generate(batch_cls, k, temperature=args.temperature,
                            top_k=args.top_k,
                            top_p=(args.top_p
                                   if 0.0 < args.top_p < 1.0 else None),
                            sample=not args.deterministic)
        batch_cls = batch_cls[:n_real]
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
    print(json.dumps({"written": written, "out_dir": args.out_dir,
                      "seconds": round(dt, 2),
                      "clips_per_sec": round(written / dt, 2)}))


if __name__ == "__main__":
    main()
