#!/usr/bin/env python
"""XL serving datapoint: 2.09B-param VGGSound GPT-VAE decoder sampling
from the prior on one v5e chip (40L/23H/1472d, block 266; reference
scale: config/config_GPT_VAE_vggsound.py:56-68).

Decoder-only params in bf16 + int8 KV cache + int8 streamed weights;
reports tokens/s and clips/s for prior sampling (the reference's
sample_from_prior + decode path, Lit_GPT_VAE.py:611-617 + 108-143, which
re-runs a full forward per token).

Usage:
  python scripts/xl_decode_bench.py                  (TPU; one job at a time)
  python scripts/xl_decode_bench.py --project_tp 2   (CPU; no chip needed)

``--project_tp N`` answers "does B>=256 fit per N-chip TP group?" without N
real chips: it compiles the XL decode ABSTRACTLY (shape-only params via
``jax.eval_shape`` — the 2.09B weights are never materialised) over an
N-way model-axis mesh of virtual CPU devices and reports the per-device
argument + temp bytes from XLA's memory analysis against the 16 GB v5e
HBM budget.  Single-chip B=256 OOMs (BENCH_NOTES.md); the TP sharding
splits the weights and the (L, B, H, T, hd) cache over heads.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

_PROJECT_TP = 0
if "--project_tp" in sys.argv:
    _PROJECT_TP = int(sys.argv[sys.argv.index("--project_tp") + 1])
    # must land before the first jax backend initialisation
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            f"{flags} --xla_force_host_platform_device_count={_PROJECT_TP}"
        ).strip()

import jax

if _PROJECT_TP:
    # sitecustomize already imported jax and registered the TPU backend;
    # the env var alone is too late — force the platform via config (the
    # CPU backend itself initialises lazily, so the XLA_FLAGS device
    # count set above still applies)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from melspec_gpt_vqvae_tpu.configs import load_preset
from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params
from melspec_gpt_vqvae_tpu.models.gpt_vae import (make_vae_configs,
                                                  sample_from_prior,
                                                  vae_decode)

B = int(os.environ.get("XL_BATCH", "64"))
SEGMENTS = int(os.environ.get("XL_SEGMENTS", "8"))


def project_tp(tp: int):
    """Abstract-compile the XL decode over a tp-way model axis; report
    per-device bytes vs the 16 GB v5e budget (no weights materialised)."""
    import functools

    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from melspec_gpt_vqvae_tpu.models.gpt import (gpt_generate,
                                                  init_gpt_params)
    from melspec_gpt_vqvae_tpu.parallel.mesh import (gpt_param_pspecs,
                                                     make_mesh)

    exp = load_preset("GPT_VAE", "vggsound")
    base = exp.model.replace(dtype="bfloat16", cache_dtype="int8",
                             decode_weight_dtype="int8")
    cfgs = make_vae_configs(base, exp.vae)
    dec_cfg = cfgs.decoder
    mesh = make_mesh({"model": tp})

    shapes = jax.eval_shape(lambda k: init_gpt_params(k, dec_cfg),
                            jax.random.PRNGKey(0))
    specs = gpt_param_pspecs(shapes)
    params_abs = jax.tree_util.tree_map(
        lambda s, sp: jax.ShapeDtypeStruct(
            s.shape, s.dtype, sharding=NamedSharding(mesh, sp)),
        shapes, specs)
    z_abs = jax.ShapeDtypeStruct((B, 1, dec_cfg.n_embd), jnp.float32,
                                 sharding=NamedSharding(mesh, P()))
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                   sharding=NamedSharding(mesh, P()))

    steps = cfgs.encoder.block_size
    fn = functools.partial(gpt_generate.__wrapped__, cfg=dec_cfg,
                           steps=steps, temperature=1.0, top_k=100,
                           sample=True, use_pallas=False, segments=SEGMENTS)
    comp = jax.jit(lambda p, k, z: fn(p, key=k, cond_emb=z, given=None)) \
        .lower(params_abs, key_abs, z_abs).compile()
    ma = comp.memory_analysis()
    per_dev = (ma.argument_size_in_bytes + ma.temp_size_in_bytes
               + ma.output_size_in_bytes)
    budget = 16 * 1024 ** 3 * 0.9      # ~10% of HBM reserved by runtime
    print(json.dumps({
        "mode": f"project_tp={tp}", "batch": B, "steps": steps,
        "segments": SEGMENTS,
        # the (L, B, H, T, hd) cache shards over heads only when H % tp
        # == 0 (VAS: 16 heads — yes; VGGSound XL: 23 heads, prime — the
        # cache replicates and only the weights shard; verified by the
        # temp-scaling probe in tests/test_parallel.py)
        "cache_head_sharded": dec_cfg.n_head % tp == 0,
        "args_gb_per_device": round(ma.argument_size_in_bytes / 1024**3, 2),
        "temp_gb_per_device": round(ma.temp_size_in_bytes / 1024**3, 2),
        "total_gb_per_device": round(per_dev / 1024**3, 2),
        "fits_v5e": bool(per_dev < budget),
    }))


def main():
    if _PROJECT_TP:
        project_tp(_PROJECT_TP)
        return
    exp = load_preset("GPT_VAE", "vggsound")
    base = exp.model.replace(dtype="bfloat16", cache_dtype="int8",
                             decode_weight_dtype="int8")
    cfgs = make_vae_configs(base, exp.vae)
    dec_cfg = cfgs.decoder
    # decoder only — prior sampling never runs the encoder
    params = {"decoder": init_gpt_params(jax.random.PRNGKey(0), dec_cfg)}
    n = sum(int(jnp.size(x)) for x in jax.tree_util.tree_leaves(params))
    # vae_decode runs cfgs.encoder.block_size steps (== dec block - 1 for
    # the presets, but derive it from the value actually used)
    steps = cfgs.encoder.block_size
    key = jax.random.PRNGKey(0)
    z = sample_from_prior(key, cfgs, B)

    def run(k):
        return vae_decode(params, cfgs, k, z, strategy="beam", top_k=100,
                          temperature=1.0, segments=SEGMENTS)

    t0 = time.time()
    toks = run(key)
    float(jnp.sum(toks[:1, :1]))
    compile_s = time.time() - t0

    iters = 3
    t0 = time.time()
    for i in range(iters):
        toks = run(jax.random.fold_in(key, i))
    float(jnp.sum(toks[:1, :1]))
    dt = (time.time() - t0) / iters

    print(json.dumps({
        "model": "GPT_VAE vggsound XL decoder",
        "params_b": round(n / 1e9, 3),
        "batch": B, "steps": steps, "segments": SEGMENTS,
        "decode_seconds": round(dt, 3),
        "tokens_per_sec": round(B * steps / dt, 1),
        "clips_per_sec": round(B / dt, 2),
        "compile_seconds": round(compile_s, 1),
    }))


if __name__ == "__main__":
    main()
