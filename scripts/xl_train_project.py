#!/usr/bin/env python
"""XL *training* memory projection: which mesh trains the 2.09B VGGSound
GPT-VAE (40L/23H/1472d x encoder+decoder; reference scale:
config/config_GPT_VAE_vggsound.py:56-70) with which optimizer?

Companion to ``xl_decode_bench.py --project_tp`` (serving memory) — same
method, applied to the TRAINING step: the full ``VAETask`` train step
(value_and_grad + optimizer update + KL-annealing state) is compiled
ABSTRACTLY over a virtual CPU mesh (shape-only params via
``jax.eval_shape`` — the 2.09B weights are never materialised) and XLA's
memory analysis is read out per device against the 16 GB v5e budget.

Scenarios:
  * two single-chip CALIBRATION rows whose ground truth is known from real
    TPU runs (BENCH_NOTES.md "XL training"): f32 AdamW does NOT fit
    (~31.5 GB; projector says 31.52 — exact) and bf16 params + Adafactor
    DOES (3.53 s/step measured at bs 1; projector says 23.6 GB — the CPU
    temp analysis widens bf16 intermediates to f32 and schedules less
    aggressively than the TPU compiler, so temp bytes are an UPPER BOUND:
    "fits" verdicts are safe, "doesn't fit" verdicts can be ~1.5x
    pessimistic when most traffic is bf16);
  * pipeline-parallel rows (parallel/pipeline.py GPipe schedule): blocks
    stage-sharded over a ``pipe`` axis, embeddings/head replicated, Adam
    moments sharded alongside their params (optax state mirrors the param
    tree, so the same leading-axis rule applies).

The reference trains this model with DDP AdamW at bs 1 per GPU
(/root/reference/GPT_VAE_train.py:166-182 + config_GPT_VAE_vggsound.py) —
data-parallel replication cannot shrink per-device state, so on 16 GB
chips the reference optimizer is simply unavailable.  The pipeline axis
is what restores it.

Usage:  python scripts/xl_train_project.py          (CPU only, no chip)
"""

import json
import os
import sys
from dataclasses import replace

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
# must land before the first jax backend initialisation
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        f"{_flags} --xla_force_host_platform_device_count=8").strip()

import jax
import jax.numpy as jnp

# sitecustomize already imported jax and registered the TPU backend; the
# env var alone is too late (same dance as xl_decode_bench.py)
jax.config.update("jax_platforms", "cpu")

from jax.sharding import NamedSharding, PartitionSpec as P

from melspec_gpt_vqvae_tpu.configs import load_preset
from melspec_gpt_vqvae_tpu.models import gpt_vae as V
from melspec_gpt_vqvae_tpu.parallel.mesh import DATA_AXIS, make_mesh
from melspec_gpt_vqvae_tpu.parallel.pipeline import PIPE_AXIS
from melspec_gpt_vqvae_tpu.training.vae_task import VAETask

BUDGET = 16 * 1024 ** 3 * 0.9      # ~10% of HBM reserved by runtime


def project(name, mesh_shape, *, optimizer, dtype, batch, micro=0,
            note=None):
    exp = load_preset("GPT_VAE", "vggsound")
    exp = replace(exp, model=replace(exp.model, dtype=dtype),
                  train=replace(exp.train, optimizer=optimizer,
                                batch_size=batch))
    mesh = make_mesh(dict(mesh_shape))
    task = VAETask(exp, steps_per_epoch=100, mesh=mesh, pp_micro=micro)
    layer_counts = {task.cfgs.encoder.n_layer, task.cfgs.decoder.n_layer}
    pp = task.pp is not None

    def make_state(key):
        params = V.init_vae_params(key, task.cfgs)
        return {"params": params,
                "opt_state": task.optimizer.init(params),
                "step": jnp.zeros((), jnp.int32),
                "kl_weight": jnp.asarray(exp.vae.kl_start, jnp.float32)}

    shapes = jax.eval_shape(make_state, jax.random.PRNGKey(0))

    def spec_for(path, x):
        # stacked block leaves (params AND the optax moments mirroring
        # them — incl. Adafactor's factored stats, which keep the leading
        # layer axis) shard their layer axis over pipe; everything else
        # (embeddings, head, scalars) replicates
        if (pp and "blocks" in jax.tree_util.keystr(path)
                and x.ndim >= 1 and x.shape[0] in layer_counts):
            return P(PIPE_AXIS, *([None] * (x.ndim - 1)))
        return P()

    state_abs = jax.tree_util.tree_map_with_path(
        lambda p, x: jax.ShapeDtypeStruct(
            x.shape, x.dtype, sharding=NamedSharding(mesh, spec_for(p, x))),
        shapes)

    T = task.cfgs.encoder.block_size
    x_spec = P(DATA_AXIS) if DATA_AXIS in mesh.shape else P()
    x_abs = jax.ShapeDtypeStruct((batch, T), jnp.int32,
                                 sharding=NamedSharding(mesh, P(*x_spec)))
    key_shape = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    key_abs = jax.ShapeDtypeStruct(key_shape.shape, key_shape.dtype,
                                   sharding=NamedSharding(mesh, P()))
    frz_abs = jax.ShapeDtypeStruct((), jnp.bool_,
                                   sharding=NamedSharding(mesh, P()))

    comp = jax.jit(task._train_step_fn, donate_argnums=0) \
        .lower(state_abs, x_abs, key_abs, frz_abs).compile()
    ma = comp.memory_analysis()
    # donated state aliases output buffers, so args+temp is the live set;
    # output is reported separately for transparency
    per_dev = ma.argument_size_in_bytes + ma.temp_size_in_bytes
    row = {
        "scenario": name, "mesh": dict(mesh_shape), "optimizer": optimizer,
        "param_dtype": dtype, "global_batch": batch,
        "n_micro": micro or (2 * mesh_shape.get("pipe", 0)) or None,
        "args_gb_per_device": round(ma.argument_size_in_bytes / 1024**3, 2),
        "temp_gb_per_device": round(ma.temp_size_in_bytes / 1024**3, 2),
        "out_gb_per_device": round(ma.output_size_in_bytes / 1024**3, 2),
        "total_gb_per_device": round(per_dev / 1024**3, 2),
        "fits_v5e": bool(per_dev < BUDGET),
    }
    if note:
        row["note"] = note
    print(json.dumps(row), flush=True)
    return row


def main():
    # calibration: ground truth from real single-chip TPU runs
    project("single_adamw_f32", {"data": 1},
            optimizer="adamw", dtype="float32", batch=1,
            note="calibration: hand-computed 31.5 GB (BENCH_NOTES) — exact")
    project("single_adafactor_bf16", {"data": 1},
            optimizer="adafactor", dtype="bfloat16", batch=1,
            note="calibration: FIT on the real chip (3.53 s/step) — "
                 "CPU temp analysis is a conservative upper bound")
    # the pipeline rows: does the REFERENCE optimizer come back at scale?
    project("pp4_adamw_f32", {"pipe": 4},
            optimizer="adamw", dtype="float32", batch=8, micro=8)
    project("dp2_pp4_adamw_f32", {"data": 2, "pipe": 4},
            optimizer="adamw", dtype="float32", batch=16, micro=8)
    # batch scaling: how far does a 4-stage group stretch the global batch?
    project("pp4_adamw_f32_b32", {"pipe": 4},
            optimizer="adamw", dtype="float32", batch=32, micro=8)
    project("pp8_adamw_f32_b64", {"pipe": 8},
            optimizer="adamw", dtype="float32", batch=64, micro=16)


if __name__ == "__main__":
    main()
