"""AOT export of the serving pipeline as a versioned StableHLO artifact.

The reference has no deployment story beyond "run the Lightning checkpoint
inside the training repo" (generation lives in training callbacks,
/root/reference/transformer/minGPT.py:530-612).  A TPU-native serving
story wants an *artifact*: the whole generate → VQ-decode → vocode program
traced once and serialized with ``jax.export`` (StableHLO + calling
convention), so a fleet process can deserialize and run it with ONLY jax
and the weight pytrees — no model code, no Python retracing, and the
compile cache keys on identical HLO across hosts.

Contract (all deliberate):
  * Sampling knobs (temperature / top_k / top_p / sample) are BAKED into
    the artifact — ``gpt_generate`` takes them as compile-time statics,
    so the live pipeline recompiles per combination for the same reason.
    Export one artifact per serving configuration.
  * The serving batch is FIXED at export time (XLA static shapes).  The
    artifact targets the latency regime (B ≤ the pipeline's conv chunk);
    the host-side chunking loop in ``GenerationPipeline.generate`` is a
    large-batch optimization that cannot live inside one traced program.
  * Weights stay ARGUMENTS, not baked constants: one artifact serves any
    checkpoint of the same geometry and the serialized bytes stay small
    (~1 MB of HLO, not ~600 MB of weights).
  * The PRNG enters as a ``uint32`` seed scalar → PRNG-impl-agnostic
    (the key is built inside the program).
  * Single-device only: the mesh path serializes device assignments that
    would pin the artifact to a topology, and speculative decoding / the
    int8-decode experiment carry extra state trees — all three raise.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from jax import export as jax_export


def serving_fn(pipe, *, temperature: float = 1.0, top_k: Optional[int] = 100,
               top_p: Optional[float] = None, sample: bool = True):
    """The pipeline's e2e computation as a pure function of
    ``(gpt_params, vq_params, voc_params, classes, seed)`` →
    ``(tokens, specs, wavs)`` — the exportable unit."""
    if pipe.mesh is not None:
        raise ValueError("AOT export is single-device; build the pipeline "
                         "without --mesh")
    if pipe.draft_params is not None:
        raise ValueError("AOT export does not cover speculative decoding "
                         "(draft weights are a second tree; export the "
                         "plain pipeline)")
    if pipe._qstate is not None:
        raise ValueError("AOT export does not cover the int8-decode "
                         "experiment")

    def fn(gpt_params, vq_params, voc_params, classes, seed):
        key = jax.random.PRNGKey(seed)
        toks, _ = pipe._gen(gpt_params, None, classes, key,
                            temperature, top_k, top_p, sample)
        specs = pipe._dec(vq_params, None, toks)
        wavs = pipe._voc(voc_params, None, specs)
        return toks, specs, wavs

    return fn


def _struct(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)


def export_serving(pipe, batch: int, *, temperature: float = 1.0,
                   top_k: Optional[int] = 100, top_p: Optional[float] = None,
                   sample: bool = True,
                   platforms: Optional[Sequence[str]] = None):
    """Trace + lower the pipeline at ``batch`` and return a
    ``jax.export.Exported``.

    ``platforms`` lowers for other backends than the current one (e.g.
    ``("cpu", "tpu")`` builds a dual artifact on a CPU dev host that a TPU
    server can run); default = the current backend.
    """
    fn = serving_fn(pipe, temperature=temperature, top_k=top_k,
                    top_p=top_p, sample=sample)
    args = (_struct(pipe.gpt_params), _struct(pipe.vq_params),
            _struct(pipe.voc_params),
            jax.ShapeDtypeStruct((batch,), jnp.int32),
            jax.ShapeDtypeStruct((), jnp.uint32))
    kw = {"platforms": tuple(platforms)} if platforms else {}
    return jax_export.export(jax.jit(fn), **kw)(*args)


def save_exported(exported, path: str) -> int:
    """Serialize to ``path``; returns the byte count."""
    blob = exported.serialize()
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    return len(blob)


def load_exported(path: str):
    """Deserialize an artifact written by :func:`save_exported`.  Call it
    with ``exported.call(gpt_params, vq_params, voc_params, classes,
    seed)`` — trees must match the exported geometry exactly."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())
