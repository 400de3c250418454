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

    # Pallas kernels are serving-GRAPH choices, not weights choices:
    # embedding their Mosaic custom calls would pin the artifact to one
    # backend.  The artifact therefore traces the KERNEL-FREE program —
    # the exact plain-conv vocode branch AND the XLA attention path
    # (use_pallas=False; on a TPU host the live pipeline's prefill
    # otherwise dispatches to the Pallas attention kernel,
    # ops/attention.py:186, which jax.export serializes silently).
    # Same weights, same transform chain; on a TPU host the live
    # kernel path's logits can differ from the artifact's in
    # accumulation order, so token-level live==artifact bit-equality is
    # only guaranteed when both run the kernel-free path (as on CPU —
    # pinned by tests/test_serving.py).  export_serving enforces the
    # no-Mosaic invariant structurally on the lowered module.
    from .models.gpt import class_embed, gpt_generate
    from .models.vocoder import MelGANGenerator
    melgan = MelGANGenerator(pipe.exp.vocoder)
    steps = pipe.vcfg.code_h * pipe.vcfg.code_w

    def _gen_plain(gp, cls, key):
        cond = class_embed(gp, cls)
        return gpt_generate(gp, pipe.gcfg, key, cond, None, steps=steps,
                            temperature=temperature, top_k=top_k,
                            top_p=top_p, sample=sample,
                            segments=pipe.segments, use_pallas=False)

    def _voc_plain(vocp, spec):
        mel01 = jnp.clip((spec.astype(jnp.float32) + 1.0) / 2.0,
                         0.0, 1.0)
        if pipe._bf16:
            mel01 = mel01.astype(jnp.bfloat16)
        mel01 = jnp.swapaxes(mel01, 1, 2)
        return melgan.apply({"params": vocp}, mel01)

    def fn(gpt_params, vq_params, voc_params, classes, seed):
        key = jax.random.PRNGKey(seed)
        toks = _gen_plain(gpt_params, classes, key)
        specs = pipe._dec(vq_params, None, toks)
        wavs = _voc_plain(voc_params, specs)
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
    exported = jax_export.export(jax.jit(fn), **kw)(*args)
    # Structural portability invariant: NO Mosaic custom call may reach
    # the artifact (jax.export serializes tpu_custom_call without error,
    # silently pinning the artifact to the TPU backend — the failure mode
    # serving_fn's kernel-free trace exists to prevent).
    mlir = exported.mlir_module()
    for marker in ("tpu_custom_call", "mosaic"):
        if marker in mlir:
            raise RuntimeError(
                f"exported module contains a backend-pinned custom call "
                f"({marker!r}); a Pallas kernel leaked into the "
                f"kernel-free export trace (export.serving_fn)")
    return exported


def tree_dtypes(pipe) -> dict:
    """Flat per-leaf dtype record of the pipeline's three weight trees, in
    ``tree_leaves`` order — written to the sidecar so a server built under
    a *different* dtype policy (build_pipeline casts f32 on CPU vs bf16 on
    TPU, serving.py:95-98 / pipeline.py:72-76) can cast its live trees to
    what the artifact's input avals expect (ArtifactPipeline.from_file)."""
    leaves = lambda t: [str(a.dtype) for a in jax.tree_util.tree_leaves(t)]
    return {"gpt": leaves(pipe.gpt_params), "vq": leaves(pipe.vq_params),
            "voc": leaves(pipe.voc_params)}


def _cast_tree(tree, dtypes, name):
    flat, treedef = jax.tree_util.tree_flatten(tree)
    if len(flat) != len(dtypes):
        raise ValueError(
            f"artifact expects {len(dtypes)} {name} leaves, live pipeline "
            f"has {len(flat)} — geometry mismatch (wrong checkpoint/preset "
            "for this artifact)")
    flat = [a.astype(jnp.dtype(d)) if str(a.dtype) != d else a
            for a, d in zip(flat, dtypes)]
    return jax.tree_util.tree_unflatten(treedef, flat)


def save_exported(exported, path: str, meta: Optional[dict] = None) -> int:
    """Serialize to ``path``; returns the byte count.  ``meta`` (the baked
    serving knobs: batch / temperature / top_k / top_p / sample) is written
    to a ``path + ".json"`` sidecar so a server can validate requests
    against what the artifact was traced with."""
    blob = exported.serialize()
    d = os.path.dirname(os.path.abspath(path))
    os.makedirs(d, exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    if meta is not None:
        import json
        with open(path + ".json", "w") as f:
            json.dump(meta, f, indent=1)
    return len(blob)


def load_exported(path: str):
    """Deserialize an artifact written by :func:`save_exported`.  Call it
    with ``exported.call(gpt_params, vq_params, voc_params, classes,
    seed)`` — trees must match the exported geometry exactly."""
    with open(path, "rb") as f:
        return jax_export.deserialize(f.read())


def load_artifact(path: str):
    """(exported, meta-or-None) — meta from the ``.json`` sidecar."""
    meta = None
    if os.path.isfile(path + ".json"):
        import json
        with open(path + ".json") as f:
            meta = json.load(f)
    return load_exported(path), meta


class ArtifactPipeline:
    """``GenerationPipeline.generate``-shaped adapter over a deserialized
    artifact, so ``serving.GenerationService`` (and therefore serve.py)
    can serve HTTP directly from the AOT program.

    The artifact is a fixed program: the batch and the sampling knobs are
    whatever export baked in.  Requests whose knobs differ are rejected
    loudly (re-export for a different configuration) — the live pipeline
    would recompile instead, which a fleet artifact must never do."""

    def __init__(self, exported, meta: dict, gpt_params, vq_params,
                 voc_params):
        self.exported = exported
        self.meta = dict(meta)
        self.gpt_params = gpt_params
        self.vq_params = vq_params
        self.voc_params = voc_params
        self.batch = int(meta["batch"])
        # GenerationService.warmup honors this: only the baked mode exists
        self.sample_modes = (bool(meta["sample"]),)

    @classmethod
    def from_file(cls, path: str, pipe):
        """Wrap ``path`` around the weight trees of an already-built
        ``GenerationPipeline``.  The trees are cast leaf-wise to the
        dtypes recorded in the sidecar at export time, so an artifact
        exported on a CPU dev host (f32 policy) serves from a TPU-built
        pipeline (bf16 policy) and vice versa — without the cast,
        ``exported.call`` rejects the trees on input-aval dtype mismatch."""
        exported, meta = load_artifact(path)
        if meta is None:
            raise ValueError(f"{path}.json sidecar missing — export with "
                             "scripts/export_serving.py (it records the "
                             "baked batch + sampling knobs)")
        gpt, vq, voc = (pipe.gpt_params, pipe.vq_params, pipe.voc_params)
        wd = meta.get("weight_dtypes")
        if wd is not None:
            gpt = _cast_tree(gpt, wd["gpt"], "gpt")
            vq = _cast_tree(vq, wd["vq"], "vq")
            voc = _cast_tree(voc, wd["voc"], "voc")
        return cls(exported, meta, gpt, vq, voc)

    def _check(self, name, requested, baked):
        if requested != baked:
            raise ValueError(
                f"{name}={requested!r} differs from the artifact's baked "
                f"{name}={baked!r}; re-export (scripts/export_serving.py) "
                "for a different serving configuration")

    def generate(self, classes, key, *, temperature: float = 1.0,
                 top_k: Optional[int] = 100, top_p: Optional[float] = None,
                 sample: bool = True):
        import numpy as np
        m = self.meta
        self._check("temperature", float(temperature),
                    float(m["temperature"]))
        self._check("top_k", top_k or None, m["top_k"] or None)
        self._check("top_p", top_p or None, m["top_p"] or None)
        self._check("sample", bool(sample), bool(m["sample"]))
        cls_arr = jnp.asarray(classes, jnp.int32)
        if cls_arr.shape[0] != self.batch:
            raise ValueError(f"artifact batch is {self.batch}, got "
                             f"{cls_arr.shape[0]} classes")
        # the artifact takes a uint32 seed and builds the key inside; the
        # last key-data word IS the seed for explicitly-seeded requests
        # (PRNGKey(s) data == [0, s]) and a well-mixed word for split keys
        kd = np.asarray(jax.random.key_data(key)).ravel()
        seed = jnp.asarray(np.uint32(kd[-1]), jnp.uint32)
        toks, specs, wavs = self.exported.call(
            self.gpt_params, self.vq_params, self.voc_params, cls_arr, seed)
        return {"tokens": np.asarray(toks),
                "specs": np.asarray(specs, np.float32),
                "wavs": np.asarray(wavs, np.float32)}
