"""Batched generation (serving) pipeline: class-conditional GPT sampling
-> VQ-VAE decode -> MelGAN vocoder -> waveforms.

This is the standalone-serving form of the flow the reference only
exercises inside its training-time logging callbacks
(/root/reference/transformer/minGPT.py:530-612 ``log_images`` ->
``sample`` -> ``decode_to_img``; vocoding in
callbacks/GPT_callbacks.py:93-111).  The TPU-native differences that make
it a production path rather than a logging hook:

  * KV-cached segmented decode (``gpt_generate``) instead of 265 full
    forwards per clip (minGPT.py:331-358);
  * one jitted program per stage, re-used across arbitrarily many batches
    (weights are jit *arguments*, so nothing recompiles per call);
  * conv stages chunked so their activation memory does not cap the GPT
    decode batch (decode throughput rises with batch; BENCH_NOTES.md);
  * bf16 conv stacks on TPU with the VQ codebook lookup precision pinned
    where it matters (ops/vq.py).

Used by ``sample.py`` (CLI) and mirrored by ``bench.py`` (which adds the
mel->encode tokenize stage to measure the full round trip).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .configs import ExperimentConfig
from .models.gpt import class_embed, gpt_generate
from .models.vocoder import MelGANGenerator
from .models.vqvae import VQModel


def _chunked(fn, x, chunk: int):
    if not chunk or x.shape[0] <= chunk:
        return fn(x)
    return jnp.concatenate([fn(x[i:i + chunk])
                            for i in range(0, x.shape[0], chunk)], axis=0)


class GenerationPipeline:
    """Jit-once, call-many generation pipeline.

    Parameters are passed as jit arguments (closing over them would bake
    hundreds of MB of weights into the compiled programs as constants).
    """

    def __init__(self, exp: ExperimentConfig, gpt_params, vq_params,
                 voc_params, *, segments: int = 8, chunk: int = 128,
                 bf16: Optional[bool] = None, use_pallas=None, mesh=None,
                 draft_params=None, draft_cfg=None, gamma: int = 4,
                 int8_decode: bool = False,
                 fused_vocoder: Optional[bool] = None):
        self.exp = exp
        self.gcfg = exp.model
        self.vcfg = exp.vqvae
        self.mesh = mesh
        self.draft_cfg = draft_cfg
        self.gamma = gamma
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        if bf16 is None:
            bf16 = on_tpu
        if bf16:
            to_bf16 = lambda t: jax.tree_util.tree_map(
                lambda a: a.astype(jnp.bfloat16), t)
            vq_params = to_bf16(vq_params)
            voc_params = to_bf16(voc_params)
        if mesh is not None:
            # multi-chip serving: GPT weights TP-shard over a ``model``
            # axis when present (Megatron pspecs — GSPMD then propagates
            # the head sharding into the KV cache, parity proven by
            # tests/test_parallel.py); conv-stage weights replicate; the
            # class batch shards over ``data`` via put_batch in generate()
            from .parallel.mesh import (MODEL_AXIS, replicated,
                                        shard_gpt_params)
            if MODEL_AXIS in mesh.shape:
                gpt_params = shard_gpt_params(mesh, gpt_params)
                if draft_params is not None:
                    # the draft composes with TP like the target: Megatron
                    # pspecs on its blocks, GSPMD propagates the head
                    # sharding into its KV cache (parity pinned by
                    # tests/test_speculative.py::test_speculative_tp_*)
                    draft_params = shard_gpt_params(mesh, draft_params)
            else:
                gpt_params = jax.device_put(gpt_params, replicated(mesh))
                if draft_params is not None:
                    draft_params = jax.device_put(draft_params,
                                                  replicated(mesh))
            vq_params = jax.device_put(vq_params, replicated(mesh))
            voc_params = jax.device_put(voc_params, replicated(mesh))
        self.draft_params = draft_params
        self.gpt_params = gpt_params
        self.vq_params = vq_params
        self.voc_params = voc_params
        self.segments = segments
        self.chunk = chunk
        self._bf16 = bf16
        self._use_pallas = use_pallas
        # fused vocoder resblock kernel: default on (it self-gates to
        # TPU + supported geometry); int8_decode supersedes it
        self._fused_voc = (fused_vocoder if fused_vocoder is not None
                           else not int8_decode)

        # int8 decode stage (opt-in EXPERIMENT): calibrated per-layer
        # requantisation through the VQ decoder + vocoder conv stacks.
        # Quality-gated PASS (INT8_DECODE.json) but measured SLOWER e2e
        # than bf16 on v5e (BENCH_NOTES.md int8-decode section)
        self._qstate = None
        if int8_decode:
            from .models import quantized as qz
            self._qstate = qz.build_qstate(vq_params, voc_params,
                                           self.vcfg, exp.vocoder,
                                           n_calib=32, batch=16)
            if mesh is not None:
                from .parallel.mesh import replicated
                self._qstate = jax.device_put(self._qstate,
                                              replicated(mesh))

        vq = VQModel(self.vcfg)
        melgan = MelGANGenerator(exp.vocoder)
        steps = self.vcfg.code_h * self.vcfg.code_w

        if draft_params is not None:
            # speculative decoding (models/speculative.py): the draft
            # proposes gamma tokens/round, the target verifies them in one
            # chunked forward — exact target distribution, fewer serial
            # target passes in the weight-bound small-batch regime
            from .models.speculative import gpt_speculative_generate

            # draft weights are a jit ARGUMENT like gp — closing over
            # them would bake the draft into every compiled variant as
            # constants (the class invariant above)
            def _generate(gp, dp, cls, key, temperature, top_k, top_p,
                          sample):
                cond = class_embed(gp, cls)
                d_cond = class_embed(dp, cls)
                return gpt_speculative_generate(
                    gp, self.gcfg, dp, self.draft_cfg,
                    key, cond, d_cond, steps=steps,
                    gamma=self.gamma, temperature=temperature,
                    top_k=top_k, top_p=top_p, sample=sample)
        else:
            def _generate(gp, dp, cls, key, temperature, top_k, top_p,
                          sample):
                del dp  # no draft: empty pytree placeholder
                cond = class_embed(gp, cls)
                toks = gpt_generate(gp, self.gcfg, key, cond, None,
                                    steps=steps, temperature=temperature,
                                    top_k=top_k, top_p=top_p, sample=sample,
                                    segments=self.segments,
                                    use_pallas=use_pallas)
                return toks, {}

        def _decode_spec(vqp, qs, tokens):
            # GPT order -> (B, code_h, code_w) raster: jnp form of
            # utils.codes.sequence_to_grid (that helper is host-side numpy;
            # reference code_reader(reverse=True), minGPT.py:438-456)
            grid = jnp.swapaxes(
                tokens.reshape(-1, self.vcfg.code_w, self.vcfg.code_h),
                1, 2)
            if qs is not None:
                from .models import quantized as qz
                return qz.decode_code_apply(vqp, self.vcfg, grid,
                                            qz.Int8Convs(qs))[..., 0]
            return vq.apply({"params": vqp}, grid,
                            method="decode_code")[..., 0]

        def _vocode(vocp, qs, spec):
            # spec in [-1,1] (dataset scaling, datasets/vas.py:81) ->
            # [0,1] mel -> waveform
            mel01 = jnp.clip((spec.astype(jnp.float32) + 1.0) / 2.0,
                             0.0, 1.0)
            if self._bf16:
                mel01 = mel01.astype(jnp.bfloat16)
            mel01 = jnp.swapaxes(mel01, 1, 2)
            if qs is not None:
                from .models import quantized as qz
                return qz.melgan_apply(vocp, exp.vocoder, mel01,
                                       qz.Int8Convs(qs))
            if self._fused_voc:
                # fused resblock-stack kernel (ops/vocoder_pallas.py):
                # measured 0.7235 s vs 0.7387 s unfused for the full
                # vocoder stage at B=512 on v5e (scripts/detok_split.py,
                # BENCH_NOTES.md round-5 section) — a ~2% stage win;
                # FusedConvs itself falls back to the exact conv path
                # off-TPU or at unsupported geometry
                from .models import quantized as qz
                return qz.melgan_apply(vocp, exp.vocoder, mel01,
                                       qz.FusedConvs())
            return melgan.apply({"params": vocp}, mel01)

        # sample=True/False retrace via static_argnums on the inner jit;
        # temperature/top_k stay traced where possible (gpt_generate takes
        # them static, so changing them recompiles — document, don't hide)
        self._gen = jax.jit(_generate, static_argnames=("temperature",
                                                        "top_k", "top_p",
                                                        "sample"))
        self._dec = jax.jit(_decode_spec)
        self._voc = jax.jit(_vocode)

    def generate(self, classes, key, *, temperature: float = 1.0,
                 top_k: Optional[int] = 100,
                 top_p: Optional[float] = None,
                 sample: bool = True) -> Dict[str, np.ndarray]:
        """classes: (N,) ints -> dict(tokens (N, S), specs (N, H, W),
        wavs (N, samples)) as host numpy arrays."""
        cls = jnp.asarray(classes, jnp.int32)
        if self.mesh is not None:
            from .parallel.mesh import put_batch
            cls = put_batch(self.mesh, cls)
        toks, stats = self._gen(self.gpt_params, self.draft_params, cls,
                                key, temperature, top_k, top_p, sample)
        specs = _chunked(functools.partial(self._dec, self.vq_params,
                                           self._qstate),
                         toks, self.chunk)
        wavs = _chunked(functools.partial(self._voc, self.voc_params,
                                          self._qstate),
                        specs, self.chunk)
        out = {"tokens": np.asarray(toks),
               "specs": np.asarray(specs, np.float32),
               "wavs": np.asarray(wavs, np.float32)}
        if stats:  # speculative decode observability
            drafted = max(1, int(stats["drafted"]))
            out["spec_stats"] = {"rounds": int(stats["rounds"]),
                                 "drafted": drafted,
                                 "accepted": int(stats["accepted"]),
                                 "accept_rate": round(
                                     int(stats["accepted"]) / drafted, 4)}
        return out


def wav_bytes(wav: np.ndarray, sample_rate: int = 22050) -> bytes:
    """PCM16 WAV encoded in memory via the stdlib (soundfile is absent in
    this image; same approach as TBLogger.audio)."""
    import io
    import wave

    data = np.clip(np.asarray(wav, np.float32).reshape(-1), -1.0, 1.0)
    pcm = (data * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def write_wav(path: str, wav: np.ndarray, sample_rate: int = 22050):
    """PCM16 WAV file (the buffer form above, on disk)."""
    with open(path, "wb") as f:
        f.write(wav_bytes(wav, sample_rate))
