"""Serving layer: checkpoint -> GenerationPipeline builder + HTTP server.

The reference has no serving at all — generation exists only inside its
training-time logging callbacks (/root/reference/transformer/minGPT.py:
530-612 ``log_images``).  ``sample.py`` is the batch CLI; this module adds
the online form: a stdlib-only (http.server) endpoint that holds the
jitted pipeline resident and answers class-conditional generation
requests with WAV audio.

Design points for the TPU path:
  * fixed serving batch — requests are padded to ``batch`` so every call
    hits the one compiled program (static shapes; no retrace per request);
  * generation is serialized with a lock (one chip, one tunnel); the
    HTTP layer is threaded so health checks never queue behind decodes;
  * sampling knobs (temperature/top_k/top_p) are static in the jit —
    each new combination compiles once and is then cached, so a warmup
    request with the defaults happens at startup.
"""

from __future__ import annotations

import base64
import dataclasses
import json
import os
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional
from urllib.parse import parse_qs, urlparse

import numpy as np

from .pipeline import wav_bytes


def _restore_gpt_params(exp, dataset: str, experiment: str, resume: str,
                        seed: int):
    """GPT weights from an orbax run checkpoint
    (lightning_logs/{experiment}-{dataset}/checkpoints/version_*)."""
    from .training.checkpoint import CheckpointManager, shape_template
    from .training.gpt_task import GPTTask
    ckpt_root = os.path.join("lightning_logs", f"{experiment}-{dataset}",
                             "checkpoints")
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
    state0 = GPTTask(exp).init_state(seed)
    template = {"state": shape_template(state0), "epoch": 0}
    # defaults= lets round<=3 checkpoints (bare-chain opt_state) restore
    # via the legacy-layout migration in CheckpointManager.restore
    restored = ckpt.restore(resume, template=template,
                            defaults={"state": state0, "epoch": 0})
    return restored["state"]["params"], int(restored["epoch"])


def build_pipeline(dataset: str = "vas", *, experiment: Optional[str] = None,
                   resume: str = "best", init_random: bool = False,
                   vqvae_ckpt: Optional[str] = None,
                   vocoder_ckpt: Optional[str] = None, override: str = "",
                   seed: int = 783435, segments: int = 8, chunk: int = 128,
                   kv_cache: Optional[str] = None,
                   int8_weights: Optional[int] = None, mesh_spec: str = "",
                   draft_experiment: Optional[str] = None,
                   draft_resume: str = "best", draft_override: str = "",
                   draft_random: str = "", gamma: int = 4,
                   int8_decode: bool = False,
                   fused_vocoder: Optional[bool] = None):
    """Load weights and construct the jit-once GenerationPipeline.

    The common loading path of ``sample.py`` and ``serve.py``: GPT weights
    from an orbax run checkpoint (or random for smoke tests), frozen
    VQ-VAE + MelGAN from torch-format converts (or random), TPU defaults
    (bf16 model dtype, int8 KV cache, int8 streamed decode weights), and
    an optional device mesh for batch-sharded / Megatron-TP serving.

    Returns ``(exp, pipe, mesh)``.
    """
    import jax
    import jax.numpy as jnp

    from .configs import load_preset, parse_overrides
    from .models.gpt import init_gpt_params
    from .models.vocoder import MelGANGenerator
    from .models.vqvae import VQModel
    from .pipeline import GenerationPipeline

    on_tpu = jax.devices()[0].platform not in ("cpu",)
    exp = load_preset("GPT", dataset, **parse_overrides(override))
    kv = kv_cache or ("int8" if on_tpu else "auto")
    int8_w = int8_weights if int8_weights is not None else int(on_tpu)
    exp = dataclasses.replace(exp, model=exp.model.replace(
        dtype="bfloat16" if on_tpu else "float32",
        cache_dtype=kv,
        decode_weight_dtype="int8" if int8_w else "auto"))

    # --- GPT weights -------------------------------------------------------
    if init_random:
        gpt_params = init_gpt_params(jax.random.PRNGKey(seed), exp.model)
        print("GPT: random init (--init_random)")
    else:
        if not experiment:
            raise SystemExit("--experiment (or --init_random) is required")
        gpt_params, epoch = _restore_gpt_params(exp, dataset, experiment,
                                                resume, seed)
        print(f"GPT: restored {resume} (epoch {epoch})")

    # --- optional speculative draft -----------------------------------------
    draft_params = draft_cfg = None
    if draft_override and not (draft_experiment or draft_random):
        raise SystemExit("--draft_override requires --draft_experiment "
                         "or --draft_random")
    if draft_experiment or draft_random:
        # draft config = target overrides (geometry like vocab_size/
        # block_size must track the target) + draft-specific overrides
        d_ov = {**parse_overrides(override),
                **parse_overrides(draft_override),
                **parse_overrides(draft_random)}
        d_exp = load_preset("GPT", dataset, **d_ov)
        d_exp = dataclasses.replace(d_exp, model=d_exp.model.replace(
            dtype=exp.model.dtype, cache_dtype=exp.model.cache_dtype,
            decode_weight_dtype=exp.model.decode_weight_dtype))
        draft_cfg = d_exp.model
        for f in ("vocab_size", "block_size", "class_size"):
            if getattr(draft_cfg, f) != getattr(exp.model, f):
                raise SystemExit(
                    f"draft {f}={getattr(draft_cfg, f)} must equal the "
                    f"target's {getattr(exp.model, f)} (the speculative "
                    f"accept/reject compares the two distributions)")
        if draft_experiment:
            draft_params, d_epoch = _restore_gpt_params(
                d_exp, dataset, draft_experiment, draft_resume, seed)
            print(f"draft GPT: restored {draft_experiment} "
                  f"(epoch {d_epoch}, {draft_cfg.n_layer}L, gamma={gamma})")
        else:
            draft_params = init_gpt_params(jax.random.PRNGKey(seed + 1),
                                           draft_cfg)
            print(f"draft GPT: random init ({draft_cfg.n_layer}L, "
                  f"gamma={gamma})")

    # --- frozen decoders ----------------------------------------------------
    # mel geometry implied by the code grid (16x downsample: 80 x 848)
    mel_bins = exp.vqvae.code_h * (exp.vqvae.resolution // exp.vqvae.code_w)
    if vqvae_ckpt:
        from .utils.convert import load_vqvae_params
        vq_params = load_vqvae_params(vqvae_ckpt, exp.vqvae)
        print(f"VQ-VAE: {vqvae_ckpt}")
    else:
        vq_params = VQModel(exp.vqvae).init(
            jax.random.PRNGKey(1),
            jnp.zeros((1, mel_bins, exp.vqvae.resolution, 1)))["params"]
        print("VQ-VAE: random init (pass --vqvae_ckpt for real audio)")
    if vocoder_ckpt:
        from .utils.convert import load_vocoder_params
        voc_params, voc_cfg = load_vocoder_params(vocoder_ckpt)
        exp = dataclasses.replace(exp, vocoder=voc_cfg)
        print(f"vocoder: {vocoder_ckpt}")
    else:
        voc_params = MelGANGenerator(exp.vocoder).init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, exp.vqvae.resolution, mel_bins)))["params"]
        print("vocoder: random init (pass --vocoder_ckpt for real audio)")

    mesh = None
    if mesh_spec:
        from .parallel.mesh import make_mesh, parse_mesh
        mesh = make_mesh(parse_mesh(mesh_spec))
        print(f"mesh: {dict(mesh.shape)}")
    pipe = GenerationPipeline(exp, gpt_params, vq_params, voc_params,
                              segments=segments, chunk=chunk, mesh=mesh,
                              draft_params=draft_params,
                              draft_cfg=draft_cfg, gamma=gamma,
                              int8_decode=int8_decode,
                              fused_vocoder=fused_vocoder)
    return exp, pipe, mesh


class ServiceOverloaded(RuntimeError):
    """Raised when the bounded request queue is full — the HTTP layer
    maps it to 503 + Retry-After (load shedding beats unbounded queueing:
    one chip serializes generation, so past ``max_queue`` waiters every
    extra request only inflates tail latency for everyone)."""


class GenerationService:
    """Thread-safe, fixed-batch wrapper around a GenerationPipeline."""

    def __init__(self, exp, pipe, mesh=None, *, batch: int = 8,
                 seed: int = 783435, temperature: float = 1.0,
                 top_k: Optional[int] = 100, top_p: Optional[float] = None,
                 max_queue: int = 16):
        import jax
        self.exp = exp
        self.pipe = pipe
        self.batch = max(1, int(batch))
        dp = dict(mesh.shape).get("data", 1) if mesh is not None else 1
        if self.batch % dp:
            raise SystemExit(f"the mesh data axis ({dp}) must divide "
                             f"--batch ({batch})")
        self.defaults = {"temperature": temperature,
                         "top_k": top_k or None,  # 0 disables, like top_p
                         "top_p": top_p}
        self._jax = jax
        self._lock = threading.Lock()
        self._key = jax.random.PRNGKey(seed)
        self.started = time.time()
        self.requests = 0
        self.shed = 0                      # requests rejected at the bound
        self.max_queue = max(1, int(max_queue))
        self._pending = 0                  # in-flight + queued generates
        self._pending_lock = threading.Lock()

    def generate(self, classes, *, temperature=None, top_k=None,
                 top_p=None, sample: bool = True,
                 seed: Optional[int] = None) -> Dict[str, np.ndarray]:
        """Generate one clip per entry of ``classes`` (any length: padded
        to the serving batch, chunked when longer)."""
        cs = np.asarray(classes, np.int32)
        if cs.ndim != 1 or len(cs) == 0:
            raise ValueError("classes must be a non-empty 1-D list")
        if (cs < 0).any() or (cs >= self.exp.model.class_size).any():
            raise ValueError(
                f"class indices must be in [0, {self.exp.model.class_size})")
        t = self.defaults["temperature"] if temperature is None \
            else float(temperature)
        if not t > 0.0:
            raise ValueError("temperature must be > 0 (use "
                             "deterministic=true for greedy decode)")
        k = self.defaults["top_k"] if top_k is None else (int(top_k) or None)
        p = self.defaults["top_p"] if top_p is None else float(top_p)
        p = p if (p and 0.0 < p < 1.0) else None
        # admission control BEFORE queueing on the generation lock
        with self._pending_lock:
            if self._pending >= self.max_queue:
                self.shed += 1
                raise ServiceOverloaded(
                    f"request queue full ({self.max_queue} in flight); "
                    "retry later")
            self._pending += 1
        try:
            return self._generate_locked(cs, t, k, p, sample, seed)
        finally:
            with self._pending_lock:
                self._pending -= 1

    def _generate_locked(self, cs, t, k, p, sample, seed):
        wavs, toks, specs = [], [], []
        agg = {"rounds": 0, "drafted": 0, "accepted": 0}
        with self._lock:
            for i in range(0, len(cs), self.batch):
                part = cs[i:i + self.batch]
                n = len(part)
                if n < self.batch:  # pad to the compiled batch shape
                    part = np.concatenate(
                        [part, np.repeat(part[-1:], self.batch - n)])
                if seed is not None:
                    # mask to uint32: the AOT artifact takes a uint32 seed
                    # scalar (export.py — key built in-program from the
                    # last key-data word), so explicit seeds must live in
                    # [0, 2**32) for live and artifact serving to produce
                    # the same tokens for the same HTTP seed
                    key = self._jax.random.PRNGKey(
                        (int(seed) + i) & 0xFFFFFFFF)
                else:
                    self._key, key = self._jax.random.split(self._key)
                out = self.pipe.generate(part, key, temperature=t, top_k=k,
                                         top_p=p, sample=sample)
                wavs.append(out["wavs"][:n])
                toks.append(out["tokens"][:n])
                specs.append(out["specs"][:n])
                for f in agg:  # whole-request stats, not last-sub-batch
                    agg[f] += out.get("spec_stats", {}).get(f, 0)
            self.requests += 1
        res = {"wavs": np.concatenate(wavs),
               "tokens": np.concatenate(toks),
               "specs": np.concatenate(specs)}
        if agg["drafted"]:
            agg["accept_rate"] = round(agg["accepted"] / agg["drafted"], 4)
            res["spec_stats"] = agg
        return res

    def warmup(self):
        """Compile the serving program before accepting traffic.  An
        AOT ArtifactPipeline bakes ONE sample mode (export.py), so it
        advertises ``sample_modes``; the live pipeline compiles both."""
        t0 = time.time()
        for mode in getattr(self.pipe, "sample_modes", (True, False)):
            self.generate([0], sample=mode)
        print(f"warmup: compiled in {time.time() - t0:.1f}s "
              f"(batch {self.batch})")


class _Handler(BaseHTTPRequestHandler):
    server_version = "melspec-gpt-vqvae-tpu"

    # -- helpers -------------------------------------------------------------
    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _json(self, code: int, obj):
        self._send(code, json.dumps(obj).encode(), "application/json")

    def log_message(self, fmt, *args):  # quiet by default
        if os.environ.get("SERVE_VERBOSE"):
            super().log_message(fmt, *args)

    # -- routes ----------------------------------------------------------------
    def do_GET(self):
        url = urlparse(self.path)
        if url.path == "/healthz":
            svc = self.server.service
            import jax
            return self._json(200, {
                "status": "ok",
                "platform": jax.devices()[0].platform,
                "model": {"n_layer": svc.exp.model.n_layer,
                          "n_embd": svc.exp.model.n_embd,
                          "class_size": svc.exp.model.class_size},
                "batch": svc.batch,
                "uptime_s": round(time.time() - svc.started, 1),
                "requests": svc.requests,
                "queue": {"pending": svc._pending,
                          "max": svc.max_queue, "shed": svc.shed}})
        if url.path == "/generate":
            params = {k: v[-1] for k, v in parse_qs(url.query).items()}
            if "classes" in params:
                params["classes"] = [int(c) for c in
                                     params["classes"].split(",")]
            return self._generate(params)
        return self._json(404, {"error": f"unknown path {url.path}"})

    def do_POST(self):
        url = urlparse(self.path)
        if url.path != "/generate":
            return self._json(404, {"error": f"unknown path {url.path}"})
        try:
            n = int(self.headers.get("Content-Length", 0))
            params = json.loads(self.rfile.read(n) or b"{}")
        except (ValueError, json.JSONDecodeError) as e:
            return self._json(400, {"error": f"bad JSON body: {e}"})
        return self._generate(params)

    def _generate(self, params):
        svc = self.server.service
        try:
            classes = params.get("classes", [int(params.get("class", 0))])
            if isinstance(classes, int):
                classes = [classes]
            num = int(params.get("num", 1))
            if num < 1 or num * len(classes) > 64 * svc.batch:
                raise ValueError("num out of range")
            classes = [c for c in classes for _ in range(num)]
            fmt = params.get("format",
                             "wav" if len(classes) == 1 else "json")
            if fmt == "wav" and len(classes) != 1:
                # reject before burning a chip decode on the batch
                raise ValueError("format=wav needs exactly 1 clip")
            det = params.get("deterministic", False)
            if isinstance(det, str):  # GET query form
                det = det.lower() in ("1", "true", "yes")
            t0 = time.time()
            out = svc.generate(
                classes,
                temperature=params.get("temperature"),
                top_k=params.get("top_k"),
                top_p=params.get("top_p"),
                sample=not det,
                seed=params.get("seed"))
        except ServiceOverloaded as e:
            # shed load instead of queueing without bound (one chip);
            # clients should back off and retry
            self.send_response(503)
            self.send_header("Retry-After", "2")
            body = json.dumps({"error": str(e)}).encode()
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            return
        except (ValueError, TypeError) as e:
            return self._json(400, {"error": str(e)})
        sr = svc.exp.data.sample_rate
        if fmt == "wav":
            return self._send(200, wav_bytes(out["wavs"][0], sr),
                              "audio/wav")
        clips = [{"class": int(c),
                  "wav_base64": base64.b64encode(
                      wav_bytes(out["wavs"][i], sr)).decode()}
                 for i, c in enumerate(classes)]
        body = {"clips": clips, "sample_rate": sr,
                "seconds": round(time.time() - t0, 3)}
        if out.get("spec_stats"):
            body["speculative"] = out["spec_stats"]
        return self._json(200, body)


def serve(service: GenerationService, host: str = "127.0.0.1",
          port: int = 8000) -> ThreadingHTTPServer:
    """Start the HTTP server (returns it; call ``serve_forever`` to block)."""
    httpd = ThreadingHTTPServer((host, port), _Handler)
    httpd.service = service
    return httpd
