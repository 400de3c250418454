"""HTTP serving layer: GenerationService batching/padding semantics and
the http.server endpoint end-to-end on a tiny random-init pipeline.

Beyond the reference (no serving exists there; generation lives inside
training callbacks, /root/reference/transformer/minGPT.py:530-612).
"""

import base64
import dataclasses
import io
import json
import threading
import urllib.request
import wave

import jax
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import (ExperimentConfig, GPTConfig,
                                           VocoderConfig, VQVAEConfig)
from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator
from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
from melspec_gpt_vqvae_tpu.pipeline import GenerationPipeline
from melspec_gpt_vqvae_tpu.serving import (GenerationService, serve,
                                           wav_bytes)


def _tiny_service(batch=4):
    import jax.numpy as jnp
    vq = VQVAEConfig(num_embeddings=16, embedding_dim=8, ch=8,
                     ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(), z_channels=8, resolution=8,
                     code_h=2, code_w=4)
    gpt = GPTConfig(vocab_size=16, block_size=9, n_layer=2, n_head=2,
                    n_embd=16, class_size=4)
    voc = VocoderConfig(n_mel_channels=4, ngf=4, n_residual_layers=1,
                        ratios=(2, 2))
    exp = dataclasses.replace(ExperimentConfig(model=gpt), vqvae=vq,
                              vocoder=voc)
    gpt_params = init_gpt_params(jax.random.PRNGKey(0), exp.model)
    vq_params = VQModel(exp.vqvae).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 1)))["params"]
    voc_params = MelGANGenerator(exp.vocoder).init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8, 4)))["params"]
    pipe = GenerationPipeline(exp, gpt_params, vq_params, voc_params,
                              segments=2, chunk=0, bf16=False)
    return GenerationService(exp, pipe, batch=batch, seed=7)


def test_service_pads_and_chunks_to_fixed_batch():
    svc = _tiny_service(batch=4)
    # shorter, equal, and longer than the serving batch all work
    for n in (1, 4, 6):
        out = svc.generate(list(np.arange(n) % 4), seed=3)
        assert out["wavs"].shape == (n, 32)
        assert out["tokens"].shape == (n, 8)
    # explicit seed makes results reproducible across calls
    a = svc.generate([1, 2], seed=11)
    b = svc.generate([1, 2], seed=11)
    np.testing.assert_array_equal(a["tokens"], b["tokens"])
    # no seed: server key advances -> typically different draws
    c = svc.generate([1, 2])
    d = svc.generate([1, 2])
    assert (c["tokens"] != d["tokens"]).any()


def test_service_validates_classes():
    svc = _tiny_service(batch=2)
    with pytest.raises(ValueError):
        svc.generate([])
    with pytest.raises(ValueError):
        svc.generate([99])
    with pytest.raises(ValueError):
        svc.generate([-1])


def test_wav_bytes_parses():
    wav = np.sin(np.linspace(0, 20 * np.pi, 441)).astype(np.float32)
    blob = wav_bytes(wav, 22050)
    with wave.open(io.BytesIO(blob), "rb") as w:
        assert w.getframerate() == 22050 and w.getnframes() == 441


@pytest.fixture(scope="module")
def http_server():
    svc = _tiny_service(batch=2)
    httpd = serve(svc, "127.0.0.1", 0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def test_http_healthz(http_server):
    with urllib.request.urlopen(http_server + "/healthz") as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["model"]["class_size"] == 4
    assert body["batch"] == 2


def test_http_get_generate_wav(http_server):
    url = http_server + "/generate?class=3&seed=5&top_p=0.9"
    with urllib.request.urlopen(url) as r:
        assert r.headers["Content-Type"] == "audio/wav"
        blob = r.read()
    with wave.open(io.BytesIO(blob), "rb") as w:
        assert w.getnframes() == 32  # tiny vocoder: 8 frames x4 upsample
    # same seed -> byte-identical clip
    with urllib.request.urlopen(url) as r:
        assert r.read() == blob


def test_http_post_generate_json(http_server):
    req = urllib.request.Request(
        http_server + "/generate",
        data=json.dumps({"classes": [0, 1], "num": 2, "seed": 9,
                         "top_k": 5, "format": "json"}).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert [c["class"] for c in body["clips"]] == [0, 0, 1, 1]
    blob = base64.b64decode(body["clips"][0]["wav_base64"])
    with wave.open(io.BytesIO(blob), "rb") as w:
        assert w.getnframes() == 32


def test_http_errors(http_server):
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(http_server + "/nope")
    assert e.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(http_server + "/generate?class=99")
    assert e.value.code == 400
    # format=wav with >1 clip is a client error
    req = urllib.request.Request(
        http_server + "/generate",
        data=json.dumps({"classes": [0, 1], "format": "wav"}).encode(),
        headers={"Content-Type": "application/json"})
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400


def test_service_top_k_zero_disables_and_temperature_validated():
    svc = _tiny_service(batch=2)
    # top_k=0 means "no top-k filter", not a zero-size lax.top_k crash
    out = svc.generate([1], top_k=0, seed=3)
    assert out["tokens"].shape == (1, 8)
    svc0 = GenerationService(svc.exp, svc.pipe, batch=2, top_k=0)
    assert svc0.defaults["top_k"] is None
    with pytest.raises(ValueError, match="temperature"):
        svc.generate([1], temperature=0.0)
    with pytest.raises(ValueError, match="temperature"):
        svc.generate([1], temperature=-1)


def test_http_speculative_stats_surface():
    """A draft-enabled service reports acceptance through the JSON API."""
    import jax.numpy as jnp
    from melspec_gpt_vqvae_tpu.configs import GPTConfig
    from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params
    from melspec_gpt_vqvae_tpu.pipeline import GenerationPipeline
    svc = _tiny_service(batch=2)
    pipe = svc.pipe
    dcfg = GPTConfig(vocab_size=pipe.gcfg.vocab_size,
                     block_size=pipe.gcfg.block_size, n_layer=1,
                     n_head=2, n_embd=pipe.gcfg.n_embd,
                     class_size=pipe.gcfg.class_size)
    spipe = GenerationPipeline(pipe.exp, pipe.gpt_params, pipe.vq_params,
                               pipe.voc_params, segments=2, chunk=0,
                               bf16=False, gamma=2,
                               draft_params=init_gpt_params(
                                   jax.random.PRNGKey(3), dcfg),
                               draft_cfg=dcfg)
    ssvc = GenerationService(spipe.exp, spipe, batch=2, seed=7)
    httpd = serve(ssvc, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{httpd.server_address[1]}/generate",
            data=json.dumps({"classes": [0, 1], "seed": 3,
                             "format": "json"}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as r:
            body = json.loads(r.read())
        sp = body["speculative"]
        assert sp["rounds"] >= 1
        assert 0.0 <= sp["accept_rate"] <= 1.0
    finally:
        httpd.shutdown()


def test_bounded_queue_sheds_load():
    """Admission control: past max_queue in-flight generates, requests are
    rejected with ServiceOverloaded (HTTP 503 + Retry-After) instead of
    queueing without bound behind the one-chip generation lock."""
    import time as _time

    from melspec_gpt_vqvae_tpu.serving import ServiceOverloaded
    svc = _tiny_service(batch=2)
    svc.max_queue = 2
    svc.generate([1], seed=1)   # compile before the race

    release = threading.Event()
    real = svc.pipe.generate

    def slow(*a, **kw):
        release.wait(10.0)
        return real(*a, **kw)

    svc.pipe.generate = slow
    results = []

    def client(i):
        try:
            svc.generate([i % 4], seed=i)
            results.append("ok")
        except ServiceOverloaded:
            results.append("shed")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(5)]
    for t in threads:
        t.start()
    # wait until the admission counter has seen all 5 (accepted ones hold
    # a pending slot until release)
    for _ in range(100):
        if len(results) >= 3:   # the 3 rejects return immediately
            break
        _time.sleep(0.05)
    release.set()
    for t in threads:
        t.join()
    svc.pipe.generate = real
    assert sorted(results) == ["ok", "ok", "shed", "shed", "shed"]
    assert svc.shed == 3
    assert svc._pending == 0   # slots drained

    # HTTP mapping: a saturated server answers 503 with Retry-After
    svc2 = _tiny_service(batch=2)
    svc2.max_queue = 1
    svc2.generate([0], seed=1)
    svc2.pipe.generate = lambda *a, **kw: (_ for _ in ()).throw(
        AssertionError("should never run"))
    with svc2._pending_lock:
        svc2._pending = 1      # simulate a full queue
    httpd = serve(svc2, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/generate?class=0")
            assert False, "expected 503"
        except urllib.error.HTTPError as e:
            assert e.code == 503
            assert e.headers["Retry-After"]
            assert "queue full" in json.loads(e.read())["error"]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz") as r:
            q = json.loads(r.read())["queue"]
        assert q["max"] == 1 and q["shed"] == 1
    finally:
        httpd.shutdown()


def test_aot_export_roundtrip(tmp_path):
    """jax.export artifact: serialize -> fresh deserialize -> call gives
    the SAME tokens/specs/wavs as the live pipeline with the same seed
    (export.py: weights stay arguments, knobs baked, seed-keyed PRNG)."""
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu import export as aot

    pipe = _tiny_service(batch=2).pipe
    ex = aot.export_serving(pipe, 2, temperature=0.9, top_k=8)
    path = str(tmp_path / "pipe.stablehlo")
    nbytes = aot.save_exported(ex, path)
    assert nbytes > 0
    loaded = aot.load_exported(path)

    cls = jnp.asarray([1, 3], jnp.int32)
    toks, specs, wavs = loaded.call(
        pipe.gpt_params, pipe.vq_params, pipe.voc_params, cls,
        jnp.asarray(7, jnp.uint32))
    live = pipe.generate(np.asarray([1, 3]), jax.random.PRNGKey(7),
                         temperature=0.9, top_k=8)
    np.testing.assert_array_equal(np.asarray(toks), live["tokens"])
    np.testing.assert_allclose(np.asarray(specs, np.float32),
                               live["specs"], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(wavs, np.float32),
                               live["wavs"], rtol=1e-5, atol=1e-5)
    assert wavs.shape == live["wavs"].shape


def test_artifact_dtype_cast_and_uint32_seed(tmp_path):
    """Cross-dtype-policy artifact serving: the sidecar records the
    per-leaf weight dtypes the artifact was traced with, and
    ArtifactPipeline.from_file casts a live pipeline's trees to them — so
    an artifact exported under one dtype policy (CPU f32,
    serving.py build_pipeline) serves from a pipeline built under another
    (TPU bf16).  Also: explicit seeds are masked to uint32 in
    GenerationService so live and artifact serving agree for any seed."""
    from melspec_gpt_vqvae_tpu import export as aot

    pipe = _tiny_service(batch=2).pipe  # f32 trees
    ex = aot.export_serving(pipe, 2, temperature=0.9, top_k=8)
    path = str(tmp_path / "p.stablehlo")
    aot.save_exported(ex, path, {"batch": 2, "temperature": 0.9,
                                 "top_k": 8, "top_p": None, "sample": True,
                                 "weight_dtypes": aot.tree_dtypes(pipe)})
    # a "TPU-policy" pipeline over the same weights: conv trees in bf16
    bpipe = GenerationPipeline(pipe.exp, pipe.gpt_params, pipe.vq_params,
                               pipe.voc_params, segments=2, chunk=0,
                               bf16=True)
    import jax.numpy as jnp
    assert all(a.dtype == jnp.bfloat16
               for a in jax.tree_util.tree_leaves(bpipe.vq_params))
    apipe = aot.ArtifactPipeline.from_file(path, bpipe)
    # trees were cast back to the exported f32 avals -> the call works
    assert all(a.dtype == jnp.float32
               for a in jax.tree_util.tree_leaves(apipe.vq_params))
    svc = GenerationService(pipe.exp, apipe, batch=2, seed=7,
                            temperature=0.9, top_k=8, top_p=None)
    live = pipe.generate(np.asarray([1, 2]), jax.random.PRNGKey(11),
                         temperature=0.9, top_k=8)
    a = svc.generate([1, 2], seed=11)
    np.testing.assert_array_equal(a["tokens"], live["tokens"])
    # seeds >= 2**32 are masked, identically for live and artifact paths
    b = svc.generate([1, 2], seed=(1 << 32) + 11)
    np.testing.assert_array_equal(b["tokens"], live["tokens"])
    lsvc = GenerationService(pipe.exp, pipe, batch=2, seed=7,
                             temperature=0.9, top_k=8, top_p=None)
    c = lsvc.generate([1, 2], seed=(1 << 32) + 11)
    np.testing.assert_array_equal(c["tokens"], live["tokens"])
    # leaf-count mismatch (wrong geometry) is rejected loudly
    bad = dict(apipe.meta)
    with pytest.raises(ValueError, match="leaves"):
        aot._cast_tree({"a": np.zeros(1), "b": np.zeros(1)},
                       ["float32"], "gpt")
    del bad


def test_aot_export_rejects_mosaic_custom_calls(monkeypatch):
    """The structural portability invariant: if a Pallas kernel ever
    leaks into the export trace (jax.export serializes tpu_custom_call
    WITHOUT error, silently pinning the artifact to one backend),
    export_serving must refuse the artifact (export.py::export_serving)."""
    from melspec_gpt_vqvae_tpu import export as aot

    pipe = _tiny_service(batch=2).pipe

    class _FakeExported:
        def mlir_module(self):
            return ("module @jit_fn { stablehlo.custom_call "
                    "@tpu_custom_call ... }")

    monkeypatch.setattr(aot.jax_export, "export",
                        lambda fn, **kw: lambda *a: _FakeExported())
    with pytest.raises(RuntimeError, match="tpu_custom_call"):
        aot.export_serving(pipe, 2)


def test_aot_export_rejects_unexportable_pipelines():
    from melspec_gpt_vqvae_tpu import export as aot
    from melspec_gpt_vqvae_tpu.configs import GPTConfig
    from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params
    from melspec_gpt_vqvae_tpu.pipeline import GenerationPipeline

    pipe = _tiny_service(batch=2).pipe
    dcfg = GPTConfig(vocab_size=pipe.gcfg.vocab_size,
                     block_size=pipe.gcfg.block_size, n_layer=1,
                     n_head=2, n_embd=pipe.gcfg.n_embd,
                     class_size=pipe.gcfg.class_size)
    spipe = GenerationPipeline(pipe.exp, pipe.gpt_params, pipe.vq_params,
                               pipe.voc_params, segments=2, chunk=0,
                               bf16=False, gamma=2,
                               draft_params=init_gpt_params(
                                   jax.random.PRNGKey(3), dcfg),
                               draft_cfg=dcfg)
    with pytest.raises(ValueError, match="speculative"):
        aot.export_serving(spipe, 2)


def test_artifact_http_serving(tmp_path):
    """serve.py --artifact path: the GenerationService runs on an
    ArtifactPipeline — explicit-seed requests match the live pipeline
    bitwise, warmup compiles only the baked mode, and requests whose
    knobs differ from the sidecar get a clean 400."""
    from melspec_gpt_vqvae_tpu import export as aot

    pipe = _tiny_service(batch=2).pipe
    ex = aot.export_serving(pipe, 2, temperature=0.9, top_k=8)
    path = str(tmp_path / "p.stablehlo")
    aot.save_exported(ex, path, {"batch": 2, "temperature": 0.9,
                                 "top_k": 8, "top_p": None, "sample": True})
    apipe = aot.ArtifactPipeline.from_file(path, pipe)
    assert apipe.sample_modes == (True,)
    svc = GenerationService(pipe.exp, apipe, batch=apipe.batch, seed=7,
                            temperature=0.9, top_k=8, top_p=None)
    svc.warmup()

    a = svc.generate([1, 2], seed=11)
    b = svc.generate([1, 2], seed=11)
    np.testing.assert_array_equal(a["tokens"], b["tokens"])
    # PRNGKey(s) key-data ends in s -> the artifact rebuilds the same key
    live = pipe.generate(np.asarray([1, 2]), jax.random.PRNGKey(11),
                         temperature=0.9, top_k=8)
    np.testing.assert_array_equal(a["tokens"], live["tokens"])
    with pytest.raises(ValueError, match="baked"):
        svc.generate([1], temperature=0.5)

    httpd = serve(svc, "127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        port = httpd.server_address[1]
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/generate?class=1&seed=3") as r:
            assert r.headers["Content-Type"] == "audio/wav"
            wave.open(io.BytesIO(r.read()))  # parses as WAV
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"classes": [0], "temperature": 0.5}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "baked" in json.loads(e.read())["error"]
    finally:
        httpd.shutdown()
