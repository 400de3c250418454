"""Speculative decoding: exactness and distribution-preservation pins.

The three load-bearing equivalences (models/speculative.py docstring):
chunk-verify == single steps; draft==target => bit-identical to
gpt_generate; greedy mode => bit-identical to greedy gpt_generate for ANY
draft.  Plus a statistical check that the accept/reject + residual math
preserves the target distribution when draft != target.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import GPTConfig
from melspec_gpt_vqvae_tpu.models import gpt as G
from melspec_gpt_vqvae_tpu.models.speculative import (
    gpt_decode_chunk, gpt_speculative_generate)

CFG = GPTConfig(vocab_size=16, block_size=24, n_layer=2, n_head=2,
                n_embd=16, class_size=4)
DRAFT = GPTConfig(vocab_size=16, block_size=24, n_layer=1, n_head=2,
                  n_embd=16, class_size=4)


def _setup(cfg=CFG, seed=0):
    params = G.init_gpt_params(jax.random.PRNGKey(seed), cfg)
    cond = G.class_embed(params, jnp.asarray([0, 1, 2], jnp.int32))
    return params, cond


@pytest.mark.parametrize("cache_dtype", ["auto", "int8"])
def test_decode_chunk_matches_single_steps(cache_dtype):
    cfg = CFG.replace(cache_dtype=cache_dtype)
    params, cond = _setup(cfg)
    cache = G.init_kv_cache(cfg, 3, max_len=12)
    logits0, cache = G.gpt_prefill(params, cfg, cache, None, cond)
    toks = jnp.asarray(np.random.default_rng(0).integers(0, 16, (3, 5)),
                       jnp.int32)

    cache_c = jax.tree_util.tree_map(lambda a: a, cache)
    logits_c, cache_c = gpt_decode_chunk(params, cfg, cache_c, toks)

    cache_s = jax.tree_util.tree_map(lambda a: a, cache)
    step_logits = []
    for i in range(5):
        l, cache_s = G.gpt_decode_step(params, cfg, cache_s, toks[:, i])
        step_logits.append(l)
    np.testing.assert_allclose(np.asarray(logits_c),
                               np.stack([np.asarray(s)
                                         for s in step_logits], 1),
                               atol=2e-4)
    assert int(cache_c["len"]) == int(cache_s["len"])
    # identical K/V written (compare the valid region)
    np.testing.assert_allclose(np.asarray(cache_c["k"][:, :, :, :10]),
                               np.asarray(cache_s["k"][:, :, :, :10]),
                               atol=2e-4)


def test_draft_equals_target_is_bit_identical_to_gpt_generate():
    params, cond = _setup()
    for steps, gamma, kw in ((10, 4, dict(top_k=5)),
                             (10, 3, dict(temperature=0.8, top_p=0.9)),
                             (7, 7, {})):
        ref = G.gpt_generate(params, CFG, jax.random.PRNGKey(3), cond,
                             steps=steps, sample=True, **kw)
        out, stats = gpt_speculative_generate(
            params, CFG, params, CFG, jax.random.PRNGKey(3), cond, cond,
            steps=steps, gamma=gamma, sample=True, **kw)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out),
                                      err_msg=f"steps={steps} g={gamma}")
        # p == q: every draft token accepted, rounds = ceil((steps-1)/(g+1))
        assert int(stats["accepted"]) == int(stats["drafted"]) \
            or int(stats["rounds"]) * (gamma + 1) >= steps - 1


def test_greedy_speculative_exact_for_any_draft():
    params, cond = _setup()
    draft_params, _ = _setup(DRAFT, seed=9)
    ref = G.gpt_generate(params, CFG, jax.random.PRNGKey(5), cond,
                         steps=12, sample=False)
    out, stats = gpt_speculative_generate(
        params, CFG, draft_params, DRAFT, jax.random.PRNGKey(5), cond,
        G.class_embed(draft_params, jnp.asarray([0, 1, 2], jnp.int32)),
        steps=12, gamma=4, sample=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert 0 <= int(stats["accepted"]) <= int(stats["drafted"])


def test_speculative_with_given_prefix_and_int8():
    cfg = CFG.replace(cache_dtype="int8", decode_weight_dtype="int8")
    params, cond = _setup(cfg)
    given = jnp.asarray([[1, 2], [3, 4], [5, 6]], jnp.int32)
    ref = G.gpt_generate(params, cfg, jax.random.PRNGKey(7), cond, given,
                         steps=8, sample=False)
    out, _ = gpt_speculative_generate(
        params, cfg, params, cfg, jax.random.PRNGKey(7), cond, cond,
        given, steps=8, gamma=3, sample=False)
    assert out.shape == (3, 10)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_speculative_preserves_target_distribution():
    """draft != target, stochastic: the empirical distribution of the
    token produced by one accept/reject round (position 2) must match
    direct target sampling — this exercises the residual-resampling math
    that the exactness tests above cannot (they never reject)."""
    vocab = 8
    cfg = GPTConfig(vocab_size=vocab, block_size=8, n_layer=1, n_head=1,
                    n_embd=8, class_size=1)
    lanes = 4096
    params, _ = _setup(cfg, seed=1)
    draft_params, _ = _setup(cfg, seed=2)   # different weights => p != q
    cond = G.class_embed(params, jnp.zeros((lanes,), jnp.int32))
    d_cond = G.class_embed(draft_params, jnp.zeros((lanes,), jnp.int32))

    out, stats = gpt_speculative_generate(
        params, cfg, draft_params, cfg, jax.random.PRNGKey(11), cond,
        d_cond, steps=3, gamma=2, temperature=1.2, top_k=6)
    ref = G.gpt_generate(params, cfg, jax.random.PRNGKey(12), cond,
                         steps=3, temperature=1.2, top_k=6)
    # rejections must actually occur for this test to mean anything
    assert int(stats["accepted"]) < int(stats["drafted"])

    o = np.asarray(out)
    r = np.asarray(ref)
    # compare joint histograms of (token1, token2) across lanes; with
    # n=4096 per cell ~ n*p, tolerate ~5 sigma of binomial noise
    for pos in (0, 1, 2):
        ho = np.bincount(o[:, pos], minlength=vocab) / lanes
        hr = np.bincount(r[:, pos], minlength=vocab) / lanes
        sigma = np.sqrt(np.maximum(hr * (1 - hr), 1e-4) / lanes)
        assert (np.abs(ho - hr) < 5 * sigma + 0.01).all(), \
            f"pos {pos}: {ho} vs {hr}"


@pytest.mark.parametrize("cache_dtype", ["auto", "int8"])
def test_speculative_tp_sharded_matches_single_device(cache_dtype):
    """Speculative decoding composes with the Megatron-TP serving mesh:
    target AND draft params sharded over the model axis (GSPMD propagates
    the head sharding into both KV caches), greedy tokens bit-equal to
    the unsharded run — closing the round-3 scope gap where
    GenerationPipeline refused draft+mesh.  (Segments remain deliberately
    out of the speculative path: segmentation bounds KV working set in the
    B>=128 throughput regime, while speculative decoding is the B<=32
    latency feature whose whole cache is a few MB/clip — see
    BENCH_NOTES.md 'speculative x mesh/segments'.)"""
    from melspec_gpt_vqvae_tpu.parallel.mesh import (batch_sharding,
                                                     make_mesh,
                                                     shard_gpt_params)
    cfg = CFG.replace(n_head=4, n_embd=32, cache_dtype=cache_dtype,
                      decode_weight_dtype="int8" if cache_dtype == "int8"
                      else "auto")
    dcfg = DRAFT.replace(n_head=4, n_embd=32, cache_dtype=cfg.cache_dtype,
                         decode_weight_dtype=cfg.decode_weight_dtype)
    params = G.init_gpt_params(jax.random.PRNGKey(0), cfg)
    d_params = G.init_gpt_params(jax.random.PRNGKey(7), dcfg)
    c = jnp.asarray([0, 1, 2, 3, 0, 1, 2, 3], jnp.int32)
    cond = G.class_embed(params, c)
    d_cond = G.class_embed(d_params, c)

    ref, ref_stats = gpt_speculative_generate(
        params, cfg, d_params, dcfg, jax.random.PRNGKey(3), cond, d_cond,
        steps=8, gamma=3, sample=False)

    mesh = make_mesh({"data": 2, "model": 4})
    sp = shard_gpt_params(mesh, params)
    sd = shard_gpt_params(mesh, d_params)
    cond_s = jax.device_put(cond, batch_sharding(mesh, 3))
    d_cond_s = jax.device_put(d_cond, batch_sharding(mesh, 3))
    out, stats = gpt_speculative_generate(
        sp, cfg, sd, dcfg, jax.random.PRNGKey(3), cond_s, d_cond_s,
        steps=8, gamma=3, sample=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
    assert int(stats["rounds"]) == int(ref_stats["rounds"])
    assert int(stats["accepted"]) == int(ref_stats["accepted"])


def test_pipeline_speculative_mesh_wiring():
    """GenerationPipeline accepts draft + mesh together now; greedy clips
    match the meshless speculative pipeline."""
    from melspec_gpt_vqvae_tpu.parallel.mesh import make_mesh
    from melspec_gpt_vqvae_tpu.pipeline import GenerationPipeline
    from tests.test_serving import _tiny_service
    svc = _tiny_service(batch=4)
    pipe = svc.pipe
    dcfg = DRAFT.replace(vocab_size=pipe.gcfg.vocab_size,
                         block_size=pipe.gcfg.block_size,
                         n_embd=pipe.gcfg.n_embd,
                         class_size=pipe.gcfg.class_size)
    draft_params = G.init_gpt_params(jax.random.PRNGKey(42), dcfg)
    kw = dict(segments=2, chunk=0, bf16=False,
              draft_params=draft_params, draft_cfg=dcfg, gamma=3)
    ref_pipe = GenerationPipeline(pipe.exp, pipe.gpt_params, pipe.vq_params,
                                  pipe.voc_params, **kw)
    mesh_pipe = GenerationPipeline(pipe.exp, pipe.gpt_params,
                                   pipe.vq_params, pipe.voc_params,
                                   mesh=make_mesh({"data": 2, "model": 2}),
                                   **kw)
    cls = np.asarray([0, 1, 2, 3], np.int32)
    ref = ref_pipe.generate(cls, jax.random.PRNGKey(5), sample=False)
    out = mesh_pipe.generate(cls, jax.random.PRNGKey(5), sample=False)
    np.testing.assert_array_equal(ref["tokens"], out["tokens"])
    assert out["spec_stats"]["rounds"] >= 1


def test_pipeline_speculative_greedy_matches_plain():
    """GenerationPipeline(draft=...) with greedy decode must produce the
    exact clips of the plain pipeline (serving-layer wiring check)."""
    from tests.test_serving import _tiny_service
    svc = _tiny_service(batch=4)
    pipe = svc.pipe
    from melspec_gpt_vqvae_tpu.pipeline import GenerationPipeline
    draft_params = G.init_gpt_params(jax.random.PRNGKey(42), DRAFT.replace(
        vocab_size=pipe.gcfg.vocab_size, block_size=pipe.gcfg.block_size,
        n_embd=pipe.gcfg.n_embd, class_size=pipe.gcfg.class_size))
    dcfg = DRAFT.replace(vocab_size=pipe.gcfg.vocab_size,
                         block_size=pipe.gcfg.block_size,
                         n_embd=pipe.gcfg.n_embd,
                         class_size=pipe.gcfg.class_size)
    spipe = GenerationPipeline(pipe.exp, pipe.gpt_params, pipe.vq_params,
                               pipe.voc_params, segments=2, chunk=0,
                               bf16=False, draft_params=draft_params,
                               draft_cfg=dcfg, gamma=3)
    cls = np.asarray([0, 1, 2, 3], np.int32)
    ref = pipe.generate(cls, jax.random.PRNGKey(5), sample=False)
    out = spipe.generate(cls, jax.random.PRNGKey(5), sample=False)
    np.testing.assert_array_equal(ref["tokens"], out["tokens"])
    np.testing.assert_allclose(ref["wavs"], out["wavs"], atol=1e-5)
    st = out["spec_stats"]
    assert st["rounds"] >= 1 and 0 <= st["accepted"] <= st["drafted"]
    assert "spec_stats" not in ref
