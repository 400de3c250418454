"""Core GPT tests: masking semantics, conditioning, KV-cache parity, training.

Semantics pinned by /root/reference/transformer/minGPT.py: causal mask with
n_unmasked window (:64-69), class-token conditioning (:203-212), logits
offset for conditioned CE (:279-283), sampling loop behaviour (:293-360).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from melspec_gpt_vqvae_tpu.configs import GPTConfig
from melspec_gpt_vqvae_tpu.models import gpt as G

TINY = GPTConfig(vocab_size=17, block_size=24, n_layer=2, n_head=2, n_embd=32)


def _params(cfg=TINY, seed=0):
    return G.init_gpt_params(jax.random.PRNGKey(seed), cfg)


def test_shapes_and_param_count():
    p = _params()
    logits, att = G.gpt_apply(p, TINY, jnp.zeros((3, 10), jnp.int32))
    assert logits.shape == (3, 10, 17)
    assert att is None
    n = G.count_params(p)
    d = TINY.n_embd
    expected_block = (2 * d + (d * 3 * d + 3 * d) + (d * d + d) + 2 * d
                      + (d * 4 * d + 4 * d) + (4 * d * d + d))
    expected = (17 * d + 24 * d + TINY.n_layer * expected_block + 2 * d
                + d * 17)
    assert n == expected


def test_causality():
    p = _params()
    x = jnp.asarray(np.random.default_rng(0).integers(0, 17, (2, 12)))
    logits, _ = G.gpt_apply(p, TINY, x)
    x2 = x.at[:, 8].set((x[:, 8] + 1) % 17)
    logits2, _ = G.gpt_apply(p, TINY, x2)
    np.testing.assert_allclose(np.asarray(logits[:, :8]),
                               np.asarray(logits2[:, :8]), atol=1e-5)
    assert not np.allclose(np.asarray(logits[:, 8:]),
                           np.asarray(logits2[:, 8:]), atol=1e-5)


def test_unmasked_window_is_bidirectional():
    cfg = TINY.replace(n_unmasked=TINY.block_size)
    p = _params(cfg)
    x = jnp.asarray(np.random.default_rng(1).integers(0, 17, (2, 12)))
    logits, _ = G.gpt_apply(p, cfg, x)
    x2 = x.at[:, 11].set((x[:, 11] + 1) % 17)
    logits2, _ = G.gpt_apply(p, cfg, x2)
    # changing the LAST token changes the FIRST position's output
    assert not np.allclose(np.asarray(logits[:, 0]),
                           np.asarray(logits2[:, 0]), atol=1e-6)


def test_last_linear_override():
    cfg = TINY.replace(last_linear=64)
    p = _params(cfg)
    logits, _ = G.gpt_apply(p, cfg, jnp.zeros((1, 5), jnp.int32))
    assert logits.shape == (1, 5, 64)


def test_class_conditioning_prepends_token():
    cfg = TINY.replace(class_size=8, block_size=25)
    p = _params(cfg)
    c = jnp.asarray([[2], [5]])
    cond = G.class_embed(p, c)
    assert cond.shape == (2, 1, cfg.n_embd)
    x = jnp.zeros((2, 10), jnp.int32)
    logits, _ = G.gpt_apply(p, cfg, x, cond)
    assert logits.shape == (2, 11, 17)
    # different class -> different logits everywhere
    cond2 = G.class_embed(p, jnp.asarray([[3], [5]]))
    logits2, _ = G.gpt_apply(p, cfg, x, cond2)
    assert not np.allclose(np.asarray(logits[0]), np.asarray(logits2[0]))
    np.testing.assert_allclose(np.asarray(logits[1]), np.asarray(logits2[1]),
                               atol=1e-6)


def test_return_attn_matches_plain_forward():
    p = _params()
    x = jnp.asarray(np.random.default_rng(2).integers(0, 17, (2, 9)))
    l1, att = G.gpt_apply(p, TINY, x, return_attn=True, use_pallas=False)
    l2, _ = G.gpt_apply(p, TINY, x, use_pallas=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)
    assert att.shape == (2, TINY.n_head, 9, 9)
    # attention rows are normalised and causal
    a = np.asarray(att)
    np.testing.assert_allclose(a.sum(-1), np.ones_like(a.sum(-1)), atol=1e-5)
    assert np.triu(a[0, 0], k=1).sum() < 1e-6


def test_kv_cache_matches_full_forward():
    """Greedy cached generation == the reference's full-recompute loop."""
    cfg = TINY.replace(class_size=4, block_size=24)
    p = _params(cfg)
    cond = G.class_embed(p, jnp.asarray([[1], [3]]))
    steps = 10

    toks = G.gpt_generate(p, cfg, jax.random.PRNGKey(0), cond, None,
                          steps=steps, sample=False, use_pallas=False)
    assert toks.shape == (2, steps)

    # naive loop: full forward each step, argmax (minGPT.py:331-358)
    x = jnp.zeros((2, 0), jnp.int32)
    for _ in range(steps):
        logits, _ = G.gpt_apply(p, cfg, x if x.shape[1] else None, cond)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        x = jnp.concatenate([x, nxt[:, None].astype(jnp.int32)], axis=1)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(x))


def test_kv_cache_with_prefix():
    cfg = TINY.replace(class_size=4, block_size=24)
    p = _params(cfg)
    cond = G.class_embed(p, jnp.asarray([[0]]))
    given = jnp.asarray([[3, 1, 4, 1, 5]], jnp.int32)
    toks = G.gpt_generate(p, cfg, jax.random.PRNGKey(0), cond, given,
                          steps=6, sample=False, use_pallas=False)
    assert toks.shape == (1, 11)
    np.testing.assert_array_equal(np.asarray(toks[:, :5]), np.asarray(given))

    x = given
    for _ in range(6):
        logits, _ = G.gpt_apply(p, cfg, x, cond)
        nxt = jnp.argmax(logits[:, -1], axis=-1)
        x = jnp.concatenate([x, nxt[:, None].astype(jnp.int32)], axis=1)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(x))


def test_sampled_generation_reproducible_and_topk():
    cfg = TINY.replace(class_size=4)
    p = _params(cfg)
    cond = G.class_embed(p, jnp.asarray([[1]]))
    a = G.gpt_generate(p, cfg, jax.random.PRNGKey(7), cond, None, steps=8,
                       sample=True, top_k=5, temperature=0.9,
                       use_pallas=False)
    b = G.gpt_generate(p, cfg, jax.random.PRNGKey(7), cond, None, steps=8,
                       sample=True, top_k=5, temperature=0.9,
                       use_pallas=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = G.gpt_generate(p, cfg, jax.random.PRNGKey(8), cond, None, steps=8,
                       sample=True, top_k=5, use_pallas=False)
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_dropout_train_vs_eval():
    cfg = TINY.replace(embd_pdrop=0.5, resid_pdrop=0.5, attn_pdrop=0.5)
    p = _params(cfg)
    x = jnp.zeros((2, 6), jnp.int32)
    l_eval, _ = G.gpt_apply(p, cfg, x)
    l_eval2, _ = G.gpt_apply(p, cfg, x)
    np.testing.assert_allclose(np.asarray(l_eval), np.asarray(l_eval2))
    l_tr, _ = G.gpt_apply(p, cfg, x, train=True, rng=jax.random.PRNGKey(0),
                          use_pallas=False)
    l_tr2, _ = G.gpt_apply(p, cfg, x, train=True, rng=jax.random.PRNGKey(1),
                           use_pallas=False)
    assert not np.allclose(np.asarray(l_tr), np.asarray(l_tr2))


@pytest.mark.slow
def test_training_reduces_loss():
    cfg = TINY.replace(class_size=4, block_size=24)
    p = _params(cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 17, (8, 12)), jnp.int32)
    c = jnp.asarray(rng.integers(0, 4, (8, 1)), jnp.int32)

    def loss_fn(params):
        cond = G.class_embed(params, c)
        logits, _ = G.gpt_apply(params, cfg, x[:, :-1], cond,
                                use_pallas=False)
        # cut conditioning outputs (reference: minGPT.py:279-283)
        logits = logits[:, cond.shape[1] - 1:]
        return G.cross_entropy_loss(logits, x)

    opt = optax.adamw(3e-3)
    state = opt.init(p)
    l0 = float(loss_fn(p))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    for _ in range(30):
        p, state, l = step(p, state)
    assert float(l) < l0 * 0.7


def test_remat_matches_no_remat():
    cfg_r = TINY.replace(remat=True)
    p = _params()
    x = jnp.asarray(np.random.default_rng(9).integers(0, 17, (2, 10)))
    l1, _ = G.gpt_apply(p, TINY, x, use_pallas=False)
    l2, _ = G.gpt_apply(p, cfg_r, x, use_pallas=False)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-5)

    def loss(p, cfg):
        lg, _ = G.gpt_apply(p, cfg, x, train=True,
                            rng=jax.random.PRNGKey(0), use_pallas=False)
        return jnp.sum(lg ** 2)

    g1 = jax.grad(lambda p: loss(p, TINY))(p)
    g2 = jax.grad(lambda p: loss(p, cfg_r))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-4), g1, g2)


def test_int8_kv_cache_generation_close_to_fp():
    """int8 KV cache: generation runs, greedy tokens mostly agree with the
    fp cache, and the quantiser round-trips within absmax/127 error."""
    from melspec_gpt_vqvae_tpu.models.gpt import _quantize_kv

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4, 16)),
                    jnp.float32)
    q, s = _quantize_kv(x)
    back = np.asarray(q, np.float32) * np.asarray(s)[..., None]
    err = np.abs(back - np.asarray(x))
    bound = np.asarray(jnp.max(jnp.abs(x), -1) / 127.0)[..., None]
    assert (err <= bound * 0.51 + 1e-6).all()

    cfg = TINY.replace(class_size=4, cache_dtype="int8")
    cfg_fp = TINY.replace(class_size=4)
    p = _params(cfg)
    cond = G.class_embed(p, jnp.asarray([[1], [3]]))
    t_int8 = G.gpt_generate(p, cfg, jax.random.PRNGKey(0), cond, None,
                            steps=10, sample=False, use_pallas=False)
    t_fp = G.gpt_generate(p, cfg_fp, jax.random.PRNGKey(0), cond, None,
                          steps=10, sample=False, use_pallas=False)
    assert t_int8.shape == (2, 10)
    agree = float((np.asarray(t_int8) == np.asarray(t_fp)).mean())
    assert agree >= 0.8, agree


def test_int4_kv_cache_pack_roundtrip_and_generation():
    """int4 packed KV cache: nibble pack/unpack is exact on the quantised
    values, dequant error bounded by absmax/7, and greedy generation
    mostly agrees with the fp cache on a tiny model."""
    from melspec_gpt_vqvae_tpu.models.gpt import _quantize_kv4, _unpack4

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4, 16)),
                    jnp.float32)
    q, s = _quantize_kv4(x)
    assert q.dtype == jnp.uint8 and q.shape == (2, 3, 4, 8)
    vals = np.asarray(_unpack4(q))
    assert vals.min() >= -7 and vals.max() <= 7
    back = vals.astype(np.float32) * np.asarray(s)[..., None]
    bound = np.asarray(jnp.max(jnp.abs(x), -1) / 7.0)[..., None]
    assert (np.abs(back - np.asarray(x)) <= bound * 0.51 + 1e-6).all()

    cfg = TINY.replace(class_size=4, cache_dtype="int4")
    cfg_fp = TINY.replace(class_size=4)
    p = _params(cfg)
    cond = G.class_embed(p, jnp.asarray([[1], [3]]))
    t_int4 = G.gpt_generate(p, cfg, jax.random.PRNGKey(0), cond, None,
                            steps=10, sample=False, use_pallas=False)
    t_fp = G.gpt_generate(p, cfg_fp, jax.random.PRNGKey(0), cond, None,
                          steps=10, sample=False, use_pallas=False)
    assert t_int4.shape == (2, 10)
    agree = float((np.asarray(t_int4) == np.asarray(t_fp)).mean())
    assert agree >= 0.7, agree


def test_int8_weight_decode_close_to_fp():
    """int8 weight streaming in decode: quantised matmul is accurate and
    greedy generation mostly agrees with the fp-weight path."""
    from melspec_gpt_vqvae_tpu.models.gpt import (_int8_mm,
                                                  quantize_block_weights)

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((1, 32, 48)) * 0.05, jnp.float32)
    wq = quantize_block_weights({"attn_qkv": {"w": w}, "attn_proj": {"w": w},
                                 "mlp_up": {"w": w}, "mlp_down": {"w": w}})
    got = _int8_mm(x, wq["mlp_up"]["q"][0], wq["mlp_up"]["s"][0])
    ref = np.asarray(x) @ np.asarray(w[0])
    rel = np.abs(np.asarray(got) - ref).max() / np.abs(ref).max()
    assert rel < 0.03, rel

    cfg_q = TINY.replace(class_size=4, decode_weight_dtype="int8")
    cfg_fp = TINY.replace(class_size=4)
    p = _params(cfg_q)
    cond = G.class_embed(p, jnp.asarray([[1], [3]]))
    t_q = G.gpt_generate(p, cfg_q, jax.random.PRNGKey(0), cond, None,
                         steps=10, sample=False, use_pallas=False)
    t_fp = G.gpt_generate(p, cfg_fp, jax.random.PRNGKey(0), cond, None,
                          steps=10, sample=False, use_pallas=False)
    assert t_q.shape == (2, 10)
    agree = float((np.asarray(t_q) == np.asarray(t_fp)).mean())
    assert agree >= 0.8, agree


def test_segmented_generation_matches_single_segment():
    """Chunked-cache decode is numerically identical to the one-shot path."""
    cfg = TINY.replace(class_size=4)
    p = _params(cfg)
    cond = G.class_embed(p, jnp.asarray([[1], [2]]))
    one = G.gpt_generate(p, cfg, jax.random.PRNGKey(3), cond, None,
                         steps=12, sample=True, top_k=7,
                         use_pallas=False, segments=1)
    four = G.gpt_generate(p, cfg, jax.random.PRNGKey(3), cond, None,
                          steps=12, sample=True, top_k=7,
                          use_pallas=False, segments=4)
    np.testing.assert_array_equal(np.asarray(one), np.asarray(four))
    # with a prefix too
    given = jnp.asarray([[3, 1, 4], [1, 5, 9]], jnp.int32)
    a = G.gpt_generate(p, cfg, jax.random.PRNGKey(4), cond, given,
                       steps=8, sample=False, use_pallas=False, segments=1)
    c = G.gpt_generate(p, cfg, jax.random.PRNGKey(4), cond, given,
                       steps=8, sample=False, use_pallas=False, segments=3)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_mixed_precision_close_to_f32():
    cfg_mp = TINY.replace(mixed_precision=True)
    p = _params()
    x = jnp.asarray(np.random.default_rng(13).integers(0, 17, (2, 10)))
    l32, _ = G.gpt_apply(p, TINY, x, use_pallas=False)
    lmp, _ = G.gpt_apply(p, cfg_mp, x, use_pallas=False)
    # bf16 matmuls with f32 accumulation: small but nonzero deviation
    np.testing.assert_allclose(np.asarray(lmp), np.asarray(l32),
                               atol=0.05, rtol=0.05)
    # grads flow and are finite
    g = jax.grad(lambda q: float(0) + jnp.sum(
        G.gpt_apply(q, cfg_mp, x, use_pallas=False)[0] ** 2))(p)
    gn = sum(float(jnp.abs(v).sum()) for v in jax.tree_util.tree_leaves(g))
    assert np.isfinite(gn) and gn > 0


def test_decode_attention_kernel_matches_xla():
    """Experimental fused decode-attention kernel (interpret mode) == its
    XLA reference over a depth-major int8 cache (ops/decode_attention.py).
    The kernel measured SLOWER than the production t-major XLA decode path
    and is not wired into gpt_decode_step — see the negative result in
    BENCH_NOTES.md; this test keeps the op correct as documented."""
    from melspec_gpt_vqvae_tpu.ops.decode_attention import (
        decode_attend_int8, decode_attend_int8_xla)

    rng = np.random.default_rng(5)
    L, B, H, hd, T = 3, 4, 2, 8, 13
    q = jnp.asarray(rng.standard_normal((B, H, hd)), jnp.float32)
    k = jnp.asarray(rng.integers(-127, 128, (L, H, B, hd, T)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (L, H, B, hd, T)), jnp.int8)
    ks = jnp.asarray(0.01 + rng.random((L, H, B, T)), jnp.float32)
    vs = jnp.asarray(0.01 + rng.random((L, H, B, T)), jnp.float32)
    for layer in (0, 2):
        for pos in (0, 5, T - 1):
            got = decode_attend_int8(q, k, v, ks, vs,
                                     jnp.asarray(layer), jnp.asarray(pos),
                                     interpret=True)
            ref = decode_attend_int8_xla(q, k, v, ks, vs,
                                         jnp.asarray(layer),
                                         jnp.asarray(pos))
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=1e-4, rtol=1e-4)
