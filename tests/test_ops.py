"""Tests for ops: VQ nearest-neighbour, attention kernels, sampling."""

import jax
import jax.numpy as jnp
import numpy as np

from melspec_gpt_vqvae_tpu.ops import attention as A
from melspec_gpt_vqvae_tpu.ops import sampling as S
from melspec_gpt_vqvae_tpu.ops import vq as V


# ---------------------------- VQ -------------------------------------------

def _brute_force_nn(x, cb):
    d = ((x[:, None, :] - cb[None, :, :]) ** 2).sum(-1)
    return d.argmin(1)


def test_vq_xla_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((265, 256)).astype(np.float32)
    cb = rng.standard_normal((128, 256)).astype(np.float32)
    got = np.asarray(V.vq_nearest_index_xla(jnp.asarray(x), jnp.asarray(cb)))
    np.testing.assert_array_equal(got, _brute_force_nn(x, cb))


def test_vq_pallas_matches_xla():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((300, 256)).astype(np.float32)  # non-multiple N
    cb = rng.standard_normal((128, 256)).astype(np.float32)
    a = np.asarray(V.vq_nearest_index_pallas(jnp.asarray(x), jnp.asarray(cb)))
    b = np.asarray(V.vq_nearest_index_xla(jnp.asarray(x), jnp.asarray(cb)))
    np.testing.assert_array_equal(a, b)


def test_vq_lookup():
    cb = jnp.asarray(np.arange(12, dtype=np.float32).reshape(4, 3))
    idx = jnp.asarray([[0, 3], [2, 1]])
    out = np.asarray(V.vq_lookup(idx, cb))
    assert out.shape == (2, 2, 3)
    np.testing.assert_allclose(out[0, 1], [9, 10, 11])


# ---------------------------- attention ------------------------------------

def test_pallas_attention_matches_xla_causal():
    rng = np.random.default_rng(2)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 4, 37, 16)),
                           jnp.float32) for _ in range(3))
    a = np.asarray(A.attend_pallas(q, k, v, n_unmasked=0))
    b = np.asarray(A.attend_xla(q, k, v, n_unmasked=0))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_pallas_attention_matches_xla_unmasked_window():
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 29, 16)),
                           jnp.float32) for _ in range(3))
    a = np.asarray(A.attend_pallas(q, k, v, n_unmasked=29))
    b = np.asarray(A.attend_xla(q, k, v, n_unmasked=29))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_window_mask_semantics():
    m = A.window_mask(5, 3)
    # causal beyond the window
    assert not m[3, 4]
    # bidirectional inside the window (reference: minGPT.py:67-68)
    assert m[0, 2] and m[1, 2]
    assert not m[2, 3]


# ---------------------------- sampling -------------------------------------

def test_top_k_logits():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 2.0]])
    out = np.asarray(S.top_k_logits(logits, 2))
    assert np.isneginf(out[0, 0]) and np.isneginf(out[0, 3])
    assert out[0, 1] == 5.0 and out[0, 2] == 3.0


def test_sample_logits_greedy_and_random():
    logits = jnp.asarray([[0.0, 10.0, 0.0]])
    tok = S.sample_logits(jax.random.PRNGKey(0), logits, sample=False)
    assert int(tok[0]) == 1
    # with a huge logit gap, sampling agrees with argmax
    tok2 = S.sample_logits(jax.random.PRNGKey(0), logits, sample=True)
    assert int(tok2[0]) == 1
    # top_k=1 forces greedy even when sampling
    logits3 = jnp.asarray([[2.0, 2.1, 1.9]])
    toks = [int(S.sample_logits(jax.random.PRNGKey(i), logits3, top_k=1,
                                sample=True)[0]) for i in range(5)]
    assert toks == [1] * 5


def test_top_p_logits():
    # probs ~ softmax([3,2,1,0]) = [.643,.236,.087,.032]; p=.6 keeps only
    # the top token (cum-before .643 >= .6 for the rest), p=.7 keeps two
    logits = jnp.asarray([[3.0, 2.0, 1.0, 0.0]])
    out = np.asarray(S.top_p_logits(logits, 0.6))
    assert out[0, 0] == 3.0 and np.isneginf(out[0, 1:]).all()
    out = np.asarray(S.top_p_logits(logits, 0.7))
    assert out[0, 0] == 3.0 and out[0, 1] == 2.0
    assert np.isneginf(out[0, 2:]).all()
    # p=1 keeps everything; the top-1 token survives any p
    out = np.asarray(S.top_p_logits(logits, 1.0))
    assert np.isfinite(out).all()
    out = np.asarray(S.top_p_logits(logits, 1e-9))
    assert out[0, 0] == 3.0 and np.isneginf(out[0, 1:]).all()
    # batch rows filter independently
    two = jnp.asarray([[3.0, 2.0, 1.0, 0.0], [0.0, 1.0, 2.0, 3.0]])
    out = np.asarray(S.top_p_logits(two, 0.6))
    assert out[0, 0] == 3.0 and out[1, 3] == 3.0
    assert np.isneginf(out[0, 1:]).all() and np.isneginf(out[1, :3]).all()


def test_sample_logits_top_p_composes_with_top_k():
    # top_p after prior top-k masking: -inf rows must not break the
    # cumulative-mass computation
    logits = jnp.asarray([[2.0, 2.1, 1.9, -5.0]])
    tok = S.sample_logits(jax.random.PRNGKey(0), logits, top_k=3,
                          top_p=1e-9, sample=True)
    assert int(tok[0]) == 1  # nucleus of size 1 == argmax
    # top_p=None / >=1 is a no-op path
    a = S.sample_logits(jax.random.PRNGKey(3), logits, top_p=None)
    b = S.sample_logits(jax.random.PRNGKey(3), logits, top_p=1.0)
    assert int(a[0]) == int(b[0])


def test_gpt_generate_top_p_runs_and_masks():
    from melspec_gpt_vqvae_tpu.configs import GPTConfig
    from melspec_gpt_vqvae_tpu.models import gpt as G
    cfg = GPTConfig(vocab_size=16, block_size=12, n_layer=1, n_head=2,
                    n_embd=16, class_size=2)
    params = G.init_gpt_params(jax.random.PRNGKey(0), cfg)
    cond = G.class_embed(params, jnp.zeros((2,), jnp.int32))
    toks = G.gpt_generate(params, cfg, jax.random.PRNGKey(1), cond,
                          steps=4, top_p=0.9)
    assert toks.shape == (2, 4)
    # top_p tiny == deterministic argmax chain
    det = G.gpt_generate(params, cfg, jax.random.PRNGKey(2), cond,
                         steps=4, sample=False)
    nuc = G.gpt_generate(params, cfg, jax.random.PRNGKey(3), cond,
                         steps=4, top_p=1e-9)
    np.testing.assert_array_equal(np.asarray(det), np.asarray(nuc))


def test_bernoulli_u8_statistics_and_paths():
    """bernoulli_u8: u8 path for rates that are multiples of 1/256 (exact),
    u16 path otherwise (P quantised to 1/65536); empirical keep-rate within
    MC noise of the requested probability on both paths."""
    key = jax.random.PRNGKey(7)
    n = 1 << 20
    for p in (0.5, 0.75):        # exact u8 thresholds
        m = A.bernoulli_u8(key, p, (n,))
        assert m.dtype == jnp.bool_
        assert abs(float(jnp.mean(m)) - p) < 4e-3
    for p in (0.7, 0.9):         # u16 path
        m = A.bernoulli_u8(key, p, (n,))
        assert abs(float(jnp.mean(m)) - p) < 4e-3
    # keep_prob edge cases: 0 keeps nothing, ~1 falls back without error
    assert not bool(jnp.any(A.bernoulli_u8(key, 0.0, (256,))))
    assert bool(jnp.all(A.bernoulli_u8(key, 1.0, (256,))))
