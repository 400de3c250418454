"""Flash-attention (custom VJP Pallas kernels) parity vs the XLA path:
forward values, gradients, masking window, dropout-mask equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.ops import attention as A
from melspec_gpt_vqvae_tpu.ops import flash_attention as F


pytestmark = pytest.mark.slow  # training loops; default lane: -m 'not slow'

def _qkv(b=2, h=3, t=37, hd=16, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(jnp.asarray(rng.standard_normal((b, h, t, hd)),
                             jnp.float32) for _ in range(3))


@pytest.mark.parametrize("n_unmasked", [0, 19])
def test_forward_matches_xla(n_unmasked):
    q, k, v = _qkv()
    a = np.asarray(F.flash_attention(q, k, v, None, n_unmasked, 1.0))
    b = np.asarray(A.attend_xla(q, k, v, n_unmasked))
    np.testing.assert_allclose(a, b, atol=3e-5)


@pytest.mark.parametrize("n_unmasked", [0, 11])
def test_gradients_match_xla(n_unmasked):
    q, k, v = _qkv(t=23)
    g = jnp.asarray(np.random.default_rng(5).standard_normal(q.shape),
                    jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(F.flash_attention(q, k, v, None, n_unmasked, 1.0) * g)

    def loss_xla(q, k, v):
        return jnp.sum(A.attend_xla(q, k, v, n_unmasked) * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_dropout_mask_equivalence():
    """With an explicit keep-mask, flash matches a hand-built dropped-XLA
    attention exactly (fwd + grads)."""
    q, k, v = _qkv(t=17, seed=3)
    t = q.shape[2]
    rate = 0.4
    mask = F.make_dropout_mask(jax.random.PRNGKey(0),
                               (q.shape[0], q.shape[1], t, t), rate)

    def xla_dropped(q, k, v):
        scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], q.dtype))
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        s = jnp.where(jnp.asarray(A.window_mask(t, 0)), s, A.NEG_INF)
        p = jax.nn.softmax(s, axis=-1)
        p = p * mask.astype(p.dtype) / (1.0 - rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    a = np.asarray(F.flash_attention(q, k, v, mask, 0, 1.0 - rate))
    b = np.asarray(xla_dropped(q, k, v))
    np.testing.assert_allclose(a, b, atol=3e-5)

    g = jnp.ones_like(q)
    gf = jax.grad(lambda q, k, v: jnp.sum(
        F.flash_attention(q, k, v, mask, 0, 1.0 - rate) * g),
        argnums=(0, 1, 2))(q, k, v)
    gx = jax.grad(lambda q, k, v: jnp.sum(xla_dropped(q, k, v) * g),
                  argnums=(0, 1, 2))(q, k, v)
    for x, y in zip(gf, gx):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=5e-5)


def test_jit_and_vjp_under_scan():
    """The custom VJP composes with jit + grad through a scan (the layer
    stack shape it will live in)."""
    q, k, v = _qkv(b=1, h=2, t=13, hd=8)

    @jax.jit
    def loss(q):
        def body(c, _):
            o = F.flash_attention(c, k, v, None, 0, 1.0)
            return o, None
        out, _ = jax.lax.scan(body, q, None, length=2)
        return jnp.sum(out ** 2)

    val, grad = jax.value_and_grad(loss)(q)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all() and float(
        jnp.abs(grad).sum()) > 0


def test_block_with_flash_matches_xla_block():
    """gpt_apply with use_flash_train matches the XLA block when dropout=0."""
    from melspec_gpt_vqvae_tpu.configs import GPTConfig
    from melspec_gpt_vqvae_tpu.models import gpt as G

    cfg = GPTConfig(vocab_size=13, block_size=20, n_layer=2, n_head=2,
                    n_embd=16)
    cfg_f = cfg.replace(use_flash_train=True)
    p = G.init_gpt_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).integers(0, 13, (2, 12)))
    l1, _ = G.gpt_apply(p, cfg, x, use_pallas=False)
    l2, _ = G.gpt_apply(p, cfg_f, x)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=1e-4)

    # grads too
    def loss(p, cfg):
        lg, _ = G.gpt_apply(p, cfg, x, train=True,
                            rng=jax.random.PRNGKey(1), use_pallas=False)
        return jnp.sum(lg ** 2)
    # dropout 0 -> same rng usage irrelevant
    g1 = jax.grad(lambda q: loss(q, cfg))(p)
    g2 = jax.grad(lambda q: loss(q, cfg_f))(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b), atol=1e-3),
        g1, g2)
