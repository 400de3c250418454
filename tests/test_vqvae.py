"""VQ-VAE tests: geometry (80x848 -> 5x53 codes), quantiser semantics,
straight-through gradients, GAN loss pieces.

Uses a scaled-down config (same ch_mult depth, tiny widths) so CPU tests
stay fast; the full-size geometry is checked via shape arithmetic.
"""

import dataclasses

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import VQVAEConfig
from melspec_gpt_vqvae_tpu.models import vqvae as VQ

TINY = VQVAEConfig(num_embeddings=16, embedding_dim=8, ch=8,
                   ch_mult=(1, 1, 2), num_res_blocks=1,
                   attn_resolutions=(12,), resolution=48, z_channels=8,
                   code_h=5, code_w=12)


def _init_model(cfg=TINY, h=20, w=48):
    model = VQ.VQModel(cfg)
    x = jnp.zeros((1, h, w, 1))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    return model, params


def test_encode_decode_geometry():
    model, params = _init_model()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 20, 48, 1)),
                    jnp.float32)
    z = model.apply({"params": params}, x, method="encode")
    assert z.shape == (2, 5, 12, TINY.embedding_dim)  # 4x downsample
    idx = model.apply({"params": params}, x, method="encode_to_indices")
    assert idx.shape == (2, 5, 12)
    assert idx.dtype == jnp.int32
    rec = model.apply({"params": params}, idx, method="decode_code")
    assert rec.shape == (2, 20, 48, 1)


def test_full_size_downsample_arithmetic():
    # 80x848 with 4 stride-2 convs and (0,1) asym pad -> 5x53
    h, w = 80, 848
    for _ in range(len(VQVAEConfig().ch_mult) - 1):
        h = (h + 1 - 3) // 2 + 1
        w = (w + 1 - 3) // 2 + 1
    assert (h, w) == (5, 53)


def test_forward_returns_losses_and_info():
    model, params = _init_model()
    x = jnp.asarray(np.random.default_rng(1).standard_normal((2, 20, 48, 1)),
                    jnp.float32)
    loss, recon, (perp, idx) = model.apply({"params": params}, x)
    assert recon.shape == x.shape
    assert float(loss) >= 0
    assert 1.0 <= float(perp) <= TINY.num_embeddings


def test_quantizer_straight_through_gradient():
    vq = VQ.VectorQuantizer(8, 4)
    z = jnp.asarray(np.random.default_rng(2).standard_normal((1, 2, 2, 4)),
                    jnp.float32)
    params = vq.init(jax.random.PRNGKey(0), z)["params"]

    def f(z):
        _, q, _ = vq.apply({"params": params}, z)
        return jnp.sum(q * jnp.arange(q.size).reshape(q.shape))

    g = jax.grad(f)(z)
    # straight-through: dq/dz == identity
    np.testing.assert_allclose(
        np.asarray(g), np.arange(z.size).reshape(z.shape), atol=1e-5)

    def loss_wrt_codebook(p):
        l, _, _ = vq.apply({"params": p}, z)
        return l

    gc = jax.grad(loss_wrt_codebook)(params)
    assert float(jnp.abs(gc["embedding"]).sum()) > 0


def test_quantizer_picks_nearest():
    vq = VQ.VectorQuantizer(4, 2)
    cb = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [-1.0, -1.0], [2.0, 2.0]])
    params = {"embedding": cb}
    z = jnp.asarray([[[[0.9, 1.1], [-0.1, 0.05]]]])
    _, q, (_, idx) = vq.apply({"params": params}, z)
    np.testing.assert_array_equal(np.asarray(idx[0, 0]), [1, 0])
    np.testing.assert_allclose(np.asarray(q[0, 0, 0]), [1.0, 1.0])


def test_codebook_usage_counts():
    idx = jnp.asarray([[0, 1, 1], [3, 1, 0]])
    counts = np.asarray(VQ.codebook_usage_counts(idx, 5))
    np.testing.assert_array_equal(counts, [2, 3, 0, 1, 0])


def test_hinge_loss_and_adaptive_weight():
    real = jnp.asarray([2.0, 0.5])
    fake = jnp.asarray([-2.0, -0.5])
    l = float(VQ.hinge_d_loss(real, fake))
    assert abs(l - 0.5 * (0.25 + 0.25)) < 1e-6
    w = VQ.adaptive_gan_weight(jnp.asarray(2.0), jnp.asarray(1.0), 0.5)
    assert abs(float(w) - 2.0 / 1.0001 * 0.5) < 1e-4
    w2 = VQ.adaptive_gan_weight(jnp.asarray(1e9), jnp.asarray(1e-9), 1.0)
    assert float(w2) == 1e4  # clipped


def test_discriminator_shapes():
    disc = VQ.NLayerDiscriminator(ndf=8, n_layers=2)
    x = jnp.zeros((1, 32, 32, 1))
    variables = disc.init(jax.random.PRNGKey(0), x)
    out = disc.apply(variables, x)
    assert out.shape[0] == 1 and out.shape[-1] == 1
    assert out.shape[1] < 32  # patch map


@pytest.mark.slow
def test_vqvae_training_step_reduces_loss():
    model, params = _init_model()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((2, 20, 48, 1)),
                    jnp.float32) * 0.5

    import optax
    opt = optax.adam(1e-3)
    state = opt.init(params)

    def loss_fn(p):
        qloss, recon, _ = model.apply({"params": p}, x)
        return jnp.mean(jnp.abs(x - recon)) + qloss

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        up, s = opt.update(g, s)
        return optax.apply_updates(p, up), s, l

    l0 = float(loss_fn(params))
    for _ in range(10):
        params, state, l = step(params, state)
    assert float(l) < l0
