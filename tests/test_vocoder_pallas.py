"""Fused MelGAN resblock-stack kernel (ops/vocoder_pallas.py).

The reference runs each upsample stage's dilated ResnetBlocks as separate
torch convs (/root/reference/vocoder/modules.py:23-36, used at :58-66); the
fused kernel must reproduce that stack's numerics, including at the folded
C=64/32 stage widths.  CPU runs the kernel in interpret mode (conftest
forces the cpu platform)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import VocoderConfig
from melspec_gpt_vqvae_tpu.models import quantized as qz
from melspec_gpt_vqvae_tpu.models.vocoder import (MelGANGenerator,
                                                  MelGANResnetBlock)
from melspec_gpt_vqvae_tpu.ops import vocoder_pallas as vp

DILS = (1, 3, 9)


def _stack_params(c, key):
    blocks = [MelGANResnetBlock(c, dilation=3 ** j) for j in range(3)]
    params = []
    x = jnp.zeros((1, 64, c))
    for blk in blocks:
        key, sub = jax.random.split(key)
        params.append(blk.init(sub, x)["params"])
    return blocks, params


def _flax_stack(blocks, params, x):
    for blk, p in zip(blocks, params):
        x = blk.apply({"params": p}, x)
    return x


@pytest.mark.parametrize("c,t", [(32, 640), (64, 320), (128, 320),
                                 (256, 320)])
def test_kernel_interior_matches_flax(c, t):
    """Interior samples (>= edge_width from the sequence ends) are the
    same computation as the unfused per-block path, at every stage width
    including the folded C=64/32 ones."""
    blocks, params = _stack_params(c, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (2, t, c), jnp.float32)
    ref = _flax_stack(blocks, params, x)
    out = vp.fused_resblock_stack(x, vp.pack_stack(params, jnp.float32),
                                  DILS, interpret=True)
    e = vp.edge_width(DILS, vp.fold_factor(c))
    np.testing.assert_allclose(np.asarray(ref[:, e:-e]),
                               np.asarray(out[:, e:-e]),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("c,t", [(32, 832), (64, 416), (128, 208)])
def test_fused_executor_matches_float_everywhere(c, t):
    """FusedConvs recomputes the edge_width edge samples exactly, so the
    whole stage output matches FloatConvs (incl. the per-block reflection
    boundary semantics of reference vocoder/modules.py:30)."""
    blocks, params = _stack_params(c, jax.random.PRNGKey(2))
    x = jax.random.normal(jax.random.PRNGKey(3), (2, t, c), jnp.float32)
    plist = list(params)
    ref = qz.FloatConvs().resblock_stack("s", x, plist, DILS)
    out = qz.FusedConvs(interpret_ok=True).resblock_stack("s", x, plist, DILS)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)


def test_fused_executor_falls_back_on_small_input():
    """Inputs too short for the kernel take the unfused path (identical
    result, no error)."""
    c, t = 32, 48
    _, params = _stack_params(c, jax.random.PRNGKey(4))
    x = jax.random.normal(jax.random.PRNGKey(5), (1, t, c), jnp.float32)
    ref = qz.FloatConvs().resblock_stack("s", x, list(params), DILS)
    out = qz.FusedConvs(interpret_ok=True).resblock_stack("s", x, list(params), DILS)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_full_vocoder_fused_matches_flax():
    """End-to-end MelGAN generator with FusedConvs == the flax module
    (models/vocoder.py mirrors reference vocoder/modules.py:38-80)."""
    cfg = VocoderConfig()
    gen = MelGANGenerator(cfg)
    mel = jax.random.uniform(jax.random.PRNGKey(6), (2, 54, 80))
    params = gen.init(jax.random.PRNGKey(7), mel)["params"]
    ref = gen.apply({"params": params}, mel)
    out = qz.melgan_apply(params, cfg, mel, qz.FusedConvs(interpret_ok=True))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out),
                               rtol=1e-5, atol=1e-5)
    # the float executor stays bit-identical to flax
    flo = qz.melgan_apply(params, cfg, mel, qz.FloatConvs())
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(flo))


def test_roll_sets_and_edge_width():
    # f=1: classic taps {-d, 0, d}; garbage = sum(dilations)
    assert vp.roll_sets(DILS, 1) == ((-1, 0, 1), (-3, 0, 3), (-9, 0, 9))
    assert vp.edge_width(DILS, 1) == 13
    # f=2: phase 0/1 taps of +-d land on rows (p+-d)//2
    assert vp.roll_sets(DILS, 2) == ((-1, 0, 1), (-2, -1, 0, 1, 2),
                                     (-5, -4, 0, 4, 5))
    assert vp.edge_width(DILS, 2) == 2 * (1 + 2 + 5)
    # f=4
    assert vp.roll_sets(DILS, 4) == ((-1, 0, 1), (-1, 0, 1),
                                     (-3, -2, 0, 2, 3))
    assert vp.edge_width(DILS, 4) == 4 * (1 + 1 + 3)


def test_pick_tile_properties():
    # bench geometry: all four stage (T, C) pairs fold to Tf=6784/54272
    for t, c in [(6784, 256), (54272, 128), (108544, 64), (217088, 32)]:
        f = vp.fold_factor(c)
        tile = vp.pick_tile(t, c, vp.HALO, 2)
        assert tile is not None and (t // f) % tile == 0 and tile % 16 == 0
        assert 2 * tile <= t // f and tile + 2 * vp.HALO <= t // f
        assert vp.supports(t, c)
    assert vp.pick_tile(13, 32, vp.HALO, 2) is None  # no legal tile
    assert not vp.supports(13, 32)
    # C not dividing 128 (no fold) and T not divisible by the fold
    assert not vp.supports(54272, 96)
    assert not vp.supports(217089, 32)
