"""int8 decode-stage quantisation (models/quantized.py, ops/quant.py).

The float executor mirror must match the flax forward bit-for-bit (it is
the correctness anchor); the int8 path must stay close to float and run
as a jitted function over a qstate pytree.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import VocoderConfig, VQVAEConfig
from melspec_gpt_vqvae_tpu.models import quantized as qz
from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator
from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
from melspec_gpt_vqvae_tpu.ops.quant import (conv_float, conv_int8,
                                             quantize_act, quantize_weight)


@pytest.fixture(scope="module")
def tiny():
    # attn at the mid resolution (4) exercises the attn-block mirror
    vq = VQVAEConfig(num_embeddings=16, embedding_dim=8, ch=8,
                     ch_mult=(1, 2), num_res_blocks=1,
                     attn_resolutions=(4,), z_channels=8, resolution=8,
                     code_h=2, code_w=4)
    voc = VocoderConfig(n_mel_channels=4, ngf=4, n_residual_layers=2,
                        ratios=(2, 2))
    vq_params = VQModel(vq).init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 8, 1)))["params"]
    voc_params = MelGANGenerator(voc).init(
        jax.random.PRNGKey(2), jnp.zeros((1, 8, 4)))["params"]
    rng = np.random.default_rng(0)
    grid = jnp.asarray(rng.integers(0, 16, (3, 2, 4)), jnp.int32)
    return vq, voc, vq_params, voc_params, grid


def test_quantize_weight_roundtrip():
    rng = np.random.default_rng(3)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) *
                    rng.uniform(0.01, 2.0, (1, 1, 1, 16)), jnp.float32)
    w8, s = quantize_weight(w)
    assert w8.dtype == jnp.int8 and s.shape == (16,)
    # per-channel: dequantised error bounded by half a step of each
    # channel's own scale, not the global max
    err = np.abs(np.asarray(w8, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= 0.5 * np.asarray(s) + 1e-7).all()


def test_int8_conv_matches_float_for_exact_grids():
    # values representable exactly on the int8 grid -> int8 conv is exact
    rng = np.random.default_rng(4)
    s_x = jnp.float32(0.25)
    x = jnp.asarray(rng.integers(-100, 100, (2, 6, 9, 4)),
                    jnp.float32) * s_x
    w = jnp.asarray(rng.integers(-100, 100, (3, 3, 4, 5)),
                    jnp.float32) / 127.0
    b = jnp.asarray(rng.standard_normal(5), jnp.float32)
    w8, s_w = quantize_weight(w)
    # compare against the dequantised weights: x is exactly on the s_x
    # grid, so the int8 conv arithmetic must match the float conv on
    # (x, w8*s_w) to rounding noise
    y_f = conv_float(x, w8.astype(jnp.float32) * s_w, b, padding=1)
    y_q = conv_int8(x, w8, s_w, b, s_x, padding=1)
    np.testing.assert_allclose(np.asarray(y_q), np.asarray(y_f),
                               rtol=1e-5, atol=1e-5)


def test_quantize_act_clips():
    x = jnp.asarray([-10.0, -0.5, 0.0, 0.5, 10.0], jnp.float32)
    q = quantize_act(x, jnp.float32(0.01))
    np.testing.assert_array_equal(np.asarray(q), [-127, -50, 0, 50, 127])


def test_float_mirror_matches_flax_decoder(tiny):
    vq, voc, vq_params, voc_params, grid = tiny
    ref = VQModel(vq).apply({"params": vq_params}, grid,
                            method="decode_code")
    out = qz.decode_code_apply(vq_params, vq, grid, qz.FloatConvs())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("polyphase", [False, True])
def test_float_mirror_matches_flax_vocoder(tiny, polyphase):
    """Both float upsample forms (flax ConvTranspose and the polyphase
    width-2 conv) reproduce the flax vocoder forward."""
    vq, voc, vq_params, voc_params, grid = tiny
    rng = np.random.default_rng(5)
    mel = jnp.asarray(rng.uniform(0, 1, (3, 8, 4)), jnp.float32)
    ref = MelGANGenerator(voc).apply({"params": voc_params}, mel)
    ex = qz.FloatConvs()
    ex.polyphase_transpose = polyphase
    out = qz.melgan_apply(voc_params, voc, mel, ex)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("r", [2, 3, 8])
def test_polyphase_matches_conv_transpose(r):
    """The polyphase rewrite is EXACT: width-2 regular conv + interleave
    == flax ConvTranspose(k=2r, stride r) + torch crop, any stride
    parity."""
    import flax.linen as nn

    from melspec_gpt_vqvae_tpu.ops.quant import polyphase_from_transpose

    rng = np.random.default_rng(r)
    ci, co, t = 6, 5, 7
    x = jnp.asarray(rng.standard_normal((2, t, ci)), jnp.float32)
    mod = nn.ConvTranspose(co, (2 * r,), strides=(r,), padding="VALID",
                           transpose_kernel=True)
    p = mod.init(jax.random.PRNGKey(0), x)["params"]
    y = mod.apply({"params": p}, x)
    pad = r // 2 + r % 2
    ref = y[:, pad:y.shape[1] - pad + r % 2, :]

    pk = polyphase_from_transpose(p["kernel"], r)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    out = conv_float(xp, pk, jnp.tile(p["bias"], r))
    out = out.reshape(2, t + 1, r, co).reshape(2, (t + 1) * r, co)
    out = out[:, pad:pad + t * r, :]
    assert ref.shape == out.shape == (2, t * r, co)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_int8_transpose_path(tiny):
    """int8_transpose=True quantises the vocoder upsamples through the
    polyphase form and stays close to float."""
    vq, voc, vq_params, voc_params, grid = tiny
    qstate = qz.build_qstate(vq_params, voc_params, vq, voc,
                             n_calib=8, batch=4, int8_transpose=True)
    assert "voc/up_0" in qstate["w8"]
    assert qstate["w8"]["voc/up_0"].shape[0] == 2  # polyphase width 2
    rng = np.random.default_rng(6)
    mel = jnp.asarray(rng.uniform(0, 1, (3, 8, 4)), jnp.float32)
    wav_f = qz.melgan_apply(voc_params, voc, mel, qz.FloatConvs())
    wav_q = qz.melgan_apply(voc_params, voc, mel, qz.Int8Convs(qstate))
    err = np.asarray(wav_q - wav_f, np.float32)
    sig = np.asarray(wav_f, np.float32)
    snr = 10 * np.log10(np.mean(sig ** 2) / max(np.mean(err ** 2), 1e-20))
    assert snr > 20.0, f"int8-transpose vocoder SNR {snr:.1f} dB"

    # int8_transpose=False builds fall back to float transposes per-path
    qs0 = qz.build_qstate(vq_params, voc_params, vq, voc,
                          n_calib=8, batch=4, int8_transpose=False)
    assert "voc/up_0" not in qs0["w8"]
    wav0 = qz.melgan_apply(voc_params, voc, mel, qz.Int8Convs(qs0))
    assert np.isfinite(np.asarray(wav0)).all()


def test_calibration_covers_all_quantized_convs(tiny):
    vq, voc, vq_params, voc_params, grid = tiny
    acts = qz.calibrate(vq_params, voc_params, vq, voc, grid, batch=2)
    # decoder: conv_in + 2 convs per resblock (mid x2 + 2 per level x2
    # levels) + upsample; vocoder: conv_in + 3 per resblock
    assert "vq/decoder/conv_in" in acts
    assert "vq/decoder/mid_block_1/Conv_0" in acts
    assert "vq/decoder/up_1_upsample/Conv_0" in acts
    assert "voc/conv_in" in acts
    assert "voc/res_1_1/block_conv1" in acts
    # final convs + attn + post_quant stay float
    assert "vq/decoder/conv_out" not in acts
    assert "voc/conv_out" not in acts
    assert not any("attn" in k for k in acts)
    assert all(v > 0 for v in acts.values())


def test_int8_decode_close_to_float(tiny):
    vq, voc, vq_params, voc_params, grid = tiny
    qstate = qz.build_qstate(vq_params, voc_params, vq, voc,
                             n_calib=8, batch=4)

    spec_f = qz.decode_code_apply(vq_params, vq, grid, qz.FloatConvs())
    spec_q = qz.decode_code_apply(vq_params, vq, grid, qz.Int8Convs(qstate))
    err = np.asarray(spec_q - spec_f, np.float32)
    sig = np.asarray(spec_f, np.float32)
    snr = 10 * np.log10(np.mean(sig ** 2) / max(np.mean(err ** 2), 1e-20))
    assert snr > 20.0, f"decoder int8 SNR {snr:.1f} dB"

    mel = jnp.clip((spec_f[..., 0].astype(jnp.float32) + 1) / 2, 0, 1)
    mel = jnp.swapaxes(mel, 1, 2)
    wav_f = qz.melgan_apply(voc_params, voc, mel, qz.FloatConvs())
    wav_q = qz.melgan_apply(voc_params, voc, mel, qz.Int8Convs(qstate))
    err = np.asarray(wav_q - wav_f, np.float32)
    sig = np.asarray(wav_f, np.float32)
    snr = 10 * np.log10(np.mean(sig ** 2) / max(np.mean(err ** 2), 1e-20))
    assert snr > 20.0, f"vocoder int8 SNR {snr:.1f} dB"


def test_float_mirror_matches_flax_encoder(tiny):
    vq, voc, vq_params, voc_params, grid = tiny
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.uniform(-1, 1, (3, 4, 8, 1)), jnp.float32)
    ref = VQModel(vq).apply({"params": vq_params}, x,
                            method="encode_to_indices")
    out = qz.encode_to_indices_apply(vq_params, vq, x, qz.FloatConvs())
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_int8_encode_code_agreement(tiny):
    """int8 encoder codes mostly agree with the float path (flips happen
    only near codebook decision boundaries)."""
    vq, voc, vq_params, voc_params, grid = tiny
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.uniform(-1, 1, (8, 4, 8, 1)), jnp.float32)
    qstate = qz.build_encode_qstate(vq_params, vq, x, batch=4)
    assert "vq/encoder/conv_in" in qstate["w8"]
    assert "vq/encoder/down_0_downsample/Conv_0" in qstate["w8"]
    idx_f = qz.encode_to_indices_apply(vq_params, vq, x, qz.FloatConvs())
    idx_q = qz.encode_to_indices_apply(vq_params, vq, x,
                                       qz.Int8Convs(qstate))
    agree = float((np.asarray(idx_f) == np.asarray(idx_q)).mean())
    assert agree > 0.8, f"int8 encoder code agreement {agree:.3f}"


def test_qstate_is_a_jit_argument(tiny):
    vq, voc, vq_params, voc_params, grid = tiny
    qstate = qz.build_qstate(vq_params, voc_params, vq, voc,
                             n_calib=4, batch=4)

    @jax.jit
    def dec(p, qs, g):
        return qz.decode_code_apply(p, vq, g, qz.Int8Convs(qs))

    out = dec(vq_params, qstate, grid)
    ref = qz.decode_code_apply(vq_params, vq, grid, qz.Int8Convs(qstate))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_int8_decode(tiny):
    """GenerationPipeline(int8_decode=True) runs end-to-end and stays
    close to the float pipeline's output for the same tokens."""
    from melspec_gpt_vqvae_tpu.configs import ExperimentConfig, GPTConfig
    from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params
    from melspec_gpt_vqvae_tpu.pipeline import GenerationPipeline

    vq, voc, vq_params, voc_params, _ = tiny
    gpt = GPTConfig(vocab_size=16, block_size=9, n_layer=2, n_head=2,
                    n_embd=16, class_size=4)
    exp = dataclasses.replace(ExperimentConfig(model=gpt), vqvae=vq,
                              vocoder=voc)
    gpt_params = init_gpt_params(jax.random.PRNGKey(0), gpt)
    pipe_f = GenerationPipeline(exp, gpt_params, vq_params, voc_params,
                                segments=2, chunk=3, bf16=False)
    pipe_q = GenerationPipeline(exp, gpt_params, vq_params, voc_params,
                                segments=2, chunk=3, bf16=False,
                                int8_decode=True)
    cls = np.asarray([0, 1, 2, 3], np.int32)
    out_f = pipe_f.generate(cls, jax.random.PRNGKey(7), top_k=5)
    out_q = pipe_q.generate(cls, jax.random.PRNGKey(7), top_k=5)
    np.testing.assert_array_equal(out_f["tokens"], out_q["tokens"])
    assert out_q["specs"].shape == out_f["specs"].shape
    assert out_q["wavs"].shape == out_f["wavs"].shape
    assert np.isfinite(out_q["wavs"]).all()
    # same tokens -> decode outputs agree to quantisation noise
    df = out_q["specs"] - out_f["specs"]
    snr = 10 * np.log10(np.mean(out_f["specs"] ** 2) /
                        max(np.mean(df ** 2), 1e-20))
    assert snr > 20.0, f"pipeline int8 spec SNR {snr:.1f} dB"
