"""int8-quantised inference mirrors of the VQ decoder and MelGAN vocoder.

The decode stage (VQ ``decode_code`` + vocoder) is compute-bound at 73%
of the *bf16* MXU peak (BENCH_NOTES.md "VQ-decoder profile"); int8 would
raise the peak itself.  OUTCOME (measured, BENCH_NOTES.md int8-decode
e2e section): the quality gate passes but the stage runs SLOWER than
bf16 end-to-end — per-conv requantisation passes and the vocoder's
small-channel long-T convs erase the isolated-shape 1.27-1.66x
(scripts/int8_conv_probe.py pre-quantised its inputs).  Kept as the
documented opt-in experiment; the production decode stays bf16.

Unlike the int8 KV cache / weight streaming (which dequantise into bf16
math), this runs int8 ACTIVATIONS through the conv stacks, so it needs
per-layer calibrated requantisation and is quality-gated opt-in
(``--int8_decode``): see scripts/int8_quality.py.

Design: pure functions that walk the SAME layer structure as the flax
modules (models/vqvae.py ``Decoder``/``VQModel.decode_code``,
models/vocoder.py ``MelGANGenerator``) over the SAME parameter pytrees,
with every hot conv routed through a pluggable executor:

  * ``FloatConvs``   — plain XLA convs; bit-compatible with the flax
    forward (pinned by tests/test_quantized.py), the correctness anchor;
  * ``CalibConvs``   — float convs that also record each conv input's
    absmax (the activation-scale calibration pass);
  * ``Int8Convs``    — calibrated int8 convs (ops/quant.py).

GroupNorm / attention / resize (and the float-path ConvTranspose) reuse
one-off flax applies so their numerics have a single source of truth.
Kept float (negligible FLOPs or quality-critical): the attention block's
1x1 convs, the ``post_quant_conv``, and both final ``conv_out`` layers.
The vocoder's ConvTranspose upsamples (~2/3 of vocoder FLOPs) quantise
via an exact polyphase rewrite into a width-2 regular conv
(ops/quant.py ``polyphase_from_transpose``), optional per
``build_qstate(int8_transpose=...)``.

The reference has no counterpart (pure f32 torch decode,
/root/reference/vqvae/big_model_attn_gan.py:291-392,
/root/reference/vocoder/modules.py:38-80); this is a TPU-native serving
feature.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..configs import VocoderConfig, VQVAEConfig
from ..ops.quant import (conv_float, conv_int8, conv_transpose_polyphase,
                         polyphase_from_transpose, quantize_weight)
from ..ops.vq import vq_lookup
from .vqvae import swish


# Default activation-scale calibration quantile (1.0 = absmax); tuned by
# the reference-scale sweep (scripts/int8_quality.py IQ_SWEEP=1, recorded
# in INT8_DECODE.json): 0.9999 clips the heavy activation tail for +1.8 dB
# spec SNR over absmax; 0.999 over-clips (-2.1 dB vs absmax).
DEFAULT_PERCENTILE = 0.9999

# ---------------------------------------------------------------------------
# conv executors
# ---------------------------------------------------------------------------


class FloatConvs:
    """Plain float convs (the parity anchor).

    ``polyphase_transpose`` routes the MelGAN upsamples through the
    exact width-2 polyphase conv (ops/quant.py
    ``conv_transpose_polyphase``) instead of flax ``ConvTranspose``.
    MEASURED DEAD END in float: 0.74-0.86x per upsampler, 0.87x on the
    full vocoder stage (scripts/voc_upsample_bench.py; BENCH_NOTES.md
    "polyphase float upsamplers") — Mosaic's native dilated-conv path
    never materialises the zero-stuffed input the rewrite was meant to
    avoid.  Default stays False; the int8 executor still uses the
    polyphase form, where it exists to ride the int8 conv path at all.
    """

    polyphase_transpose = False

    def conv(self, path, x, p, **kw):
        return conv_float(x, p["kernel"], p.get("bias"), **kw)

    def conv_transpose(self, path, x, p, ch, r):
        """MelGAN upsample: flax ConvTranspose + the torch-equivalent
        crop (models/vocoder.py:62-72), or its exact polyphase form."""
        if self.polyphase_transpose:
            return conv_transpose_polyphase(x, p["kernel"], p.get("bias"),
                                            r)
        y = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="VALID",
                             transpose_kernel=True).apply({"params": p}, x)
        pad = r // 2 + r % 2
        return y[:, pad:y.shape[1] - pad + r % 2, :]

    def resblock_stack(self, path, x, plist, dilations):
        """One MelGAN upsample stage's chain of dilated ResnetBlocks
        (reference vocoder/modules.py:23-36), conv by conv."""
        for j, (p, d) in enumerate(zip(plist, dilations)):
            h = nn.leaky_relu(x, 0.2)
            h = _reflect_pad_1d(h, d)
            h = self.conv(f"{path}_{j}/block_conv1", h, p["block_conv1"],
                          padding=0, dilation=(d,))
            h = nn.leaky_relu(h, 0.2)
            h = self.conv(f"{path}_{j}/block_conv2", h, p["block_conv2"])
            s = self.conv(f"{path}_{j}/shortcut", x, p["shortcut"])
            x = s + h
        return x


class FusedConvs(FloatConvs):
    """Float convs with each vocoder stage's resblock stack fused into
    one Pallas kernel (ops/vocoder_pallas.py): one HBM read + one write
    per stage instead of ~18 full-tensor passes through 9 separate
    convs.  The kernel reads clamped windows of the unpadded activation,
    so its first/last sum(dilations)=13 output samples are garbage (the
    reference reflect-pads each block's input,
    vocoder/modules.py:30); those edge samples are recomputed exactly
    with the unfused path on tiny slabs and patched in, so this executor
    matches FloatConvs everywhere (tests/test_vocoder_pallas.py).

    Off-TPU the executor falls back to the plain conv path entirely
    (production CPU pipelines stay bit-identical to flax and never pay
    the kernel's interpret mode); tests opt in with ``interpret_ok``."""

    def __init__(self, interpret_ok: bool = False):
        self.interpret_ok = interpret_ok

    def resblock_stack(self, path, x, plist, dilations):
        from ..ops import vocoder_pallas as vp
        if not (vp._on_tpu() or self.interpret_ok):
            return super().resblock_stack(path, x, plist, dilations)
        b, t, c = x.shape
        e = vp.edge_width(dilations, vp.fold_factor(c))
        # the slab's own far-edge contamination is sum(dilations); its
        # first/last e rows must be exact, so slab >> e + sum(dilations)
        slab = 4 * (e + sum(dilations))
        if (t < 2 * slab
                or not vp.supports(t, c, dilations, x.dtype.itemsize)):
            return super().resblock_stack(path, x, plist, dilations)
        packed = vp.pack_stack(plist, x.dtype, dilations)
        z = vp.fused_resblock_stack(x, packed, dilations)
        left = super().resblock_stack(path, x[:, :slab], plist, dilations)
        right = super().resblock_stack(path, x[:, -slab:], plist, dilations)
        z = jax.lax.dynamic_update_slice(z, left[:, :e], (0, 0, 0))
        return jax.lax.dynamic_update_slice(z, right[:, -e:],
                                            (0, t - e, 0))


class CalibConvs(FloatConvs):
    """Float convs that record each conv input's absmax (traced scalars,
    keyed by the static layer path — jit-friendly).

    ``percentile < 1.0`` records a high quantile of |x| instead of the
    max: heavy-tailed activations waste int8 resolution on rare outliers
    under pure absmax (clipping the tail measurably improves SNR —
    INT8_DECODE.json sweep)."""

    def __init__(self, percentile: float = 1.0):
        self.absmax: Dict[str, jnp.ndarray] = {}
        self.percentile = percentile

    def _record(self, path, x):
        ax = jnp.abs(x.astype(jnp.float32))
        if self.percentile >= 1.0:
            m = jnp.max(ax)
        else:
            m = jnp.quantile(ax.reshape(-1), self.percentile)
        self.absmax[path] = jnp.maximum(self.absmax.get(path, 0.0), m)

    def conv(self, path, x, p, **kw):
        self._record(path, x)
        return super().conv(path, x, p, **kw)

    def conv_transpose(self, path, x, p, ch, r):
        self._record(path, x)
        return super().conv_transpose(path, x, p, ch, r)


class Int8Convs(FloatConvs):
    """Calibrated int8 convs over a prebuilt qstate
    (:func:`make_qstate`).  Inherits the conv-by-conv resblock_stack,
    which routes every block conv through the int8 ``conv`` below."""

    def __init__(self, qstate):
        self.qstate = qstate

    def conv(self, path, x, p, **kw):
        return conv_int8(x, self.qstate["w8"][path], self.qstate["ws"][path],
                         p.get("bias"), self.qstate["acts"][path], **kw)

    def conv_transpose(self, path, x, p, ch, r):
        """Polyphase int8 transpose conv (ops/quant.py
        ``polyphase_from_transpose``); falls back to the float form when
        the path was not quantised (``int8_transpose=False`` builds)."""
        if path not in self.qstate["w8"]:
            return FloatConvs().conv_transpose(path, x, p, ch, r)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        y = conv_int8(xp, self.qstate["w8"][path], self.qstate["ws"][path],
                      jnp.tile(p["bias"], r), self.qstate["acts"][path])
        b, t1, _ = y.shape
        y = y.reshape(b, t1, r, ch).reshape(b, t1 * r, ch)
        pad = r // 2 + r % 2
        return y[:, pad:pad + x.shape[1] * r, :]


# ---------------------------------------------------------------------------
# shared flax one-off applies
# ---------------------------------------------------------------------------


def _group_norm(p, x):
    gn = nn.GroupNorm(num_groups=min(32, x.shape[-1]), epsilon=1e-6)
    return gn.apply({"params": p}, x)


def _attn_block(p, x):
    """Mirror of models/vqvae.py::AttnBlock (kept float: 1x1 convs over
    the 5x53 grid are ~0.1% of stage FLOPs)."""
    b, h, w, c = x.shape
    hn = _group_norm(p["GroupNorm_0"], x)
    q = conv_float(hn, p["q"]["kernel"], p["q"]["bias"]).reshape(b, h * w, c)
    k = conv_float(hn, p["k"]["kernel"], p["k"]["bias"]).reshape(b, h * w, c)
    v = conv_float(hn, p["v"]["kernel"], p["v"]["bias"]).reshape(b, h * w, c)
    att = jnp.einsum("bic,bjc->bij", q, k,
                     preferred_element_type=jnp.float32)
    att = jax.nn.softmax(att * (c ** -0.5), axis=2)
    out = jnp.einsum("bij,bjc->bic", att.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = conv_float(out.reshape(b, h, w, c).astype(x.dtype),
                     p["proj_out"]["kernel"], p["proj_out"]["bias"])
    return x + out


def _resnet_block(p, path, x, ex):
    """Mirror of models/vqvae.py::ResnetBlock at inference (dropout off)."""
    h = _group_norm(p["GroupNorm_0"], x)
    h = swish(h)
    h = ex.conv(f"{path}/Conv_0", h, p["Conv_0"], padding=1)
    h = _group_norm(p["GroupNorm_1"], h)
    h = swish(h)
    h = ex.conv(f"{path}/Conv_1", h, p["Conv_1"], padding=1)
    if "nin_shortcut" in p:
        x = ex.conv(f"{path}/nin_shortcut", x, p["nin_shortcut"])
    return x + h


# ---------------------------------------------------------------------------
# VQ decoder mirror
# ---------------------------------------------------------------------------


def decoder_apply(dec_params, cfg: VQVAEConfig, z, ex):
    """Mirror of models/vqvae.py::Decoder.__call__ (inference)."""
    num_res = len(cfg.ch_mult)
    curr_res = cfg.resolution // 2 ** (num_res - 1)
    h = ex.conv("vq/decoder/conv_in", z, dec_params["conv_in"], padding=1)
    h = _resnet_block(dec_params["mid_block_1"], "vq/decoder/mid_block_1",
                      h, ex)
    h = _attn_block(dec_params["mid_attn_1"], h)
    h = _resnet_block(dec_params["mid_block_2"], "vq/decoder/mid_block_2",
                      h, ex)
    for i_level in reversed(range(num_res)):
        for i_block in range(cfg.num_res_blocks + 1):
            name = f"up_{i_level}_block_{i_block}"
            h = _resnet_block(dec_params[name], f"vq/decoder/{name}", h, ex)
            if curr_res in cfg.attn_resolutions:
                h = _attn_block(dec_params[f"up_{i_level}_attn_{i_block}"], h)
        if i_level != 0:
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, 2 * hh, 2 * ww, c), method="nearest")
            name = f"up_{i_level}_upsample"
            h = ex.conv(f"vq/decoder/{name}/Conv_0", h,
                        dec_params[name]["Conv_0"], padding=1)
            curr_res *= 2
    h = _group_norm(dec_params["norm_out"], h)
    h = swish(h)
    # final conv stays float: it writes the spectrogram directly and is
    # ~0.2 GFLOP/clip
    return conv_float(h, dec_params["conv_out"]["kernel"],
                      dec_params["conv_out"]["bias"], padding=1)


def decode_code_apply(vq_params, cfg: VQVAEConfig, code_grid, ex):
    """Mirror of models/vqvae.py::VQModel.decode_code (codes -> spec)."""
    b, h, w = code_grid.shape
    quant = vq_lookup(code_grid.reshape(-1),
                      vq_params["quantize"]["embedding"]).reshape(
                          b, h, w, cfg.embedding_dim)
    z = conv_float(quant, vq_params["post_quant_conv"]["kernel"],
                   vq_params["post_quant_conv"]["bias"])
    return decoder_apply(vq_params["decoder"], cfg, z, ex)


# ---------------------------------------------------------------------------
# VQ encoder mirror (tokenize stage)
# ---------------------------------------------------------------------------


def encoder_apply(enc_params, cfg: VQVAEConfig, x, ex):
    """Mirror of models/vqvae.py::Encoder.__call__ (inference).

    Kept float: attention blocks and ``conv_out`` (it feeds the
    quant_conv -> L2-argmin chain, where quantisation noise near codebook
    decision boundaries flips indices — scripts/int8_quality.py measures
    the flip rate; the parity-gated extract_codes path never uses this).
    """
    curr_res = cfg.resolution
    num_res = len(cfg.ch_mult)
    h = ex.conv("vq/encoder/conv_in", x, enc_params["conv_in"], padding=1)
    for i_level in range(num_res):
        for i_block in range(cfg.num_res_blocks):
            name = f"down_{i_level}_block_{i_block}"
            h = _resnet_block(enc_params[name], f"vq/encoder/{name}", h, ex)
            if curr_res in cfg.attn_resolutions:
                h = _attn_block(
                    enc_params[f"down_{i_level}_attn_{i_block}"], h)
        if i_level != num_res - 1:
            # asymmetric-pad stride-2 downsample (models/vqvae.py:88-95)
            name = f"down_{i_level}_downsample"
            hp = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = ex.conv(f"vq/encoder/{name}/Conv_0", hp,
                        enc_params[name]["Conv_0"], strides=(2, 2),
                        padding=0)
            curr_res //= 2
    h = _resnet_block(enc_params["mid_block_1"], "vq/encoder/mid_block_1",
                      h, ex)
    h = _attn_block(enc_params["mid_attn_1"], h)
    h = _resnet_block(enc_params["mid_block_2"], "vq/encoder/mid_block_2",
                      h, ex)
    h = _group_norm(enc_params["norm_out"], h)
    h = swish(h)
    return conv_float(h, enc_params["conv_out"]["kernel"],
                      enc_params["conv_out"]["bias"], padding=1)


def encode_to_indices_apply(vq_params, cfg: VQVAEConfig, x, ex):
    """Mirror of models/vqvae.py::VQModel.encode_to_indices: mel
    (B, H, W, 1) in [-1, 1] -> code grid (B, h, w) int32.  The
    nearest-neighbour keeps the f32-HIGHEST path (ops/vq.py)."""
    from ..ops.vq import vq_nearest_index

    z = encoder_apply(vq_params["encoder"], cfg, x, ex)
    z = conv_float(z, vq_params["quant_conv"]["kernel"],
                   vq_params["quant_conv"]["bias"])
    b, h, w, c = z.shape
    idx = vq_nearest_index(z.reshape(-1, c),
                           vq_params["quantize"]["embedding"])
    return idx.reshape(b, h, w)


def build_encode_qstate(vq_params, vcfg: VQVAEConfig, mels, *,
                        batch: int = 16,
                        percentile: float = DEFAULT_PERCENTILE):
    """Calibrate the encoder on real mel inputs (``mels``: (N, H, W, 1)
    in [-1, 1]) and build its qstate (the tokenize-stage int8 entry
    point — bench/extract_codes opt-in, NOT the parity path)."""

    def _one(vqp, x):
        ex = CalibConvs(percentile)
        encoder_apply(vqp["encoder"], vcfg, x, ex)
        return ex.absmax

    run = jax.jit(_one)
    acc: Dict[str, np.ndarray] = {}
    for i in range(0, mels.shape[0], batch):
        stats = jax.device_get(run(vq_params, mels[i:i + batch]))
        for k, v in stats.items():
            acc[k] = np.maximum(acc.get(k, np.float32(0.0)), np.float32(v))
    return make_qstate(vq_params, None, acc)


# ---------------------------------------------------------------------------
# MelGAN vocoder mirror
# ---------------------------------------------------------------------------


def _reflect_pad_1d(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


def melgan_apply(voc_params, cfg: VocoderConfig, mel, ex):
    """Mirror of models/vocoder.py::MelGANGenerator.__call__.

    ``mel``: (B, T, n_mel_channels) in [0, 1] -> waveform (B, T*256).
    """
    mult = int(2 ** len(cfg.ratios))
    x = _reflect_pad_1d(mel, 3)
    x = ex.conv("voc/conv_in", x, voc_params["conv_in"], padding=0)
    for i, r in enumerate(cfg.ratios):
        x = nn.leaky_relu(x, 0.2)
        ch = mult * cfg.ngf // 2
        x = ex.conv_transpose(f"voc/up_{i}", x, voc_params[f"up_{i}"],
                              ch, r)
        x = ex.resblock_stack(
            f"voc/res_{i}", x,
            [voc_params[f"res_{i}_{j}"]
             for j in range(cfg.n_residual_layers)],
            tuple(3 ** j for j in range(cfg.n_residual_layers)))
        mult //= 2
    x = nn.leaky_relu(x, 0.2)
    x = _reflect_pad_1d(x, 3)
    # final conv stays float: single output channel, writes the waveform
    x = conv_float(x, voc_params["conv_out"]["kernel"],
                   voc_params["conv_out"]["bias"], padding=0)
    return jnp.tanh(x)[..., 0]


# ---------------------------------------------------------------------------
# calibration + qstate
# ---------------------------------------------------------------------------


def calibrate(vq_params, voc_params, vcfg: VQVAEConfig, vocfg: VocoderConfig,
              code_grids, batch: int = 16,
              percentile: float = 1.0) -> Dict[str, np.ndarray]:
    """Per-layer activation absmax over calibration code grids.

    ``code_grids``: (N, code_h, code_w) int — drawn from the codebook
    (uniform random indices cover the decoder's input space, since its
    input IS codebook entries); the decoded spectrograms feed the
    vocoder calibration.  Returns {path: absmax f32} on the host.
    """

    def _one(vqp, vocp, grid):
        ex = CalibConvs(percentile)
        spec = decode_code_apply(vqp, vcfg, grid, ex)[..., 0]
        mel01 = jnp.clip((spec.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        mel01 = mel01.astype(spec.dtype)
        melgan_apply(vocp, vocfg, jnp.swapaxes(mel01, 1, 2), ex)
        return ex.absmax

    run = jax.jit(_one)
    acc: Dict[str, np.ndarray] = {}
    for i in range(0, code_grids.shape[0], batch):
        stats = jax.device_get(run(vq_params, voc_params,
                                   code_grids[i:i + batch]))
        for k, v in stats.items():
            acc[k] = np.maximum(acc.get(k, np.float32(0.0)), np.float32(v))
    return acc


def make_qstate(vq_params, voc_params, acts: Dict[str, np.ndarray],
                transposes: Dict[str, int] = None):
    """Quantise every calibrated conv's weights and pack scales into one
    jit-arg pytree: {"acts": {path: s_x}, "w8": {path: int8 kernel},
    "ws": {path: per-out-channel f32 scale}}.

    ``transposes`` maps ConvTranspose paths to their stride ``r``; their
    kernels are rewritten to the polyphase regular-conv form first
    (ops/quant.py ``polyphase_from_transpose``)."""
    transposes = transposes or {}

    def _resolve(path: str):
        parts = path.split("/")
        node = {"vq": vq_params, "voc": voc_params}[parts[0]]
        for part in parts[1:]:
            node = node[part]
        return node

    qstate = {"acts": {}, "w8": {}, "ws": {}}
    for path, absmax in acts.items():
        kernel = _resolve(path)["kernel"]
        if path in transposes:
            kernel = polyphase_from_transpose(kernel, transposes[path])
        w8, s_w = quantize_weight(kernel)
        qstate["w8"][path] = w8
        qstate["ws"][path] = s_w
        qstate["acts"][path] = jnp.float32(max(float(absmax), 1e-12) / 127.0)
    return qstate


def build_qstate(vq_params, voc_params, vcfg: VQVAEConfig,
                 vocfg: VocoderConfig, *, n_calib: int = 32,
                 batch: int = 16, seed: int = 0,
                 int8_transpose: bool = True,
                 percentile: float = DEFAULT_PERCENTILE):
    """Calibrate on seeded uniform random code grids and build the
    qstate (the GenerationPipeline ``int8_decode`` entry point).

    ``int8_transpose`` also quantises the vocoder's ConvTranspose
    upsamples (~2/3 of vocoder FLOPs) via the polyphase rewrite; off
    leaves them in float (Int8Convs falls back per-path)."""
    rng = np.random.default_rng(seed)
    grids = jnp.asarray(rng.integers(
        0, vcfg.num_embeddings, (n_calib, vcfg.code_h, vcfg.code_w)),
        jnp.int32)
    acts = calibrate(vq_params, voc_params, vcfg, vocfg, grids, batch=batch,
                     percentile=percentile)
    tr = {f"voc/up_{i}": r for i, r in enumerate(vocfg.ratios)}
    if not int8_transpose:
        acts = {k: v for k, v in acts.items() if k not in tr}
        tr = {}
    return make_qstate(vq_params, voc_params, acts, transposes=tr)
