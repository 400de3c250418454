"""int8 post-training quantisation primitives for the decode stage.

v5e's MXU runs int8 x int8 -> int32 at roughly twice the bf16 rate, and
XLA lowers int8 ``conv_general_dilated`` onto that path (measured
1.27-1.66x on the VQ-decoder/vocoder dominant shapes —
scripts/int8_conv_probe.py, BENCH_NOTES.md "int8 convolutions").  These
helpers implement the calibrated symmetric scheme used by
models/quantized.py:

  * weights: per-output-channel symmetric, ``s_w[oc] = max|w[..., oc]|/127``
    (quantised once at pipeline build; the int8 copy also shrinks the
    resident conv weights 2x vs bf16);
  * activations: per-tensor symmetric with a calibration-time absmax,
    ``s_x = absmax/127`` (scales are data-derived, not per-call, so the
    jitted program stays static);
  * compute: ``conv(int8, int8) -> int32``, dequantised as
    ``y * (s_x * s_w) + bias`` in float32, cast back to the caller dtype.

The reference has no quantisation anywhere (pure f32 torch,
/root/reference/vqvae/big_model_attn_gan.py); this is a TPU-native
inference feature, opt-in and quality-gated (see BENCH_NOTES.md).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

Padding = Union[str, int, Sequence[Tuple[int, int]]]


def quantize_weight(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-output-channel symmetric int8 quantisation of a conv kernel.

    ``w`` is HWIO/WIO (flax layout — output channels last).  Returns
    ``(w8 int8, s_w f32 (out_ch,))`` with ``w ~= w8 * s_w``.
    """
    w = w.astype(jnp.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    s = jnp.max(jnp.abs(w), axis=reduce_axes) / 127.0
    s = jnp.maximum(s, 1e-12)
    w8 = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
    return w8, s


def quantize_act(x: jnp.ndarray, s_x: jnp.ndarray) -> jnp.ndarray:
    """Per-tensor symmetric int8 quantisation with a calibrated scale."""
    y = jnp.round(x.astype(jnp.float32) / s_x)
    return jnp.clip(y, -127, 127).astype(jnp.int8)


def _dimension_numbers(n_spatial: int):
    if n_spatial == 1:
        return ("NWC", "WIO", "NWC")
    if n_spatial == 2:
        return ("NHWC", "HWIO", "NHWC")
    raise ValueError(f"unsupported spatial rank {n_spatial}")


def _norm_padding(padding: Padding, n_spatial: int):
    if padding == "VALID" or padding == 0:
        return "VALID"
    if isinstance(padding, int):
        return [(padding, padding)] * n_spatial
    return padding


def conv_float(x, kernel, bias, *, strides=None, padding: Padding = 0,
               dilation=None):
    """Plain XLA conv matching flax ``nn.Conv`` numerics for our call
    sites (no input/kernel dtype promotion surprises: callers keep x and
    kernel in the same dtype, as the pipeline does)."""
    n_sp = kernel.ndim - 2
    dn = lax.conv_dimension_numbers(x.shape, kernel.shape,
                                    _dimension_numbers(n_sp))
    y = lax.conv_general_dilated(
        x, kernel, strides or (1,) * n_sp, _norm_padding(padding, n_sp),
        rhs_dilation=dilation, dimension_numbers=dn)
    if bias is not None:
        y = y + bias.reshape((1,) * (y.ndim - 1) + (-1,))
    return y


def polyphase_from_transpose(wf: jnp.ndarray, r: int) -> jnp.ndarray:
    """Rewrite a stride-``r`` kernel-``2r`` ConvTranspose1d kernel as a
    width-2 regular conv producing ``r`` interleaved phases.

    ``wf``: (K=2r, C_out, C_in) — flax ``transpose_kernel=True`` layout.
    Returns (2, C_in, r*C_out) WIO for a stride-1 VALID conv over the
    input zero-padded by 1 on both sides; output channel ``q*C_out + o``
    is phase ``q``, so ``reshape(B, T+1, r, C_out) -> (B, (T+1)*r, C_out)``
    reconstructs the full transpose output:

        y_full[u*r + q] = x[u] * wf[q] + x[u-1] * wf[r+q]

    (only ``u - m`` in {0, 1} satisfies ``m*r + k = u*r + q`` for
    ``k < 2r``).  A regular conv rides the MXU int8 path, which the
    lhs-dilated form XLA lowers transpose convs to may not.
    """
    K, co, ci = wf.shape
    if K != 2 * r:
        raise ValueError(f"polyphase form needs kernel 2r, got {K} != 2*{r}")
    pk = jnp.stack([wf[r:2 * r], wf[0:r]])        # (2, r, C_out, C_in)
    return jnp.moveaxis(pk, 3, 1).reshape(2, ci, r * co)


def conv_transpose_polyphase(x: jnp.ndarray, wf: jnp.ndarray,
                             bias: Optional[jnp.ndarray], r: int
                             ) -> jnp.ndarray:
    """Float MelGAN upsample through the exact polyphase rewrite.

    Equals ``nn.ConvTranspose(ch, (2r,), strides=(r,), padding="VALID",
    transpose_kernel=True)`` + the torch crop (models/vocoder.py:62-72),
    computed as ONE width-2 stride-1 regular conv — a dense GEMM with
    contraction ``2*C_in`` and output ``r*C_out``.  In float this is a
    MEASURED dead end on v5e (0.74-0.86x vs the lhs-dilated lowering,
    BENCH_NOTES.md "polyphase float upsamplers"); it exists as the
    correctness anchor for the int8 polyphase path and as the recorded
    experiment.  Exactness is pinned by tests/test_quantized.py
    ``test_polyphase_matches_conv_transpose``.

    ``x``: (B, T, C_in); ``wf``: (2r, C_out, C_in) flax
    ``transpose_kernel=True`` layout.  Returns (B, T*r, C_out).
    """
    _, co, _ = wf.shape
    pk = polyphase_from_transpose(wf, r).astype(x.dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
    y = conv_float(xp, pk, None)
    b, t1, _ = y.shape
    y = y.reshape(b, t1 * r, co)
    pad = r // 2 + r % 2
    y = y[:, pad:pad + x.shape[1] * r, :]
    if bias is not None:
        y = y + bias.reshape(1, 1, -1).astype(y.dtype)
    return y


def conv_int8(x, w8, s_w, bias, s_x, *, strides=None, padding: Padding = 0,
              dilation=None, out_dtype: Optional[jnp.dtype] = None):
    """int8 x int8 -> int32 conv, dequantised to float.

    ``x`` is float (any dtype); quantised here with the calibrated
    per-tensor ``s_x``.  ``w8``/``s_w`` come from :func:`quantize_weight`.
    """
    out_dtype = out_dtype or x.dtype
    n_sp = w8.ndim - 2
    x8 = quantize_act(x, s_x)
    dn = lax.conv_dimension_numbers(x8.shape, w8.shape,
                                    _dimension_numbers(n_sp))
    y = lax.conv_general_dilated(
        x8, w8, strides or (1,) * n_sp, _norm_padding(padding, n_sp),
        rhs_dilation=dilation, dimension_numbers=dn,
        preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (s_x * s_w)
    if bias is not None:
        y = y + bias.astype(jnp.float32).reshape((1,) * (y.ndim - 1) + (-1,))
    return y.astype(out_dtype)
