"""MelGAN generator vocoder (inference path).

Capability parity with /root/reference/vocoder/modules.py:38-80: weight-norm
Conv1d stem (reflection pad 3, kernel 7) -> 4 ConvTranspose1d upsample stages
with ratios [8, 8, 2, 2] (total hop 256), each followed by
``n_residual_layers`` dilated ResnetBlocks (dilation 3**j) -> LeakyReLU,
reflection pad, kernel-7 conv, tanh.

Config from the reference checkpoint's args.yml: n_mel_channels 80, ngf 32,
n_residual_layers 3 (/root/reference/vocoder/logs/vggsound/args.yml:18-22).

Weight norm is folded at load time: the reference stores (weight_g, weight_v)
pairs; a converted checkpoint carries the effective weight
w = g * v / ||v||, so inference needs no extra ops.  NWC layout (XLA-native).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import VocoderConfig


def _reflect_pad_1d(x, pad: int):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="reflect")


class MelGANResnetBlock(nn.Module):
    """(reference: vocoder/modules.py:23-36)"""

    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        h = nn.leaky_relu(x, 0.2)
        h = _reflect_pad_1d(h, self.dilation)
        h = nn.Conv(self.dim, (3,), kernel_dilation=(self.dilation,),
                    padding=0, name="block_conv1")(h)
        h = nn.leaky_relu(h, 0.2)
        h = nn.Conv(self.dim, (1,), name="block_conv2")(h)
        s = nn.Conv(self.dim, (1,), name="shortcut")(x)
        return s + h


class MelGANGenerator(nn.Module):
    """mel (B, T, 80) in [0, 1] -> waveform (B, T*256)
    (reference: vocoder/modules.py:38-80)."""

    cfg: VocoderConfig = VocoderConfig()

    @nn.compact
    def __call__(self, mel):
        cfg = self.cfg
        mult = int(2 ** len(cfg.ratios))
        x = _reflect_pad_1d(mel, 3)
        x = nn.Conv(mult * cfg.ngf, (7,), padding=0, name="conv_in")(x)

        for i, r in enumerate(cfg.ratios):
            x = nn.leaky_relu(x, 0.2)
            # torch ConvTranspose1d(k=2r, stride=r, padding=r//2 + r%2,
            # output_padding=r%2) == VALID transpose then crop.
            ch = mult * cfg.ngf // 2
            x = nn.ConvTranspose(ch, (2 * r,), strides=(r,), padding="VALID",
                                 transpose_kernel=True,
                                 name=f"up_{i}")(x)
            # torch output length = full - 2*padding + output_padding
            pad = r // 2 + r % 2
            out_pad = r % 2
            x = x[:, pad:x.shape[1] - pad + out_pad, :]
            for j in range(cfg.n_residual_layers):
                x = MelGANResnetBlock(ch, dilation=3 ** j,
                                      name=f"res_{i}_{j}")(x)
            mult //= 2

        x = nn.leaky_relu(x, 0.2)
        x = _reflect_pad_1d(x, 3)
        x = nn.Conv(1, (7,), padding=0, name="conv_out")(x)
        return jnp.tanh(x)[..., 0]


def vocode(params, mel_01: jnp.ndarray,
           cfg: VocoderConfig = VocoderConfig()) -> jnp.ndarray:
    """mel (B, 80, T) in [0, 1] (callback convention,
    /root/reference/callbacks/GPT_callbacks.py:96-102) -> wav (B, T*256)."""
    x = jnp.swapaxes(mel_01, -1, -2)  # (B, T, 80)
    return MelGANGenerator(cfg).apply({"params": params}, x)
