"""SpecVQGAN-style VQ-VAE: conv encoder/decoder + attention + quantiser.

Capability parity with /root/reference/vqvae/big_model_attn_gan.py:
  * ``Encoder``/``Decoder`` — ch=128, ch_mult (1,1,2,2,4) => 16x downsample,
    GroupNorm(32)+swish ResnetBlocks, single-head 2D self-attention at
    resolution 53 (reference :190-392);
  * ``VectorQuantizer`` — L2-argmin encoding, straight-through estimator,
    commitment cost 0.25, perplexity + usage counts (reference :8-71);
  * ``VQModel`` — quant_conv/post_quant_conv 1x1 wrappers and the
    encode/decode/decode_code/forward surface of ``LitVQVAE``
    (reference :538-634);
  * GAN training pieces — PatchGAN ``NLayerDiscriminator``, hinge loss and
    the adaptive generator weight (reference :465-514, 643-660).

TPU-first notes: NHWC layout throughout (XLA's native conv layout on TPU),
the VQ nearest-neighbour runs through the fused Pallas kernel
(ops/vq.py), and the quantiser is a pure function of (codebook, latents) so
the straight-through gradient falls out of ``stop_gradient`` algebra.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..configs import VQVAEConfig
from ..ops.vq import vq_lookup, vq_nearest_index


def swish(x):
    return x * jax.nn.sigmoid(x)


def _group_norm(c: int) -> nn.GroupNorm:
    """GroupNorm(32) at reference widths (>=128 ch); clamps the group count
    for scaled-down test configs."""
    return nn.GroupNorm(num_groups=min(32, c), epsilon=1e-6)


class ResnetBlock(nn.Module):
    """GroupNorm-swish-conv x2 with 1x1 shortcut on channel change
    (reference: big_model_attn_gan.py:75-135; temb is always None there)."""

    out_channels: Optional[int] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_channels or in_ch
        h = _group_norm(x.shape[-1])(x)
        h = swish(h)
        h = nn.Conv(out_ch, (3, 3), padding=1)(h)
        h = _group_norm(h.shape[-1])(h)
        h = swish(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(out_ch, (3, 3), padding=1)(h)
        if in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), name="nin_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head 2D self-attention over all (H*W) positions
    (reference: big_model_attn_gan.py:397-450)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hn = _group_norm(c)(x)
        q = nn.Conv(c, (1, 1), name="q")(hn).reshape(b, h * w, c)
        k = nn.Conv(c, (1, 1), name="k")(hn).reshape(b, h * w, c)
        v = nn.Conv(c, (1, 1), name="v")(hn).reshape(b, h * w, c)
        att = jnp.einsum("bic,bjc->bij", q, k,
                         preferred_element_type=jnp.float32)
        att = jax.nn.softmax(att * (c ** -0.5), axis=2)
        out = jnp.einsum("bij,bjc->bic", att.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = nn.Conv(c, (1, 1), name="proj_out")(out.reshape(b, h, w, c)
                                                  .astype(x.dtype))
        return x + out


class Downsample(nn.Module):
    """Asymmetric-pad stride-2 conv (reference: big_model_attn_gan.py:145-162
    pads (0,1,0,1), i.e. one pixel on the right/bottom)."""

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(x.shape[-1], (3, 3), strides=(2, 2), padding=0)(x)


class Upsample(nn.Module):
    """Nearest 2x + conv (reference: big_model_attn_gan.py:171-186)."""

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(c, (3, 3), padding=1)(x)


class Encoder(nn.Module):
    """(B, H, W, 1) -> (B, H/16, W/16, z_channels)
    (reference: big_model_attn_gan.py:190-282)."""

    cfg: VQVAEConfig

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        cfg = self.cfg
        curr_res = cfg.resolution
        h = nn.Conv(cfg.ch, (3, 3), padding=1, name="conv_in")(x)
        num_res = len(cfg.ch_mult)
        for i_level in range(num_res):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(block_out, cfg.dropout,
                                name=f"down_{i_level}_block_{i_block}")(
                                    h, train=train)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"down_{i_level}_attn_{i_block}")(h)
            if i_level != num_res - 1:
                h = Downsample(name=f"down_{i_level}_downsample")(h)
                curr_res //= 2
        h = ResnetBlock(dropout=cfg.dropout, name="mid_block_1")(h, train=train)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(dropout=cfg.dropout, name="mid_block_2")(h, train=train)
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6, name="norm_out")(h)
        h = swish(h)
        out_ch = 2 * cfg.z_channels if cfg.double_z else cfg.z_channels
        return nn.Conv(out_ch, (3, 3), padding=1, name="conv_out")(h)


class Decoder(nn.Module):
    """(B, h, w, z_channels) -> (B, H, W, 1)
    (reference: big_model_attn_gan.py:291-392)."""

    cfg: VQVAEConfig

    @nn.compact
    def __call__(self, z, *, train: bool = False):
        cfg = self.cfg
        num_res = len(cfg.ch_mult)
        curr_res = cfg.resolution // 2 ** (num_res - 1)
        block_in = cfg.ch * cfg.ch_mult[-1]
        h = nn.Conv(block_in, (3, 3), padding=1, name="conv_in")(z)
        h = ResnetBlock(dropout=cfg.dropout, name="mid_block_1")(h, train=train)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(dropout=cfg.dropout, name="mid_block_2")(h, train=train)
        for i_level in reversed(range(num_res)):
            block_out = cfg.ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = ResnetBlock(block_out, cfg.dropout,
                                name=f"up_{i_level}_block_{i_block}")(
                                    h, train=train)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        h = nn.GroupNorm(num_groups=min(32, h.shape[-1]), epsilon=1e-6, name="norm_out")(h)
        h = swish(h)
        return nn.Conv(cfg.out_ch, (3, 3), padding=1, name="conv_out")(h)


class VectorQuantizer(nn.Module):
    """Codebook + L2-argmin quantisation
    (reference: big_model_attn_gan.py:8-71).

    ``__call__`` takes NHWC latents and returns
    (loss, quantised_straight_through, (perplexity, indices)).
    """

    num_embeddings: int
    embedding_dim: int
    commitment_cost: float = 0.25

    def setup(self):
        init = nn.initializers.uniform(scale=2.0 / self.num_embeddings)
        # torch init is U(-1/K, 1/K); flax uniform is U(0, scale) so shift.
        self.embedding = self.param(
            "embedding",
            lambda k, s: init(k, s) - 1.0 / self.num_embeddings,
            (self.num_embeddings, self.embedding_dim))

    def __call__(self, z):
        b, h, w, c = z.shape
        flat = z.reshape(-1, self.embedding_dim)
        idx = vq_nearest_index(flat, self.embedding)
        quant = vq_lookup(idx, self.embedding).reshape(z.shape)

        e_latent_loss = jnp.mean((jax.lax.stop_gradient(quant) - z) ** 2)
        q_latent_loss = jnp.mean((quant - jax.lax.stop_gradient(z)) ** 2)
        loss = q_latent_loss + self.commitment_cost * e_latent_loss

        quant_st = z + jax.lax.stop_gradient(quant - z)
        onehot_mean = jnp.mean(
            jax.nn.one_hot(idx, self.num_embeddings, dtype=jnp.float32),
            axis=0)
        perplexity = jnp.exp(-jnp.sum(
            onehot_mean * jnp.log(onehot_mean + 1e-10)))
        return loss, quant_st, (perplexity, idx.reshape(b, h, w))

    def get_codebook_entry(self, indices, shape=None):
        """indices (N,) -> latents; shape (b, h, w, c) NHWC
        (reference: big_model_attn_gan.py:56-71)."""
        z_q = vq_lookup(indices, self.embedding)
        if shape is not None:
            z_q = z_q.reshape(shape)
        return z_q


class VQModel(nn.Module):
    """``LitVQVAE`` equivalent (reference: big_model_attn_gan.py:538-634).

    Methods are exposed via ``nn.Module.apply(..., method=...)``:
    encode / decode / decode_code / __call__.
    """

    cfg: VQVAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg, name="encoder")
        self.decoder = Decoder(self.cfg, name="decoder")
        self.quantize = VectorQuantizer(self.cfg.num_embeddings,
                                        self.cfg.embedding_dim,
                                        self.cfg.commitment_cost,
                                        name="quantize")
        self.quant_conv = nn.Conv(self.cfg.embedding_dim, (1, 1),
                                  name="quant_conv")
        self.post_quant_conv = nn.Conv(self.cfg.z_channels, (1, 1),
                                       name="post_quant_conv")

    def encode(self, x, *, train: bool = False):
        """x (B, H, W, 1) -> pre-quant latents (B, h, w, emb_dim)."""
        return self.quant_conv(self.encoder(x, train=train))

    def encode_to_indices(self, x):
        """x -> code grid (B, h, w) int32 — the extract_codes path
        (reference: feature_extraction/extract_codes.py:48-50)."""
        z = self.encode(x)
        _, _, (_, idx) = self.quantize(z)
        return idx

    def decode(self, quant, *, train: bool = False):
        return self.decoder(self.post_quant_conv(quant), train=train)

    def decode_code(self, code_grid, *, train: bool = False):
        """(B, h, w) indices -> reconstruction
        (reference ``decode_code`` + ``get_codebook_entry``)."""
        b, h, w = code_grid.shape
        quant = self.quantize.get_codebook_entry(
            code_grid.reshape(-1), (b, h, w, self.cfg.embedding_dim))
        return self.decode(quant, train=train)

    def __call__(self, x, *, train: bool = False):
        z = self.encode(x, train=train)
        loss, quant, info = self.quantize(z)
        recon = self.decode(quant, train=train)
        return loss, recon, info


# ---------------------------------------------------------------------------
# PatchGAN discriminator + GAN losses (training path)
# ---------------------------------------------------------------------------


class NLayerDiscriminator(nn.Module):
    """PatchGAN (reference: big_model_attn_gan.py:465-514)."""

    ndf: int = 64
    n_layers: int = 3

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        h = nn.Conv(self.ndf, (4, 4), strides=(2, 2), padding=1)(x)
        h = nn.leaky_relu(h, 0.2)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2 ** n, 8)
            h = nn.Conv(self.ndf * nf, (4, 4), strides=(2, 2), padding=1,
                        use_bias=False)(h)
            h = nn.BatchNorm(use_running_average=not train)(h)
            h = nn.leaky_relu(h, 0.2)
        nf = min(2 ** self.n_layers, 8)
        h = nn.Conv(self.ndf * nf, (4, 4), strides=(1, 1), padding=1,
                    use_bias=False)(h)
        h = nn.BatchNorm(use_running_average=not train)(h)
        h = nn.leaky_relu(h, 0.2)
        return nn.Conv(1, (4, 4), strides=(1, 1), padding=1)(h)


def hinge_d_loss(logits_real, logits_fake):
    """(reference: big_model_attn_gan.py:643-647)"""
    loss_real = jnp.mean(jax.nn.relu(1.0 - logits_real))
    loss_fake = jnp.mean(jax.nn.relu(1.0 + logits_fake))
    return 0.5 * (loss_real + loss_fake)


def adaptive_gan_weight(nll_grad_norm, g_grad_norm, disc_weight,
                        min_w=0.0, max_w=1e4):
    """d_weight = |∇nll| / (|∇g| + 1e-4), clipped
    (reference: big_model_attn_gan.py:649-660).  Callers compute the two
    gradient norms w.r.t. the decoder's last conv kernel with ``jax.grad``
    over sliced losses."""
    w = nll_grad_norm / (g_grad_norm + 1e-4)
    return jnp.clip(w, min_w, max_w) * disc_weight


def codebook_usage_counts(indices, num_embeddings: int) -> jnp.ndarray:
    """Histogram of code usage (reference counters:
    big_model_attn_gan.py:581,630-633,795-804)."""
    return jnp.bincount(indices.reshape(-1), length=num_embeddings)
