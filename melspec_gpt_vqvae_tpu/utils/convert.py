"""Checkpoint conversion: reference torch state_dicts -> framework pytrees.

The reference loads three frozen artifacts (SURVEY.md §5): the VQ-VAE
codebook ckpt (raw ``state_dict``, /root/reference/transformer/minGPT.py:
242-243), the MelGAN ``best_netG.pt`` + ``args.yml``
(/root/reference/callbacks/GPT_callbacks.py:66-79), and Lightning training
ckpts.  These converters map names and layouts:

  torch Conv2d   (O, I, kh, kw) -> flax kernel (kh, kw, I, O)
  torch Conv1d   (O, I, k)      -> flax kernel (k, I, O)
  torch ConvT1d  (I, O, k)      -> flax ConvTranspose(transpose_kernel=True)
                                   kernel (k, O, I)
  weight-norm (weight_g, weight_v) pairs are folded: w = g * v / ||v||.

Native checkpoints (orbax dirs) pass through unchanged, so the loaders here
accept either format.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from ..configs import VocoderConfig, VQVAEConfig


def _load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch
    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k: np.asarray(v.detach().numpy()) for k, v in obj.items()
            if hasattr(v, "detach")}


def _conv2d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _conv1d(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 1, 0))


def _convT1d(w: np.ndarray) -> np.ndarray:
    # torch (I, O, k) -> flax transpose_kernel (k, O, I)
    return np.transpose(w, (2, 1, 0))


def _fold_weight_norm(sd: Dict[str, np.ndarray],
                      prefix: str) -> np.ndarray:
    """w = g * v / ||v|| with the norm over all dims but the first
    (torch weight_norm default dim=0)."""
    g = sd[f"{prefix}.weight_g"]
    v = sd[f"{prefix}.weight_v"]
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return (g * v / norm).reshape(v.shape)


# ---------------------------------------------------------------------------
# VQ-VAE
# ---------------------------------------------------------------------------


def _conv_entry(sd, torch_name, transform=_conv2d):
    out = {"kernel": transform(sd[f"{torch_name}.weight"])}
    if f"{torch_name}.bias" in sd:
        out["bias"] = sd[f"{torch_name}.bias"]
    return out


def _gn_entry(sd, torch_name):
    return {"scale": sd[f"{torch_name}.weight"],
            "bias": sd[f"{torch_name}.bias"]}


def _resnet_block(sd, prefix: str) -> Dict[str, Any]:
    out = {
        "GroupNorm_0": _gn_entry(sd, f"{prefix}.norm1"),
        "Conv_0": _conv_entry(sd, f"{prefix}.conv1"),
        "GroupNorm_1": _gn_entry(sd, f"{prefix}.norm2"),
        "Conv_1": _conv_entry(sd, f"{prefix}.conv2"),
    }
    if f"{prefix}.nin_shortcut.weight" in sd:
        out["nin_shortcut"] = _conv_entry(sd, f"{prefix}.nin_shortcut")
    return out


def _attn_block(sd, prefix: str) -> Dict[str, Any]:
    return {
        "GroupNorm_0": _gn_entry(sd, f"{prefix}.norm"),
        "q": _conv_entry(sd, f"{prefix}.q"),
        "k": _conv_entry(sd, f"{prefix}.k"),
        "v": _conv_entry(sd, f"{prefix}.v"),
        "proj_out": _conv_entry(sd, f"{prefix}.proj_out"),
    }


def convert_vqvae_state_dict(sd: Dict[str, np.ndarray],
                             cfg: VQVAEConfig) -> Dict[str, Any]:
    """Reference ``LitVQVAE`` state_dict -> VQModel flax params
    (names per big_model_attn_gan.py: _encoder/_decoder/_vq_vae/quant_conv/
    post_quant_conv; the discriminator is not needed for inference)."""
    num_res = len(cfg.ch_mult)
    enc: Dict[str, Any] = {
        "conv_in": _conv_entry(sd, "_encoder.conv_in"),
        "mid_block_1": _resnet_block(sd, "_encoder.mid.block_1"),
        "mid_attn_1": _attn_block(sd, "_encoder.mid.attn_1"),
        "mid_block_2": _resnet_block(sd, "_encoder.mid.block_2"),
        "norm_out": _gn_entry(sd, "_encoder.norm_out"),
        "conv_out": _conv_entry(sd, "_encoder.conv_out"),
    }
    curr_res = cfg.resolution
    for i in range(num_res):
        for j in range(cfg.num_res_blocks):
            enc[f"down_{i}_block_{j}"] = _resnet_block(
                sd, f"_encoder.down.{i}.block.{j}")
            if curr_res in cfg.attn_resolutions:
                enc[f"down_{i}_attn_{j}"] = _attn_block(
                    sd, f"_encoder.down.{i}.attn.{j}")
        if i != num_res - 1:
            enc[f"down_{i}_downsample"] = {"Conv_0": _conv_entry(
                sd, f"_encoder.down.{i}.downsample.conv")}
            curr_res //= 2

    dec: Dict[str, Any] = {
        "conv_in": _conv_entry(sd, "_decoder.conv_in"),
        "mid_block_1": _resnet_block(sd, "_decoder.mid.block_1"),
        "mid_attn_1": _attn_block(sd, "_decoder.mid.attn_1"),
        "mid_block_2": _resnet_block(sd, "_decoder.mid.block_2"),
        "norm_out": _gn_entry(sd, "_decoder.norm_out"),
        "conv_out": _conv_entry(sd, "_decoder.conv_out"),
    }
    curr_res = cfg.resolution // 2 ** (num_res - 1)
    for i in reversed(range(num_res)):
        for j in range(cfg.num_res_blocks + 1):
            dec[f"up_{i}_block_{j}"] = _resnet_block(
                sd, f"_decoder.up.{i}.block.{j}")
            if curr_res in cfg.attn_resolutions:
                dec[f"up_{i}_attn_{j}"] = _attn_block(
                    sd, f"_decoder.up.{i}.attn.{j}")
        if i != 0:
            dec[f"up_{i}_upsample"] = {"Conv_0": _conv_entry(
                sd, f"_decoder.up.{i}.upsample.conv")}
            curr_res *= 2

    return {
        "encoder": enc,
        "decoder": dec,
        "quantize": {"embedding": sd["_vq_vae._embedding.weight"]},
        "quant_conv": _conv_entry(sd, "quant_conv"),
        "post_quant_conv": _conv_entry(sd, "post_quant_conv"),
    }


def load_vqvae_params(path: str, cfg: VQVAEConfig) -> Dict[str, Any]:
    """Load VQModel params from a torch .pt/.ckpt or a native orbax dir.

    Orbax leaves are restored as host numpy: a bare ``restore()`` tries to
    re-materialise the arrays with the sharding recorded at save time,
    which fails cross-backend (a CPU-saved tree restored under the remote
    TPU backend has no resolvable save-time sharding).  The callers jit
    the params onto the device themselves.
    """
    if os.path.isdir(path):
        import jax
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        ckpt = ocp.PyTreeCheckpointer()
        meta = ckpt.metadata(path).item_metadata
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray),
            getattr(meta, "tree", meta))
        tree = ckpt.restore(path, args=ocp.args.PyTreeRestore(
            restore_args=restore_args))
        return tree.get("params", tree)
    return convert_vqvae_state_dict(_load_torch_state_dict(path), cfg)


# ---------------------------------------------------------------------------
# MelGAN vocoder
# ---------------------------------------------------------------------------


def _wn_conv1d_entry(sd, prefix: str, transform=_conv1d):
    out = {"kernel": transform(_fold_weight_norm(sd, prefix))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def convert_melgan_state_dict(sd: Dict[str, np.ndarray],
                              cfg: VocoderConfig) -> Dict[str, Any]:
    """Reference ``Generator`` Sequential state_dict -> MelGANGenerator
    params.  Sequential layout (vocoder/modules.py:45-76):
    [pad, conv, (leaky, convT, res*n)*len(ratios), leaky, pad, conv, tanh].
    """
    params: Dict[str, Any] = {
        "conv_in": _wn_conv1d_entry(sd, "model.1"),
    }
    idx = 2
    for i, _r in enumerate(cfg.ratios):
        idx += 1  # LeakyReLU
        params[f"up_{i}"] = _wn_conv1d_entry(sd, f"model.{idx}", _convT1d)
        idx += 1
        for j in range(cfg.n_residual_layers):
            prefix = f"model.{idx}"
            params[f"res_{i}_{j}"] = {
                "block_conv1": _wn_conv1d_entry(sd, f"{prefix}.block.2"),
                "block_conv2": _wn_conv1d_entry(sd, f"{prefix}.block.4"),
                "shortcut": _wn_conv1d_entry(sd, f"{prefix}.shortcut"),
            }
            idx += 1
    idx += 2  # LeakyReLU, ReflectionPad
    params["conv_out"] = _wn_conv1d_entry(sd, f"model.{idx}")
    return params


def load_vocoder_params(path: str) -> Tuple[Dict[str, Any], VocoderConfig]:
    """Load MelGAN params from a reference-style dir (best_netG.pt +
    args.yml, reference load_vocoder: GPT_callbacks.py:66-79) or a native
    orbax dir."""
    if os.path.isdir(path) and os.path.exists(
            os.path.join(path, "best_netG.pt")):
        import yaml
        with open(os.path.join(path, "args.yml")) as f:
            a = yaml.unsafe_load(f)
        cfg = VocoderConfig(n_mel_channels=a.n_mel_channels, ngf=a.ngf,
                            n_residual_layers=a.n_residual_layers)
        sd = _load_torch_state_dict(os.path.join(path, "best_netG.pt"))
        return convert_melgan_state_dict(sd, cfg), cfg
    import orbax.checkpoint as ocp
    tree = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    return tree.get("params", tree), VocoderConfig()


# ---------------------------------------------------------------------------
# GPT (Lightning ckpt -> our scan-stacked tree)
# ---------------------------------------------------------------------------


def convert_gpt_state_dict(sd: Dict[str, np.ndarray], n_layer: int,
                           prefix: str = "transformer.") -> Dict[str, Any]:
    """Reference minGPT state_dict -> our stacked param tree.

    torch Linear stores (out, in); ours are (in, out).  The reference's
    separate q/k/v Linears concatenate into our fused qkv (out-dim order
    q,k,v).  Usable for ``Lit_minGPT`` ckpts (prefix 'transformer.') and
    GPT-VAE subtrees (prefix 'encoder.transformer.' etc.).
    """
    def lin_w(name):
        return np.transpose(sd[f"{prefix}{name}.weight"])

    def stack(fn):
        return np.stack([fn(i) for i in range(n_layer)])

    blocks = {
        "ln1_s": stack(lambda i: sd[f"{prefix}blocks.{i}.ln1.weight"]),
        "ln1_b": stack(lambda i: sd[f"{prefix}blocks.{i}.ln1.bias"]),
        "attn_qkv": {
            "w": stack(lambda i: np.concatenate([
                lin_w(f"blocks.{i}.attn.query"),
                lin_w(f"blocks.{i}.attn.key"),
                lin_w(f"blocks.{i}.attn.value")], axis=1)),
            "b": stack(lambda i: np.concatenate([
                sd[f"{prefix}blocks.{i}.attn.query.bias"],
                sd[f"{prefix}blocks.{i}.attn.key.bias"],
                sd[f"{prefix}blocks.{i}.attn.value.bias"]])),
        },
        "attn_proj": {
            "w": stack(lambda i: lin_w(f"blocks.{i}.attn.proj")),
            "b": stack(lambda i: sd[f"{prefix}blocks.{i}.attn.proj.bias"]),
        },
        "ln2_s": stack(lambda i: sd[f"{prefix}blocks.{i}.ln2.weight"]),
        "ln2_b": stack(lambda i: sd[f"{prefix}blocks.{i}.ln2.bias"]),
        "mlp_up": {
            "w": stack(lambda i: lin_w(f"blocks.{i}.mlp.0")),
            "b": stack(lambda i: sd[f"{prefix}blocks.{i}.mlp.0.bias"]),
        },
        "mlp_down": {
            "w": stack(lambda i: lin_w(f"blocks.{i}.mlp.2")),
            "b": stack(lambda i: sd[f"{prefix}blocks.{i}.mlp.2.bias"]),
        },
    }
    params = {
        "tok_emb": sd[f"{prefix}tok_emb.weight"],
        "pos_emb": sd[f"{prefix}pos_emb"][0],
        "blocks": blocks,
        "ln_f_s": sd[f"{prefix}ln_f.weight"],
        "ln_f_b": sd[f"{prefix}ln_f.bias"],
        "head": {"w": lin_w("head")},
    }
    if f"{prefix.split('.')[0]}.embedder.weight" in sd:
        params["class_emb"] = sd[f"{prefix.split('.')[0]}.embedder.weight"]
    elif "embedder.weight" in sd:
        params["class_emb"] = sd["embedder.weight"]
    return params
