"""Optimizers: minGPT-style two-group AdamW via optax masking.

The reference partitions parameters into a weight-decayed group (Linear
weights) and a non-decayed group (biases, LayerNorm/Embedding weights, the
position embedding), then builds AdamW with betas (0.9, 0.95) and weight
decay 0.01 (/root/reference/transformer/minGPT.py:618-665,
Lit_GPT_VAE.py:895-943).  Here the same partition is an ``optax.add_decayed_
weights`` mask over the param-tree paths — one optimizer, two behaviours,
no Python-side group bookkeeping.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def _path_str(path) -> str:
    return "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)


def decay_mask(params) -> Any:
    """True = apply weight decay.

    Decayed: matmul weights — ``blocks/*/w`` (qkv, proj, mlp) and ``head/w``.
    Not decayed: biases, layernorm scales/biases, tok/pos/class embeddings
    (mirrors the whitelist/blacklist walk at minGPT.py:626-649).
    """
    def is_decay(path, x):
        name = _path_str(path)
        if not name.endswith("/w"):
            return False
        return ("blocks" in name) or name.endswith("head/w")

    return jax.tree_util.tree_map_with_path(is_decay, params)


def gpt_adamw(learning_rate: float, weight_decay: float = 0.01,
              betas=(0.9, 0.95), grad_clip: float | None = None
              ) -> optax.GradientTransformation:
    """AdamW with the minGPT decay partition.

    Wrapped in ``optax.inject_hyperparams`` so the learning rate LIVES in
    the optimizer state: the runner logs the actual value (the reference
    attaches a ``LearningRateMonitor`` reading the optimizer,
    /root/reference/GPT_train.py:92) and the val-plateau decay hook
    (runner.fit_vae; reference machinery at
    callbacks/GPT_VAE_callbacks.py:456-515) can change it mid-run — and it
    round-trips through checkpoints with the rest of the opt state (the
    reference's get_lr/set_lr, Lit_GPT_VAE.py:949-953)."""
    def build(learning_rate):
        txs = []
        if grad_clip:
            txs.append(optax.clip_by_global_norm(grad_clip))
        txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1]))
        txs.append(optax.add_decayed_weights(weight_decay, mask=decay_mask))
        txs.append(optax.scale(-learning_rate))
        return optax.chain(*txs)

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def get_lr(opt_state) -> jax.Array:
    """The live learning rate from an inject_hyperparams opt state (raises
    AttributeError/KeyError for bespoke optimizers without one, e.g. the
    VQ-VAE's two plain Adams — callers fall back to the config constant)."""
    return opt_state.hyperparams["learning_rate"]


def with_lr(opt_state, lr):
    """Functionally replace the live learning rate (the reference's
    ``set_lr``, Lit_GPT_VAE.py:949-953).  Pass a device scalar derived
    from ``get_lr`` (e.g. ``get_lr(s) * 0.5``) to keep placement/sharding."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(
        lr, jnp.asarray(hp["learning_rate"]).dtype)
    return opt_state._replace(hyperparams=hp)


def make_optimizer(name: str, learning_rate: float,
                   weight_decay: float = 0.01, betas=(0.9, 0.95),
                   momentum: float = 0.0, grad_clip: float | None = None
                   ) -> optax.GradientTransformation:
    """``sgd``/``adam`` mirror the LSTM-VAE's optimizer choice
    (/root/reference/modules/Lit_vae.py:85-92: SGD with --momentum, or
    plain Adam); ``adamw`` is the minGPT two-group AdamW; ``adafactor`` is
    the TPU-native big-model option.  ``grad_clip`` is global-norm clipping
    — the reference comments it out (GPT_VAE_train.py:25,176: clip_grad
    5.0) but SGD at lr 1.0 on the LSTM VAE diverges without it (measured:
    NaN within 2 steps on TPU), so the LSTM preset turns it on."""
    if name == "adamw":
        return gpt_adamw(learning_rate, weight_decay, betas, grad_clip)
    if name not in ("adafactor", "sgd", "adam"):
        raise ValueError(f"unknown optimizer {name!r}")

    # same live-LR contract as gpt_adamw (inject_hyperparams): get_lr /
    # with_lr work uniformly across every task's optimizer state
    def build(learning_rate):
        if name == "adafactor":
            tx = optax.adafactor(learning_rate)
        elif name == "sgd":
            tx = optax.sgd(learning_rate, momentum=momentum or None)
        else:
            tx = optax.adam(learning_rate, b1=betas[0], b2=betas[1])
        if grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        return tx

    return optax.inject_hyperparams(build)(learning_rate=learning_rate)


def vqvae_adam(learning_rate: float) -> optax.GradientTransformation:
    """Adam betas (0.5, 0.9) used for both VQ-VAE optimizers
    (reference: big_model_attn_gan.py:834-844)."""
    return optax.adam(learning_rate, b1=0.5, b2=0.9)
