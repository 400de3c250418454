"""GPipe-style pipeline parallelism over the scan-stacked GPT block stack.

The reference's only distribution mechanism is data-parallel DDP
(/root/reference/GPT_VAE_train.py:166-182).  Pipeline parallelism is the
beyond-reference scaling axis for larger-than-chip models (the VGGSound
GPT-XL decoder needs bf16+Adafactor tricks to fit one 16 GB chip —
BENCH_NOTES.md): split the layer stack into S stages, one per device along
a ``pipe`` mesh axis, and stream M microbatches through them.

TPU-native design (scaling-book pipelining recipe, not a torch.distributed
port):

  * ``models/gpt.py`` already stores the L transformer blocks as stacked
    ``(L, ...)`` leaves scanned by ``lax.scan``.  Sharding that leading
    axis over ``pipe`` IS the stage decomposition — each device holds a
    contiguous ``(L/S, ...)`` slab, no resharding or reshaping at rest.
  * The schedule runs inside ``shard_map``: each tick every stage applies
    its local layers (the same remat-wrapped block body ``gpt_apply``
    scans), then activations hop stage->stage with ``lax.ppermute`` — a
    nearest-neighbour ICI exchange, the cheapest collective on a TPU
    torus.
  * ``jax.grad`` differentiates straight through the schedule: the
    transpose of ``ppermute`` is the reverse permute, so the backward pass
    is automatically the mirrored pipeline (GPipe), with activation
    memory controlled by the same ``cfg.remat`` policy as the sequential
    path.
  * Composes with the ``data`` axis (batch sharded outside shard_map);
    the ``model`` (tensor-parallel) axis is intentionally NOT combined
    with ``pipe`` here — at reference scale 2-way TP plus dp covers every
    config that fits, and pp covers the ones that don't.

Bubble fraction is the usual (S-1)/(M+S-1); callers pick ``n_micro``
(default 2*S) to trade bubble for per-microbatch MXU efficiency.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..configs import GPTConfig
from ..models.gpt import (Params, _dropout, _layer_norm, _raw_key_zeros,
                          class_embed, cross_entropy_loss, embed_tokens,
                          make_block_body)
from .mesh import DATA_AXIS

PIPE_AXIS = "pipe"


def gpt_param_pp_pspecs(params) -> dict:
    """PartitionSpec tree for pipeline-parallel GPT params: every stacked
    ``blocks`` leaf shards its leading (layer) axis over ``pipe``; all
    other leaves (embeddings, final LN, head) are replicated."""
    def spec_for(path, x):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p)
                        for p in path)
        if "blocks" in name:
            return P(PIPE_AXIS, *([None] * (x.ndim - 1)))
        return P(*([None] * x.ndim))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_gpt_params_pp(mesh: Mesh, params):
    """Device_put a GPT param tree with stage-sharded blocks."""
    specs = gpt_param_pp_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)


def _pipeline_stack(x, blocks, layer_rngs, *, mesh: Mesh, cfg: GPTConfig,
                    n_micro: int, train: bool, use_pallas):
    """Run the L-layer block stack over the ``pipe`` axis of ``mesh``.

    x: (B, T, D) with B sharded over ``data`` (or replicated);
    blocks: stacked (L, ...) leaves sharded over ``pipe`` on axis 0;
    layer_rngs: (ndata, M, L, 3, key_w) per-data-shard per-microbatch
    per-layer dropout keys (leading axis sharded over ``data`` so each
    data shard draws independent masks).
    Returns (B, T, D), replicated over ``pipe``.
    """
    n_stages = mesh.shape[PIPE_AXIS]
    if cfg.n_layer % n_stages != 0:
        raise ValueError(f"n_layer {cfg.n_layer} not divisible by "
                         f"pipe={n_stages}")
    body = make_block_body(cfg, train=train, use_pallas=use_pallas)

    has_data = DATA_AXIS in mesh.shape
    x_spec = P(DATA_AXIS) if has_data else P()
    blocks_specs = jax.tree_util.tree_map(
        lambda l: P(PIPE_AXIS, *([None] * (l.ndim - 1))), blocks)
    # (ndata, M, L, 3, w): data-shard slab x stage slab of layers
    rngs_spec = P(DATA_AXIS if has_data else None, None, PIPE_AXIS)

    def staged(xl, blocks_loc, rngs_loc):
        # xl: (Bl, T, D) local batch rows (replicated over pipe);
        # blocks_loc: (L/S, ...); rngs_loc: (1, M, L/S, 3, w)
        rngs_loc = rngs_loc[0]
        stage = jax.lax.axis_index(PIPE_AXIS)
        S, M = n_stages, n_micro
        bl, t, d = xl.shape
        if bl % M != 0:
            raise ValueError(f"local batch {bl} not divisible by "
                             f"n_micro={M}")
        mb = xl.reshape(M, bl // M, t, d)

        def local_layers(state, r):
            def scan_body(carry, xs):
                p, rr = xs
                out, _ = body(carry, p, rr)
                return out, None
            state, _ = jax.lax.scan(scan_body, state, (blocks_loc, r))
            return state

        def tick(carry, tk):
            state, ybuf = carry
            # stage 0 injects microbatch tk (re-injects the last one
            # during drain ticks; those results are never collected)
            inj = mb[jnp.minimum(tk, M - 1)]
            state = jnp.where(stage == 0, inj, state)
            mb_id = jnp.clip(tk - stage, 0, M - 1)
            state = local_layers(state, rngs_loc[mb_id])
            # the last stage finishes microbatch tk-(S-1) at tick tk
            out_i = tk - (S - 1)
            valid = jnp.logical_and(stage == S - 1, out_i >= 0)
            oi = jnp.clip(out_i, 0, M - 1)
            ybuf = ybuf.at[oi].set(jnp.where(valid, state, ybuf[oi]))
            state = jax.lax.ppermute(
                state, PIPE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            return (state, ybuf), None

        carry0 = (jnp.zeros_like(mb[0]), jnp.zeros_like(mb))
        (_, ybuf), _ = jax.lax.scan(tick, carry0, jnp.arange(M + S - 1))
        # only the last stage holds real outputs; psum replicates them
        # across pipe so the out_spec (no pipe axis) is honest
        y = jax.lax.psum(
            jnp.where(stage == S - 1, ybuf, jnp.zeros_like(ybuf)), PIPE_AXIS)
        return y.reshape(bl, t, d)

    fn = jax.shard_map(staged, mesh=mesh,
                       in_specs=(x_spec, blocks_specs, rngs_spec),
                       out_specs=x_spec, check_vma=False)
    return fn(x, blocks, layer_rngs)


def gpt_apply_pp(params: Params, cfg: GPTConfig, idx: Optional[jnp.ndarray],
                 cond_emb: Optional[jnp.ndarray] = None, *, mesh: Mesh,
                 n_micro: int = 0, train: bool = False,
                 rng: Optional[jax.Array] = None, use_pallas=None):
    """Pipeline-parallel ``gpt_apply`` (logits only; attention maps are a
    media/eval path and stay on the sequential forward).

    Numerics match ``gpt_apply`` exactly at eval (same block body, same
    layer order); under train the per-layer dropout keys are additionally
    folded per-microbatch, so masks differ from the sequential batch run
    (equally valid samples of the same Bernoulli process).
    """
    if PIPE_AXIS not in mesh.shape:
        raise ValueError("mesh has no 'pipe' axis")
    n_micro = int(n_micro) or 2 * mesh.shape[PIPE_AXIS]
    x = embed_tokens(params, cfg, idx, cond_emb)

    train = bool(train) and rng is not None
    ndata = dict(mesh.shape).get(DATA_AXIS, 1)
    if train:
        rng, drop_rng = jax.random.split(rng)
        x = _dropout(x, cfg.embd_pdrop, drop_rng, train)
        # leading ndata axis shards over ``data`` so each data shard
        # applies independent dropout masks (a replicated key tree would
        # drop the same elements of different examples on every shard)
        layer_rngs = jax.random.split(
            rng, ndata * n_micro * cfg.n_layer * 3).reshape(
            ndata, n_micro, cfg.n_layer, 3, -1)
    else:
        layer_rngs = _raw_key_zeros((ndata, n_micro, cfg.n_layer, 3))

    x = _pipeline_stack(x, params["blocks"], layer_rngs, mesh=mesh, cfg=cfg,
                        n_micro=n_micro, train=train, use_pallas=use_pallas)
    x = _layer_norm(x, params["ln_f_s"], params["ln_f_b"])
    return x @ params["head"]["w"]


def gpt_pp_loss_fn(params, cfg: GPTConfig, x: jnp.ndarray, c: jnp.ndarray,
                   mesh: Mesh, n_micro: int = 0,
                   rng: Optional[jax.Array] = None,
                   train: bool = False, use_pallas=None) -> jnp.ndarray:
    """Pipeline-parallel twin of ``training.gpt_task.gpt_loss_fn``
    (conditioned next-token CE, reference: minGPT.py:260-285, 413-417)."""
    cond = class_embed(params, c)
    logits = gpt_apply_pp(params, cfg, x[:, :-1], cond, mesh=mesh,
                          n_micro=n_micro, train=train, rng=rng,
                          use_pallas=use_pallas)
    logits = logits[:, cond.shape[1] - 1:]
    return cross_entropy_loss(logits, x)
