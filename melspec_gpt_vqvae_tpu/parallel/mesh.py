"""Device mesh + sharding rules.

The reference's only distribution mechanism is Lightning DDP
(/root/reference/GPT_VAE_train.py:166-182: ``strategy="ddp..."``,
``devices=args.gpus``, ``num_nodes=args.num_nodes``), i.e. NCCL gradient
allreduce over a data-parallel axis.  The TPU-native equivalent is a single
``jax.sharding.Mesh`` over all chips:

  * a ``data`` axis shards the batch (gradient ``psum`` is inserted by XLA
    automatically once inputs/params carry NamedShardings);
  * an optional ``model`` axis tensor-parallelises the transformer
    (Megatron-style: attention heads + MLP hidden dim sharded over ``model``)
    — beyond reference parity, but the mesh is designed for it from day one
    so larger-than-chip configs (e.g. the 40L/1472d VGGSound GPT-XL) scale
    over ICI.

Multi-host runs initialise ``jax.distributed`` before calling
``make_mesh``; the mesh spans all global devices and per-host data loading
uses ``local_batch_slice``.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_init_distributed() -> bool:
    """Initialise ``jax.distributed`` when a coordinator is configured —
    the reference's multi-node DDP path (``--num_nodes``,
    /root/reference/GPT_VAE_train.py:166-182).  No-op on single-host runs
    and when already initialised.  Returns True if a multi-process runtime
    is active after the call."""
    import os
    if jax.process_count() > 1:
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or \
            os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return jax.process_count() > 1
    return False


def parse_mesh(spec: str) -> Optional[Dict[str, int]]:
    """``"data=2,model=4"`` -> ``{"data": 2, "model": 4}`` (the CLIs'
    ``--mesh`` flag; empty string -> None -> all devices on ``data``)."""
    if not spec:
        return None
    return {k: int(v) for k, v in
            (kv.split("=") for kv in spec.split(","))}


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices=None) -> Mesh:
    """Create a mesh.  Default: all devices on the ``data`` axis.

    ``shape`` e.g. ``{"data": 4, "model": 2}``; a ``-1`` entry is inferred.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if not shape:
        shape = {DATA_AXIS: n}
    names = list(shape.keys())
    sizes = list(shape.values())
    if sizes.count(-1) > 1:
        raise ValueError("at most one -1 axis")
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = n // known
    want = int(np.prod(sizes))
    if want > n:
        raise ValueError(f"mesh shape {dict(zip(names, sizes))} > {n} devices")
    # a smaller mesh uses a device subset (the reference's --gpus semantics)
    return Mesh(devices.reshape(-1)[:want].reshape(sizes),
                axis_names=tuple(names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def replicate_stragglers(mesh: Mesh, tree):
    """Replicate over the mesh any leaf still on a SINGLE device.

    ``optimizer.init`` on a mesh-placed param tree inherits the params'
    shardings for moment leaves (computation follows data), but brand-new
    scalars (step counts, inject_hyperparams' learning_rate) materialise
    on the default device only.  That mixture is tolerated while the
    arrays are uncommitted — but a checkpoint restore ``place_like``s
    every leaf with the template's sharding, COMMITTING the mixture, and
    the first post-resume jitted step then fails on incompatible devices
    (caught by tests/test_runner.py::test_resume_continuation_*).  Leaves
    already spanning the mesh (replicated or TP/PP-sharded) pass through
    untouched — re-placing them would gather shards."""
    if mesh.size <= 1:
        return tree
    rep = replicated(mesh)

    def put(a):
        try:
            if len(a.sharding.device_set) == 1:
                return jax.device_put(a, rep)
        except AttributeError:
            pass
        return a

    return jax.tree_util.tree_map(put, tree)


def batch_sharding(mesh: Mesh, ndim: int = 2) -> NamedSharding:
    """Shard axis 0 (batch) over ``data``; replicate the rest.  On a mesh
    without a ``data`` axis (e.g. ``--mesh pipe=4``) the batch replicates —
    naming the absent axis would raise on the first ``put_batch``."""
    if DATA_AXIS not in mesh.shape:
        return NamedSharding(mesh, P())
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def put_batch(mesh: Mesh, x):
    """Form a batch-sharded global device array from this process's LOCAL
    batch rows.

    Single-process: plain ``device_put``.  Multi-process: the local array
    is one host's shard of the global batch, so
    ``jax.make_array_from_process_local_data`` assembles the (P*B, ...)
    global array — a bare ``device_put`` would instead treat the local
    array AS the global one and silently drop all but 1/P of each host's
    rows (the latent bug class real 2-process runs exist to catch)."""
    x = np.asarray(x)
    sharding = batch_sharding(mesh, max(x.ndim, 1))
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if DATA_AXIS not in mesh.shape:
        # the loader gives each process a DIFFERENT local shard; declaring
        # it replicated (the no-data-axis sharding) would silently train
        # each process on its own disjoint slice with no gradient psum
        raise ValueError(
            "multi-process run with a mesh that has no 'data' axis: "
            "per-host batch shards cannot be assembled (add data=P to "
            "--mesh, e.g. data=2,pipe=4)")
    return jax.make_array_from_process_local_data(sharding, x)


def shard_batch(mesh: Mesh, batch):
    """Device_put a pytree of host-local arrays with batch-axis sharding."""
    return jax.tree_util.tree_map(lambda x: put_batch(mesh, x), batch)


def local_batch_slice(global_batch_size: int) -> slice:
    """This host's slice of a globally-indexed batch (DDP DistributedSampler
    equivalent; reference relies on Lightning to do this)."""
    per = global_batch_size // jax.process_count()
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """rank_zero_only equivalent (reference:
    callbacks/GPT_callbacks.py:113 ``@rank_zero_only``)."""
    return jax.process_index() == 0


# ---------------------------------------------------------------------------
# GPT parameter sharding rules (Megatron-style TP over MODEL_AXIS).
# Param tree layout must match models/gpt.py::init_gpt_params.
# ---------------------------------------------------------------------------

def gpt_param_pspecs(params) -> dict:
    """PartitionSpec tree for a GPT param tree.

    Rules (2D weights are (in, out) everywhere in models/gpt.py):
      * qkv projections  (L, D, 3D) -> shard out dim (heads) over MODEL
      * attn out proj    (L, D, D)  -> shard in dim over MODEL
      * mlp up           (L, D, 4D) -> shard out dim over MODEL
      * mlp down         (L, 4D, D) -> shard in dim over MODEL
      * embeddings, layernorms, head -> replicated (vocab is tiny: 128/1024)
    """
    def spec_for(path, x):
        name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
        nd = x.ndim
        if "blocks" in name:
            if name.endswith("attn_qkv/w"):
                return P(None, None, MODEL_AXIS)
            if name.endswith("attn_qkv/b"):
                return P(None, MODEL_AXIS)
            if name.endswith("attn_proj/w"):
                return P(None, MODEL_AXIS, None)
            if name.endswith("mlp_up/w"):
                return P(None, None, MODEL_AXIS)
            if name.endswith("mlp_up/b"):
                return P(None, MODEL_AXIS)
            if name.endswith("mlp_down/w"):
                return P(None, MODEL_AXIS, None)
        return P(*([None] * nd))

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_gpt_params(mesh: Mesh, params):
    specs = gpt_param_pspecs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs)
