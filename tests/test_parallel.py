"""Multi-device semantics on the virtual 8-device CPU mesh: DP-sharded
generation and TP-sharded forward must be numerically identical to
single-device execution (the reference never tests its DDP path;
SURVEY.md §4 calls this out as the gap to close)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import GPTConfig
from melspec_gpt_vqvae_tpu.models import gpt as G
from melspec_gpt_vqvae_tpu.parallel.mesh import (batch_sharding,
                                                 gpt_param_pspecs, make_mesh,
                                                 shard_gpt_params)

CFG = GPTConfig(vocab_size=16, block_size=24, n_layer=2, n_head=4,
                n_embd=32, class_size=4)


@pytest.fixture(scope="module")
def params():
    return G.init_gpt_params(jax.random.PRNGKey(0), CFG)


def test_pspec_tree_structure(params):
    specs = gpt_param_pspecs(params)
    from jax.sharding import PartitionSpec as P
    assert specs["blocks"]["attn_qkv"]["w"] == P(None, None, "model")
    assert specs["blocks"]["attn_proj"]["w"] == P(None, "model", None)
    assert specs["blocks"]["mlp_up"]["w"] == P(None, None, "model")
    assert specs["blocks"]["mlp_down"]["w"] == P(None, "model", None)
    assert specs["tok_emb"] == P(None, None)


def test_dp_sharded_generation_matches_single_device(params):
    mesh = make_mesh({"data": 8})
    c = jnp.asarray(np.random.default_rng(0).integers(0, 4, (8,)), jnp.int32)
    cond = G.class_embed(params, c)

    ref = G.gpt_generate(params, CFG, jax.random.PRNGKey(3), cond, None,
                         steps=6, sample=False, use_pallas=False)
    cond_sharded = jax.device_put(cond, batch_sharding(mesh, 3))
    out = G.gpt_generate(params, CFG, jax.random.PRNGKey(3), cond_sharded,
                         None, steps=6, sample=False, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_tp_sharded_forward_matches_replicated(params):
    mesh = make_mesh({"data": 2, "model": 4})
    x = jnp.asarray(np.random.default_rng(1).integers(0, 16, (4, 10)),
                    jnp.int32)
    ref, _ = G.gpt_apply(params, CFG, x, use_pallas=False)

    sharded = shard_gpt_params(mesh, params)
    out, _ = jax.jit(lambda p, x: G.gpt_apply(p, CFG, x, use_pallas=False))(
        sharded, jax.device_put(x, batch_sharding(mesh, 2)))
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_tp_sharded_generation_matches_replicated(params):
    """Model-axis (TP) sharded KV-cached decode: params sharded
    Megatron-style, the (L, B, H, T, hd) cache sharded over heads by GSPMD
    propagation — greedy tokens must equal single-device generation, for
    the f32 AND the int8-cache + int8-weight serving paths."""
    mesh = make_mesh({"data": 2, "model": 4})
    c = jnp.asarray(np.random.default_rng(0).integers(0, 4, (8,)), jnp.int32)
    cond = G.class_embed(params, c)
    sharded = shard_gpt_params(mesh, params)
    cond_sharded = jax.device_put(cond, batch_sharding(mesh, 3))

    for cfg in (CFG, CFG.replace(cache_dtype="int8",
                                 decode_weight_dtype="int8")):
        ref = G.gpt_generate(params, cfg, jax.random.PRNGKey(3), cond, None,
                             steps=6, sample=False, use_pallas=False)
        out = G.gpt_generate(sharded, cfg, jax.random.PRNGKey(3),
                             cond_sharded, None, steps=6, sample=False,
                             use_pallas=False)
        np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_tp_generation_shards_memory(params):
    """Per-device footprint must drop when the model axis grows (the cache
    shards over heads, the weights over the TP dims) — this is what lets
    the XL decoder run B>=256 per 2-chip group (xl_decode_bench
    --project_tp)."""
    import functools
    c = jnp.asarray(np.zeros((8,)), jnp.int32)
    cond = G.class_embed(params, c)

    def mem(shape):
        mesh = make_mesh(shape)
        ps = shard_gpt_params(mesh, params)
        conds = jax.device_put(cond, batch_sharding(mesh, 3))
        fn = functools.partial(
            G.gpt_generate.__wrapped__, cfg=CFG, steps=8, temperature=1.0,
            top_k=None, sample=False, use_pallas=False, segments=1)
        comp = jax.jit(lambda p, k, co: fn(p, key=k, cond_emb=co,
                                           given=None)) \
            .lower(ps, jax.random.PRNGKey(0), conds).compile()
        ma = comp.memory_analysis()
        return ma.argument_size_in_bytes

    args_dp = mem({"data": 8, "model": 1})
    args_tp = mem({"data": 2, "model": 4})
    assert args_tp < 0.55 * args_dp, (args_dp, args_tp)


def test_tp_sharded_train_step_runs(params):
    """Grads + AdamW update under dp x tp shardings execute and stay finite
    (the dryrun_multichip path, in-suite)."""
    import optax

    from melspec_gpt_vqvae_tpu.training.gpt_task import gpt_loss_fn
    from melspec_gpt_vqvae_tpu.training.optim import gpt_adamw

    mesh = make_mesh({"data": 4, "model": 2})
    p = shard_gpt_params(mesh, params)
    opt = gpt_adamw(1e-3)
    opt_state = opt.init(p)
    rng = np.random.default_rng(2)
    x = jax.device_put(jnp.asarray(rng.integers(0, 16, (8, 23)), jnp.int32),
                       batch_sharding(mesh, 2))
    c = jax.device_put(jnp.asarray(rng.integers(0, 4, (8,)), jnp.int32),
                       batch_sharding(mesh, 1))

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(
            lambda q: gpt_loss_fn(q, CFG, x, c, jax.random.PRNGKey(0),
                                  train=True, use_pallas=False))(p)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    p2, opt_state, loss = step(p, opt_state)
    assert np.isfinite(float(loss))
    # params moved
    assert not np.allclose(np.asarray(p2["head"]["w"]),
                           np.asarray(params["head"]["w"]))

def test_tp_task_init_state_shards_and_matches_dp():
    """GPTTask/VAETask on a mesh WITH a model axis must actually TP-shard
    the weights (regression: init_state used to replicate them, silently
    wasting --mesh model=N), and the first train-step loss must match the
    data-parallel task."""
    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               TrainConfig, VAEConfig)
    from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask
    from melspec_gpt_vqvae_tpu.training.vae_task import VAETask

    cfg = CFG.replace(embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
                      block_size=21)
    rng = np.random.default_rng(3)
    batch = {"codes": rng.integers(0, 16, (8, 5, 4)).astype(np.int32),
             "target": rng.integers(0, 4, (8, 1)).astype(np.int32)}
    exp = ExperimentConfig(model=cfg,
                           train=TrainConfig(learning_rate=1e-3, epochs=1,
                                             batch_size=8),
                           data=DataConfig(batch_size=8))

    plain = GPTTask(exp, make_mesh({"data": 2}))
    _, ref_loss = plain.train_step(plain.init_state(0), batch,
                                   jax.random.PRNGKey(5))

    tp = GPTTask(exp, make_mesh({"data": 2, "model": 4}))
    st = tp.init_state(0)
    qkv = st["params"]["blocks"]["attn_qkv"]["w"]
    assert "model" in str(qkv.sharding.spec), qkv.sharding
    st, tp_loss = tp.train_step(st, batch, jax.random.PRNGKey(5))
    assert abs(float(ref_loss) - float(tp_loss)) < 1e-5

    vexp = ExperimentConfig(model=cfg, vae=VAEConfig(nz=32, warm_up=2),
                            train=TrainConfig(learning_rate=1e-3, epochs=1,
                                              batch_size=8),
                            data=DataConfig(batch_size=8))
    vplain = VAETask(vexp, steps_per_epoch=4, mesh=make_mesh({"data": 2}))
    _, vref, _ = vplain.train_step(vplain.init_state(0), batch,
                                   jax.random.PRNGKey(5))
    vtp = VAETask(vexp, steps_per_epoch=4,
                  mesh=make_mesh({"data": 2, "model": 4}))
    vst = vtp.init_state(0)
    enc_qkv = vst["params"]["encoder"]["blocks"]["attn_qkv"]["w"]
    assert "model" in str(enc_qkv.sharding.spec), enc_qkv.sharding
    vst, vtp_loss, _ = vtp.train_step(vst, batch, jax.random.PRNGKey(5))
    assert abs(float(vref) - float(vtp_loss)) < 1e-4, \
        (float(vref), float(vtp_loss))


def test_place_like_preserves_tp_sharding_on_restore(params):
    """Resume must keep the task's mesh placement: place_like re-places
    restored host-numpy leaves with the template state's shardings
    (regression — raw numpy handed to the jitted step let jit re-place
    everything, silently dropping TP/PP layout)."""
    from melspec_gpt_vqvae_tpu.training.checkpoint import place_like

    mesh = make_mesh({"data": 2, "model": 4})
    sharded = shard_gpt_params(mesh, params)
    host = jax.tree_util.tree_map(np.asarray, sharded)
    placed = place_like(host, sharded)
    for path, leaf in jax.tree_util.tree_leaves_with_path(placed):
        want = dict(jax.tree_util.tree_leaves_with_path(sharded))[path]
        assert leaf.sharding == want.sharding, jax.tree_util.keystr(path)
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(want))


def test_put_batch_rejects_multiprocess_dataless_mesh(monkeypatch):
    """Multi-process + a mesh with no data axis must raise: the loader
    gives each process a different shard, and declaring it replicated
    would silently train each process on its own slice (no gradient
    psum)."""
    from melspec_gpt_vqvae_tpu.parallel import mesh as M

    m = make_mesh({"pipe": 4})
    monkeypatch.setattr(M.jax, "process_count", lambda: 2)
    with pytest.raises(ValueError, match="no 'data' axis"):
        M.put_batch(m, np.zeros((8, 4), np.float32))
