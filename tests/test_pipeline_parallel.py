"""Pipeline-parallel stack (parallel/pipeline.py) on the virtual 8-device
CPU mesh: the GPipe schedule must be numerically identical to the
sequential ``lax.scan`` forward, and its gradients must match too (the
backward rides the transposed ppermute schedule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from melspec_gpt_vqvae_tpu.configs import GPTConfig
from melspec_gpt_vqvae_tpu.models import gpt as G
from melspec_gpt_vqvae_tpu.parallel.mesh import batch_sharding, make_mesh
from melspec_gpt_vqvae_tpu.parallel import pipeline as PP

CFG = GPTConfig(vocab_size=16, block_size=24, n_layer=8, n_head=4,
                n_embd=32, class_size=4)


@pytest.fixture(scope="module")
def params():
    return G.init_gpt_params(jax.random.PRNGKey(0), CFG)


def _inputs(b=8, t=12):
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.integers(0, CFG.vocab_size, (b, t)), jnp.int32)
    c = jnp.asarray(rng.integers(0, CFG.class_size, (b,)), jnp.int32)
    return x, c


def test_pp_pspecs(params):
    specs = PP.gpt_param_pp_pspecs(params)
    assert specs["blocks"]["attn_qkv"]["w"] == P("pipe", None, None)
    assert specs["blocks"]["ln1_s"] == P("pipe", None)
    assert specs["tok_emb"] == P(None, None)
    assert specs["head"]["w"] == P(None, None)


@pytest.mark.parametrize("mesh_shape,n_micro", [
    ({"data": 2, "pipe": 4}, 2),
    ({"pipe": 8}, 4),
    ({"data": 2, "pipe": 4}, 1),
])
def test_pp_forward_matches_sequential(params, mesh_shape, n_micro):
    mesh = make_mesh(mesh_shape)
    x, c = _inputs()
    cond = G.class_embed(params, c)
    ref, _ = G.gpt_apply(params, CFG, x, cond, use_pallas=False)

    sharded = PP.shard_gpt_params_pp(mesh, params)
    if "data" in mesh_shape:
        x_in = jax.device_put(x, batch_sharding(mesh, 2))
    else:
        x_in = x
    out = jax.jit(lambda p, xx, cc: PP.gpt_apply_pp(
        p, CFG, xx, G.class_embed(p, cc), mesh=mesh, n_micro=n_micro,
        use_pallas=False))(sharded, x_in, c)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_pp_loss_and_grads_match_sequential(params):
    from melspec_gpt_vqvae_tpu.training.gpt_task import gpt_loss_fn
    mesh = make_mesh({"data": 2, "pipe": 4})
    x, c = _inputs()

    ref_l, ref_g = jax.value_and_grad(
        lambda p: gpt_loss_fn(p, CFG, x, c, use_pallas=False))(params)

    sharded = PP.shard_gpt_params_pp(mesh, params)
    xs = jax.device_put(x, batch_sharding(mesh, 2))
    cs = jax.device_put(c, batch_sharding(mesh, 1))
    pp_l, pp_g = jax.jit(jax.value_and_grad(
        lambda p: PP.gpt_pp_loss_fn(p, CFG, xs, cs, mesh, n_micro=2,
                                    use_pallas=False)))(sharded)

    np.testing.assert_allclose(float(ref_l), float(pp_l), atol=1e-5)
    flat_r = jax.tree_util.tree_leaves_with_path(ref_g)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(pp_g))
    for path, leaf in flat_r:
        got = flat_p[path]
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(got), atol=5e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pp_train_dropout_runs(params):
    mesh = make_mesh({"data": 2, "pipe": 4})
    cfg = CFG.replace(embd_pdrop=0.1, attn_pdrop=0.1, resid_pdrop=0.1)
    x, c = _inputs()
    sharded = PP.shard_gpt_params_pp(mesh, params)
    loss = jax.jit(lambda p, k: PP.gpt_pp_loss_fn(
        p, cfg, x, c, mesh, n_micro=2, rng=k, train=True,
        use_pallas=False))(sharded, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))


def test_pp_remat_matches(params):
    cfg = CFG.replace(remat=True, remat_policy="attn")
    mesh = make_mesh({"pipe": 4})
    x, c = _inputs(b=4)
    cond = G.class_embed(params, c)
    ref, _ = G.gpt_apply(params, cfg, x, cond, use_pallas=False)
    sharded = PP.shard_gpt_params_pp(mesh, params)
    out = jax.jit(lambda p: PP.gpt_apply_pp(
        p, cfg, x, G.class_embed(p, c), mesh=mesh, n_micro=2,
        use_pallas=False))(sharded)
    np.testing.assert_allclose(np.asarray(ref), np.asarray(out), atol=2e-5)


def test_pp_task_train_step_matches_dp():
    """GPTTask auto-switches to the pipeline loss on a pipe mesh; with
    dropout off, the first train-step loss equals the data-parallel
    task's (same init seed, same batch)."""
    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               TrainConfig)
    from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask

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
    st = plain.init_state(0)
    _, ref_loss = plain.train_step(st, batch, jax.random.PRNGKey(5))

    pp = GPTTask(exp, make_mesh({"data": 2, "pipe": 4}), pp_micro=2)
    assert pp.pp
    st2 = pp.init_state(0)
    st2, pp_loss = pp.train_step(st2, batch, jax.random.PRNGKey(5))
    assert abs(float(ref_loss) - float(pp_loss)) < 1e-5
    ev = pp.eval_step(st2, batch)
    assert np.isfinite(float(ev))


def test_pp_vae_task_matches_dp():
    """VAETask on a pipe mesh: both GPT stacks (encoder + decoder) run the
    pipeline schedule; with dropout off the first train-step loss matches
    the data-parallel task bit-for-bit in spirit (same keys, same math)."""
    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               TrainConfig, VAEConfig)
    from melspec_gpt_vqvae_tpu.training.vae_task import VAETask

    cfg = GPTConfig(vocab_size=16, block_size=21, n_layer=4, n_head=4,
                    n_embd=32, embd_pdrop=0.0, attn_pdrop=0.0,
                    resid_pdrop=0.0)
    rng = np.random.default_rng(11)
    batch = {"codes": rng.integers(0, 16, (8, 5, 4)).astype(np.int32)}
    exp = ExperimentConfig(model=cfg, vae=VAEConfig(nz=32, warm_up=2),
                           train=TrainConfig(learning_rate=1e-3, epochs=1,
                                             batch_size=8),
                           data=DataConfig(batch_size=8))

    plain = VAETask(exp, steps_per_epoch=4, mesh=make_mesh({"data": 2}))
    st = plain.init_state(0)
    _, ref_loss, _ = plain.train_step(st, batch, jax.random.PRNGKey(5))

    pp = VAETask(exp, steps_per_epoch=4,
                 mesh=make_mesh({"data": 2, "pipe": 4}), pp_micro=2)
    assert pp.pp is not None
    st2 = pp.init_state(0)
    st2, pp_loss, _ = pp.train_step(st2, batch, jax.random.PRNGKey(5))
    assert abs(float(ref_loss) - float(pp_loss)) < 1e-4, \
        (float(ref_loss), float(pp_loss))


def test_pp_task_pipe_only_mesh():
    """A mesh with ONLY a pipe axis must still train: batch_sharding
    replicates the batch instead of naming the absent ``data`` axis
    (regression — put_batch used to raise 'Resource axis: data ... not
    found in mesh' on ``--mesh pipe=4``, the exact single-host XL
    scenario scripts/xl_train_project.py projects)."""
    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               TrainConfig)
    from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask

    cfg = CFG.replace(embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0,
                      block_size=21)
    rng = np.random.default_rng(3)
    batch = {"codes": rng.integers(0, 16, (8, 5, 4)).astype(np.int32),
             "target": rng.integers(0, 4, (8, 1)).astype(np.int32)}
    exp = ExperimentConfig(model=cfg,
                           train=TrainConfig(learning_rate=1e-3, epochs=1,
                                             batch_size=8),
                           data=DataConfig(batch_size=8))
    task = GPTTask(exp, make_mesh({"pipe": 4}), pp_micro=2)
    st = task.init_state(0)
    st, loss = task.train_step(st, batch, jax.random.PRNGKey(5))
    assert np.isfinite(float(loss))


def test_pp_dropout_independent_across_data_shards(params):
    """Each data shard must draw its own dropout masks: feed the same
    examples to both shards and require different outputs (a replicated
    key tree used to drop identical elements on every shard)."""
    mesh = make_mesh({"data": 2, "pipe": 4})
    cfg = CFG.replace(embd_pdrop=0.0, attn_pdrop=0.5, resid_pdrop=0.5)
    x, c = _inputs(b=4)
    x2 = jnp.concatenate([x, x], 0)       # shard 0 rows == shard 1 rows
    c2 = jnp.concatenate([c, c], 0)
    sharded = PP.shard_gpt_params_pp(mesh, params)
    xs = jax.device_put(x2, batch_sharding(mesh, 2))
    out = jax.jit(lambda p, k: PP.gpt_apply_pp(
        p, cfg, xs, G.class_embed(p, c2), mesh=mesh, n_micro=2,
        train=True, rng=k, use_pallas=False))(sharded,
                                              jax.random.PRNGKey(9))
    out = np.asarray(out)
    assert not np.allclose(out[:4], out[4:])


def test_pp_rejects_bad_shapes(params):
    mesh = make_mesh({"pipe": 8})
    x, c = _inputs(b=8)
    bad = CFG.replace(n_layer=6)   # 6 % 8 != 0
    with pytest.raises(ValueError, match="divisible"):
        PP.gpt_apply_pp(params, bad, x, G.class_embed(params, c),
                        mesh=mesh, n_micro=2, use_pallas=False)
