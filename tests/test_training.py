"""End-to-end training-system tests: tasks, runner loops, checkpointing,
optimizer partition — on tiny configs over the virtual 8-device CPU mesh.
"""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                           GPTConfig, TrainConfig, VAEConfig,
                                           VQVAEConfig, load_preset)
from melspec_gpt_vqvae_tpu.parallel import make_mesh
from melspec_gpt_vqvae_tpu.training.checkpoint import (CheckpointManager,
                                                       merge_subtree)
from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask, tokens_from_batch
from melspec_gpt_vqvae_tpu.training.optim import decay_mask
from melspec_gpt_vqvae_tpu.training.vae_task import VAETask

pytestmark = pytest.mark.slow  # training loops; default lane: -m 'not slow'

TINY = GPTConfig(vocab_size=16, block_size=21, n_layer=2, n_head=2,
                 n_embd=16, class_size=4)


def _exp(model=TINY, **train_kw):
    return ExperimentConfig(
        model=model,
        vae=VAEConfig(nz=model.n_embd),
        train=TrainConfig(learning_rate=1e-3, epochs=1, batch_size=8,
                          **train_kw),
        data=DataConfig(batch_size=8))


def _batch(b=8, h=4, w=5, vocab=16, classes=4, seed=0):
    rng = np.random.default_rng(seed)
    return {"codes": rng.integers(0, vocab, (b, h, w)).astype(np.int32),
            "target": rng.integers(0, classes, (b,)).astype(np.int32),
            "label": ["dog"] * b,
            "image": rng.uniform(-1, 1, (b, 8, 12)).astype(np.float32)}


def test_preset_loading():
    exp = load_preset("GPT", "vas")
    assert exp.model.n_layer == 24 and exp.model.block_size == 266
    assert exp.model.class_size == 8
    assert exp.train.batch_size == 8 and exp.train.learning_rate == 1e-6
    exp2 = load_preset("GPT_VAE", "vggsound")
    assert exp2.model.n_layer == 40 and exp2.model.n_embd == 1472
    assert exp2.vqvae.num_embeddings == 1024


def test_tokens_from_batch_order():
    codes = jnp.asarray(np.arange(2 * 4 * 5).reshape(2, 4, 5))
    x = tokens_from_batch(codes)
    assert x.shape == (2, 20)
    np.testing.assert_array_equal(np.asarray(x[0, :4]), [0, 5, 10, 15])


def test_gpt_task_trains_and_evals():
    task = GPTTask(_exp(), make_mesh())
    state = task.init_state(0)
    batch = _batch()
    l0 = float(task.eval_step(state, batch))
    rng = jax.random.PRNGKey(0)
    for i in range(12):
        rng, r = jax.random.split(rng)
        state, loss = task.train_step(state, batch, r)
    l1 = float(task.eval_step(state, batch))
    assert l1 < l0
    assert int(jax.device_get(state["step"])) == 12


def test_gpt_task_gallery():
    task = GPTTask(_exp(), make_mesh(), use_pallas=False)
    state = task.init_state(0)
    out = task.log_samples(state["params"], jax.random.PRNGKey(0), _batch())
    assert out["codes"].shape == (1, 20)
    assert out["codes_half"].shape == (1, 20)
    assert out["codes_nopix"].shape == (1, 20)
    assert out["codes_det"].shape == (1, 20)
    assert out["att_nopix"].shape[0] == 1


def test_vae_task_trains_and_anneals():
    base = TINY.replace(class_size=None)
    exp = _exp(base)
    exp.vae = VAEConfig(nz=16, warm_up=2, kl_start=0.1)
    task = VAETask(exp, steps_per_epoch=4, mesh=make_mesh())
    assert task.anneal_rate == pytest.approx((1 - 0.1) / (2 * 4))
    state = task.init_state(0)
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    kl_w0 = float(state["kl_weight"])
    state, loss, report = task.train_step(state, batch, rng)
    assert float(state["kl_weight"]) == pytest.approx(
        kl_w0 + task.anneal_rate)
    assert "train/loss" in report and np.isfinite(report["train/loss"])
    out = task.eval_step(state, batch, rng)
    agg = task.aggregate_epoch([out, out])
    for k in ("loss", "nll", "kl", "rec", "ppl"):
        assert np.isfinite(agg[k]), k


def test_vae_task_mi_au_and_media_paths():
    # VAE block_size equals the token count (no class slot)
    base = TINY.replace(class_size=None, block_size=20)
    exp = _exp(base)
    task = VAETask(exp, steps_per_epoch=4, mesh=make_mesh(),
                   use_pallas=False)
    state = task.init_state(0)
    batches = [_batch(seed=i) for i in range(2)]
    mi, au, au_var = task.calc_mi_au(state, batches)
    assert np.isfinite(mi) and 0 <= au <= 16
    rec = task.reconstruct(state, batches[0], "greedy")
    assert rec.shape == (8, 20)
    outs = task.interpolate(
        state, tokens_from_batch(jnp.asarray(batches[0]["codes"]))[:1],
        tokens_from_batch(jnp.asarray(batches[0]["codes"]))[1:2], steps=3)
    assert len(outs) == 3 and outs[0].shape == (1, 20)


def test_decay_mask_partition():
    from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params
    params = init_gpt_params(jax.random.PRNGKey(0), TINY)
    mask = decay_mask(params)
    assert mask["head"]["w"] is True
    assert mask["blocks"]["attn_qkv"]["w"] is True
    assert mask["blocks"]["attn_qkv"]["b"] is False
    assert mask["blocks"]["ln1_s"] is False
    assert mask["tok_emb"] is False
    assert mask["pos_emb"] is False
    assert mask["class_emb"] is False


def test_checkpoint_roundtrip(tmp_path):
    task = GPTTask(_exp(), make_mesh())
    state = task.init_state(0)
    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    ckpt.save({"state": state, "epoch": 0}, step=10, metric=1.5)
    ckpt.save({"state": state, "epoch": 1}, step=20, metric=2.0)  # worse
    assert ckpt.meta["best_metric"] == 1.5
    assert ckpt.meta["best_step"] == 10
    assert ckpt.meta["last_step"] == 20

    template = {"state": jax.tree_util.tree_map(np.asarray, state),
                "epoch": 0}
    restored = ckpt.restore("last", template=template)
    assert int(restored["epoch"]) == 1
    np.testing.assert_allclose(
        np.asarray(restored["state"]["params"]["tok_emb"]),
        np.asarray(state["params"]["tok_emb"]))


def test_checkpoint_restore_geometry_mismatch_raises(tmp_path):
    """Restoring a checkpoint into a template with different leaf shapes
    (e.g. --resume without repeating the run's --override) must raise a
    clear error naming the mismatched leaves — not surface later as a
    lax.scan axis-size crash inside the first jitted step."""
    task = GPTTask(_exp(), make_mesh())
    state = task.init_state(0)
    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    ckpt.save({"state": state, "epoch": 0}, step=10, metric=1.5)
    ckpt.wait()
    template = {"state": jax.tree_util.tree_map(np.asarray, state),
                "epoch": 0}
    wrong = np.zeros(
        (7,) + tuple(np.shape(template["state"]["params"]["tok_emb"])[1:]),
        dtype=np.float32)
    template["state"]["params"]["tok_emb"] = wrong
    with pytest.raises(ValueError, match="--override"):
        ckpt.restore("last", template=template)


def test_stage2_encoder_merge(tmp_path):
    from melspec_gpt_vqvae_tpu.models.gpt_vae import (init_vae_params,
                                                      make_vae_configs)
    base = TINY.replace(class_size=None)
    cfgs = make_vae_configs(base, VAEConfig(nz=16))
    p1 = init_vae_params(jax.random.PRNGKey(0), cfgs)
    p2 = init_vae_params(jax.random.PRNGKey(1), cfgs)
    merged = merge_subtree(p1, p2, "encoder")
    np.testing.assert_allclose(np.asarray(merged["encoder"]["tok_emb"]),
                               np.asarray(p2["encoder"]["tok_emb"]))
    np.testing.assert_allclose(np.asarray(merged["decoder"]["tok_emb"]),
                               np.asarray(p1["decoder"]["tok_emb"]))


def test_mesh_dp_sharding_runs():
    """The jitted train step executes over an 8-device data mesh (the DDP
    replacement; SURVEY.md §5)."""
    mesh = make_mesh({"data": 8})
    task = GPTTask(_exp(), mesh)
    state = task.init_state(0)
    state, loss = task.train_step(state, _batch(b=16), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_vae_freeze_epoch():
    """--freeze_epoch stops encoder updates while the decoder keeps moving
    (reference flag: GPT_VAE_train.py:82)."""
    base = TINY.replace(class_size=None, block_size=20)
    exp = _exp(base)
    exp.vae = VAEConfig(nz=16, freeze_epoch=1, warm_up=0)
    task = VAETask(exp, steps_per_epoch=2, mesh=make_mesh({"data": 4}))
    state = task.init_state(0)
    batch = _batch()
    rng = jax.random.PRNGKey(0)

    enc0 = np.asarray(state["params"]["encoder"]["tok_emb"])
    state, _, _ = task.train_step(state, batch, rng, epoch=0)
    enc1 = np.asarray(state["params"]["encoder"]["tok_emb"])
    assert not np.allclose(enc0, enc1)  # epoch 0: encoder trains

    state, _, _ = task.train_step(state, batch, rng, epoch=1)
    enc2 = np.asarray(state["params"]["encoder"]["tok_emb"])
    dec1 = np.asarray(state["params"]["decoder"]["tok_emb"])
    state, _, _ = task.train_step(state, batch, rng, epoch=2)
    enc3 = np.asarray(state["params"]["encoder"]["tok_emb"])
    dec2 = np.asarray(state["params"]["decoder"]["tok_emb"])
    np.testing.assert_allclose(enc2, enc3)      # frozen
    assert not np.allclose(dec1, dec2)          # decoder still training


def test_adafactor_optimizer_option():
    base = TINY.replace(class_size=None, block_size=20)
    exp = _exp(base)
    exp.train = dataclasses.replace(exp.train, optimizer="adafactor")
    task = VAETask(exp, steps_per_epoch=2, mesh=make_mesh({"data": 4}))
    state = task.init_state(0)
    state, loss, _ = task.train_step(state, _batch(), jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))


def test_checkpoint_resume_falls_back_to_previous_version(tmp_path):
    """'--resume last' in a fresh version dir finds the previous version's
    checkpoint (caught live: a new TBLogger version gets a new empty
    checkpoints dir)."""
    task = GPTTask(_exp(), make_mesh())
    state = task.init_state(0)
    base = tmp_path / "checkpoints"
    old = CheckpointManager(str(base / "version_0"))
    old.save({"state": state, "epoch": 3}, step=5, metric=1.0)
    old.wait()   # a prior run's saves are durable (fit waits before exit)
    new = CheckpointManager(str(base / "version_1"))  # empty fresh dir
    template = {"state": jax.tree_util.tree_map(np.asarray, state),
                "epoch": 0}
    restored = new.restore("last", template=template)
    assert int(restored["epoch"]) == 3


def test_checkpoint_shape_template_restore(tmp_path):
    """restore() with a zero-transfer ShapeDtypeStruct template (what the
    runner now builds — tree_map(np.asarray, state) pulled the whole
    init state to host and raises on non-addressable sharded arrays)."""
    from melspec_gpt_vqvae_tpu.training.checkpoint import (place_like,
                                                           shape_template)
    task = GPTTask(_exp(), make_mesh())
    state = task.init_state(0)
    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    ckpt.save({"state": state, "epoch": 3}, step=10, metric=1.0)
    ckpt.wait()
    restored = ckpt.restore("last", template={
        "state": shape_template(state), "epoch": 0})
    assert int(restored["epoch"]) == 3
    placed = place_like(restored["state"], state)
    np.testing.assert_allclose(
        np.asarray(placed["params"]["tok_emb"]),
        np.asarray(state["params"]["tok_emb"]))


def test_checkpoint_nan_metric_never_becomes_best(tmp_path):
    """A divergent (NaN) epoch must not wedge best tracking: NaN is never
    an improvement, and a stored NaN is replaced by the first finite
    metric (float comparisons with NaN are always False both ways)."""
    task = GPTTask(_exp(), make_mesh())
    state = task.init_state(0)
    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    ckpt.save({"state": state, "epoch": 0}, step=1, metric=float("nan"))
    ckpt.wait()
    assert ckpt.meta.get("best_metric") is None
    ckpt.save({"state": state, "epoch": 1}, step=2, metric=2.0)
    ckpt.wait()
    assert ckpt.meta["best_metric"] == 2.0
    # simulate a NaN persisted by an older run: still recoverable
    ckpt.meta["best_metric"] = float("nan")
    ckpt.save({"state": state, "epoch": 2}, step=3, metric=5.0)
    ckpt.wait()
    assert ckpt.meta["best_metric"] == 5.0


def test_checkpoint_restore_missing_raises_clearly(tmp_path):
    """--resume best on a run that only ever wrote 'last' must fail with
    a message naming the searched locations, not a deep orbax error."""
    import pytest as _pytest
    ckpt = CheckpointManager(str(tmp_path / "ckpts" / "version_0"))
    with _pytest.raises(FileNotFoundError, match="no 'best' checkpoint"):
        ckpt.restore("best")
