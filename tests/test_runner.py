"""Integration tests for the training runner (Trainer-role): fit loops,
validation aggregation, checkpoint best/last, media callbacks, resume.
Tiny models + synthetic on-disk VAS tree, CPU mesh.
"""

import os

import jax
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                           GPTConfig, TrainConfig, VAEConfig,
                                           VQVAEConfig)
from melspec_gpt_vqvae_tpu.data import DataModule
from melspec_gpt_vqvae_tpu.parallel import make_mesh
from melspec_gpt_vqvae_tpu.training import runner
from melspec_gpt_vqvae_tpu.training.callbacks import (FrozenDecoders,
                                                      GPTImageLogger,
                                                      VAETextLogger,
                                                      metrics_epoch_end)
from melspec_gpt_vqvae_tpu.training.checkpoint import CheckpointManager
from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask
from melspec_gpt_vqvae_tpu.training.logging import TBLogger
from melspec_gpt_vqvae_tpu.training.vae_task import VAETask

pytestmark = pytest.mark.slow  # training loops; default lane: -m 'not slow'

TINY_GPT = GPTConfig(vocab_size=16, block_size=21, n_layer=1, n_head=2,
                     n_embd=16, class_size=2)
TINY_VAE = GPTConfig(vocab_size=16, block_size=20, n_layer=1, n_head=2,
                     n_embd=16)


@pytest.fixture(scope="module")
def vas_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("runner_vas")
    rng = np.random.default_rng(0)
    lines = []
    for cls in ["baby", "dog"]:
        mel_dir = root / "features" / cls / "melspec_10s_22050hz"
        codes_dir = root / "features" / cls / "codes_10s"
        mel_dir.mkdir(parents=True)
        codes_dir.mkdir(parents=True)
        for i in range(8):
            vid = f"video_{i:05d}"
            np.save(mel_dir / f"{vid}_mel.npy",
                    rng.uniform(0, 1, (80, 860)).astype(np.float32))
            np.save(codes_dir / f"{vid}_mel_code.npy",
                    rng.integers(0, 16, (4, 5)).astype(np.int64))
            lines.append(f"{cls}/{vid}")
    data = root / "data"
    data.mkdir()
    (data / "vas_train.txt").write_text("\n".join(lines[:12]) + "\n")
    (data / "vas_valid.txt").write_text("\n".join(lines[12:]) + "\n")
    return root


def _dm(vas_tree, bs=4):
    dm = DataModule(batch_size=bs,
                    spec_dir_path=str(vas_tree / "features" / "*" /
                                      "melspec_10s_22050hz"),
                    data_root=str(vas_tree / "data"))
    dm.setup()
    return dm


def _exp(model):
    return ExperimentConfig(model=model, vae=VAEConfig(nz=16),
                            train=TrainConfig(learning_rate=1e-3, epochs=2,
                                              batch_size=4))


def test_fit_gpt_end_to_end(vas_tree, tmp_path):
    dm = _dm(vas_tree)
    task = GPTTask(_exp(TINY_GPT), mesh=make_mesh({"data": 4}),
                   use_pallas=False)
    log = TBLogger(str(tmp_path / "logs"))
    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    decoders = FrozenDecoders(code_h=4, code_w=5)
    media = GPTImageLogger(task, log, decoders)

    state = runner.fit_gpt(task, dm, epochs=2, log=log, ckpt=ckpt,
                           logging_frequency=100, media_cb=media)
    assert int(jax.device_get(state["step"])) == 6  # 3 batches x 2 epochs
    assert ckpt.meta["best_metric"] is not None
    assert os.path.exists(os.path.join(ckpt.dirpath, "last"))
    assert os.path.exists(os.path.join(ckpt.dirpath, "best"))
    # tensorboard event files written
    assert any("tfevents" in f for f in os.listdir(log.log_dir))

    # resume continues from the stored epoch
    state2 = runner.fit_gpt(task, dm, epochs=2, log=log, ckpt=ckpt,
                            resume="last")
    assert int(jax.device_get(state2["step"])) == 6  # already done

    val = runner.validate_gpt(task, dm, ckpt=ckpt, resume="best")
    assert np.isfinite(val)


def test_fit_vae_end_to_end(vas_tree, tmp_path):
    dm = _dm(vas_tree)
    exp = _exp(TINY_VAE)
    exp.vae = VAEConfig(nz=16, warm_up=1, kl_start=0.5)
    task = VAETask(exp, steps_per_epoch=3,
                   mesh=make_mesh({"data": 4}), use_pallas=False)
    log = TBLogger(str(tmp_path / "logs"))
    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    decoders = FrozenDecoders(code_h=4, code_w=5)
    media = VAETextLogger(task, log, decoders)
    epoch_cb = metrics_epoch_end(task, dm, log, limit_batches=1)

    state = runner.fit_vae(task, dm, epochs=1, log=log, ckpt=ckpt,
                           logging_frequency=100, media_cb=media,
                           epoch_end_cb=epoch_cb)
    assert float(state["kl_weight"]) > 0.5  # annealed upward
    agg = runner.evaluate_vae(task, dm, split="val", ckpt=ckpt,
                              resume="last", compute_mi_au=True,
                              limit_batches=1)
    for k in ("loss", "nll", "ppl", "mutual_info", "active_units"):
        assert k in agg


def test_evaluate_vae_iw_nll(vas_tree):
    """--test 1 --iw_nsamples path: IW-NLL/PPL reachable from the eval
    entry (reference driver: utils.py:50-77)."""
    dm = _dm(vas_tree)
    exp = _exp(TINY_VAE)
    task = VAETask(exp, steps_per_epoch=3,
                   mesh=make_mesh({"data": 4}), use_pallas=False)
    agg = runner.evaluate_vae(task, dm, split="val", iw_nsamples=4,
                              limit_batches=1)
    assert np.isfinite(agg["iw_nll"]) and np.isfinite(agg["iw_ppl"])
    # the IW bound is at least as tight as the ELBO-derived NLL up to MC
    # noise; with 4 samples just require sane magnitudes
    assert agg["iw_nll"] > 0

    # the root-utils wrapper (reference utils.py:50-77 signature) works too
    import utils as root_utils
    state = task.init_state(0)
    batches = [next(iter(dm.val_dataloader()))]
    nll, ppl = root_utils.calc_iwnll(task, state, batches, nsamples=4, ns=2)
    assert np.isfinite(nll) and np.isfinite(ppl)


def test_train_report_stays_on_device(vas_tree):
    """Per-step host syncs are gone: train_step's report must be jax arrays
    (materialised only on logging steps)."""
    import jax.numpy as jnp
    dm = _dm(vas_tree)
    exp = _exp(TINY_VAE)
    task = VAETask(exp, steps_per_epoch=3,
                   mesh=make_mesh({"data": 4}), use_pallas=False)
    state = task.init_state(0)
    batch = next(iter(dm.train_dataloader()))
    _, _, report = task.train_step(state, batch, jax.random.PRNGKey(0))
    for k, v in report.items():
        assert isinstance(v, jnp.ndarray), k


def _tree_bitequal(a, b):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_resume_continuation_equivalence_vae(vas_tree, tmp_path):
    """fit_vae(4 epochs) == fit_vae(2) -> save -> fresh restore -> fit_vae(4)
    BIT-EXACTLY on CPU: optimizer moments, the live LR, kl_weight anneal
    state, per-epoch loader shuffle, and the per-(epoch, i) dropout keys all
    survive the restart (reference resume: GPT_VAE_train.py:188-190 +
    on_save/on_load_checkpoint Lit_GPT_VAE.py:959-971).  Caveat pinned
    elsewhere: random_crop=True uses a stateful crop RNG and is not
    resume-invariant; the default center crop (used here) is."""
    dm = _dm(vas_tree)
    exp = _exp(TINY_VAE)
    exp.vae = VAEConfig(nz=16, warm_up=2, kl_start=0.25)

    def new_task():
        return VAETask(exp, steps_per_epoch=3, mesh=make_mesh({"data": 4}),
                       use_pallas=False)

    log = TBLogger(str(tmp_path / "logs"))
    ckpt_a = CheckpointManager(str(tmp_path / "a"))
    state_a = runner.fit_vae(new_task(), dm, epochs=4, log=log, ckpt=ckpt_a,
                             logging_frequency=0, ckpt_every=0)

    ckpt_b = CheckpointManager(str(tmp_path / "b"))
    runner.fit_vae(new_task(), dm, epochs=2, log=log, ckpt=ckpt_b,
                   logging_frequency=0, ckpt_every=0)
    task_b = new_task()   # fresh task: nothing carries over but the ckpt
    state_b = runner.fit_vae(task_b, dm, epochs=4, log=log, ckpt=ckpt_b,
                             logging_frequency=0, resume="last",
                             ckpt_every=-1)

    _tree_bitequal(state_a["params"], state_b["params"])
    _tree_bitequal(state_a["opt_state"], state_b["opt_state"])
    assert float(state_a["kl_weight"]) == float(state_b["kl_weight"])
    assert int(jax.device_get(state_a["step"])) == \
        int(jax.device_get(state_b["step"]))
    # identical states -> identical val metrics
    batch = next(iter(dm.val_dataloader()))
    ea = task_b.eval_step(state_a, batch, jax.random.PRNGKey(9))
    eb = task_b.eval_step(state_b, batch, jax.random.PRNGKey(9))
    assert ea["loss"] == eb["loss"]


def test_resume_continuation_equivalence_gpt(vas_tree, tmp_path):
    """Same equivalence for fit_gpt (params + optimizer moments bit-exact
    across an interrupt/restore boundary)."""
    dm = _dm(vas_tree)

    def new_task():
        return GPTTask(_exp(TINY_GPT), mesh=make_mesh({"data": 4}),
                       use_pallas=False)

    log = TBLogger(str(tmp_path / "logs"))
    ckpt_a = CheckpointManager(str(tmp_path / "a"))
    state_a = runner.fit_gpt(new_task(), dm, epochs=4, log=log, ckpt=ckpt_a,
                             logging_frequency=0, ckpt_every=0)

    ckpt_b = CheckpointManager(str(tmp_path / "b"))
    runner.fit_gpt(new_task(), dm, epochs=2, log=log, ckpt=ckpt_b,
                   logging_frequency=0, ckpt_every=0)
    state_b = runner.fit_gpt(new_task(), dm, epochs=4, log=log, ckpt=ckpt_b,
                             logging_frequency=0, resume="last",
                             ckpt_every=-1)

    _tree_bitequal(state_a["params"], state_b["params"])
    _tree_bitequal(state_a["opt_state"], state_b["opt_state"])


def test_midepoch_resume_equivalence_gpt(vas_tree, tmp_path):
    """fit(2 epochs) == fit stopped MID-EPOCH by --max_steps -> fresh
    restore -> fit(2) BIT-EXACTLY: the interrupted run saves its batch
    index (checkpoint meta.json), and resume continues at the same epoch's
    next batch with the same (seed, epoch, i) step keys and the same
    per-epoch shuffle suffix.  Closes the reference delta that Lightning
    restores into the middle of training seamlessly
    (GPT_VAE_train.py:188-190); here it is exact, not approximate."""
    dm = _dm(vas_tree)   # 12 train items / bs 4 = 3 batches per epoch

    def new_task():
        return GPTTask(_exp(TINY_GPT), mesh=make_mesh({"data": 4}),
                       use_pallas=False)

    log = TBLogger(str(tmp_path / "logs"))
    ckpt_a = CheckpointManager(str(tmp_path / "a"))
    state_a = runner.fit_gpt(new_task(), dm, epochs=2, log=log, ckpt=ckpt_a,
                             logging_frequency=0, ckpt_every=0)

    # stop inside epoch 1 (after its first batch: 3 + 1 = 4 steps)
    ckpt_b = CheckpointManager(str(tmp_path / "b"))
    partial = runner.fit_gpt(new_task(), dm, epochs=2, log=log, ckpt=ckpt_b,
                             logging_frequency=0, ckpt_every=-1, max_steps=4)
    assert int(jax.device_get(partial["step"])) == 4
    assert ckpt_b.meta["last_batch_idx"] == 0   # epoch 1, batch 0 done
    state_b = runner.fit_gpt(new_task(), dm, epochs=2, log=log, ckpt=ckpt_b,
                             logging_frequency=0, resume="last",
                             ckpt_every=-1)

    _tree_bitequal(state_a["params"], state_b["params"])
    _tree_bitequal(state_a["opt_state"], state_b["opt_state"])
    assert int(jax.device_get(state_a["step"])) == \
        int(jax.device_get(state_b["step"]))


def test_midepoch_resume_equivalence_vae(vas_tree, tmp_path):
    """Same mid-epoch equivalence for fit_vae, via --ckpt_every_steps
    periodic saves instead of a max_steps stop: the kl_weight anneal
    (inside the state) and best_loss/pre_mi extras survive the mid-epoch
    restart bit-exactly (reference on_save/on_load_checkpoint:
    Lit_GPT_VAE.py:959-971)."""
    dm = _dm(vas_tree)
    exp = _exp(TINY_VAE)
    exp.vae = VAEConfig(nz=16, warm_up=2, kl_start=0.25)

    def new_task():
        return VAETask(exp, steps_per_epoch=3, mesh=make_mesh({"data": 4}),
                       use_pallas=False)

    log = TBLogger(str(tmp_path / "logs"))
    ckpt_a = CheckpointManager(str(tmp_path / "a"))
    state_a = runner.fit_vae(new_task(), dm, epochs=2, log=log, ckpt=ckpt_a,
                             logging_frequency=0, ckpt_every=0)

    # periodic step saves (every 2) + budget stop at step 5 = epoch 1
    # batch 1 -> resume replays only epoch 1 batch 2
    ckpt_b = CheckpointManager(str(tmp_path / "b"))
    runner.fit_vae(new_task(), dm, epochs=2, log=log, ckpt=ckpt_b,
                   logging_frequency=0, ckpt_every=-1, ckpt_every_steps=2,
                   max_steps=5)
    assert ckpt_b.meta["last_batch_idx"] == 1
    state_b = runner.fit_vae(new_task(), dm, epochs=2, log=log, ckpt=ckpt_b,
                             logging_frequency=0, resume="last",
                             ckpt_every=-1)

    _tree_bitequal(state_a["params"], state_b["params"])
    _tree_bitequal(state_a["opt_state"], state_b["opt_state"])
    assert float(state_a["kl_weight"]) == float(state_b["kl_weight"])
    # an end-of-epoch save from the resumed run marks the epoch complete
    ckpt_b.save({"state": state_b, "epoch": 1,
                 "extras": {"best_loss": 0.0, "pre_mi": 0.0,
                            "not_improved": 0}}, 6, metric=1.0)
    assert ckpt_b.meta["last_batch_idx"] == -1


def test_live_lr_read_and_set(vas_tree):
    """The logged learning rate reads the OPTIMIZER (reference attaches a
    LearningRateMonitor, GPT_train.py:92), not the config constant: after
    with_lr the runner's _live_lr tracks the new value, and the updates
    actually shrink."""
    from melspec_gpt_vqvae_tpu.training.optim import get_lr, with_lr
    exp = _exp(TINY_VAE)
    task = VAETask(exp, steps_per_epoch=3, mesh=make_mesh({"data": 4}),
                   use_pallas=False)
    state = task.init_state(0)
    assert runner._live_lr(task, state) == pytest.approx(1e-3)
    assert float(get_lr(state["opt_state"])) == pytest.approx(1e-3)

    dm = _dm(vas_tree)
    batch = next(iter(dm.train_dataloader()))
    # same init, halved LR -> strictly smaller first-step param delta.
    # (two independent init_state calls: the jitted step DONATES its input
    # state, so the two runs must not share buffers)
    s2 = task.init_state(0)
    s_half = dict(s2, opt_state=with_lr(s2["opt_state"],
                                        get_lr(s2["opt_state"]) * 0.5))
    assert runner._live_lr(task, s_half) == pytest.approx(5e-4)
    p0 = np.asarray(state["params"]["decoder"]["tok_emb"])
    r = jax.random.PRNGKey(0)
    a1, _, _ = task.train_step(state, batch, r)
    a2, _, _ = task.train_step(s_half, batch, r)
    d_full = np.abs(np.asarray(a1["params"]["decoder"]["tok_emb"]) - p0).sum()
    d_half = np.abs(np.asarray(a2["params"]["decoder"]["tok_emb"]) - p0).sum()
    assert d_half < d_full
    # the live LR survives a checkpoint round trip (it lives in opt_state)


class _ScriptedTask:
    """Stub with scripted val losses to drive the plateau machinery
    deterministically (reference callbeck_of_my_dreams semantics:
    GPT_VAE_callbacks.py:456-515)."""

    def __init__(self, exp, losses):
        from melspec_gpt_vqvae_tpu.training.optim import gpt_adamw
        self.exp = exp
        self.optimizer = gpt_adamw(exp.train.learning_rate)
        self._losses = losses

    def init_state(self, seed=0):
        import jax.numpy as jnp
        params = {"w": jnp.zeros((2,))}
        return {"params": params,
                "opt_state": self.optimizer.init(params),
                "step": jnp.zeros((), jnp.int32),
                "kl_weight": jnp.ones(())}

    def train_step(self, state, batch, rng, epoch=0):
        return dict(state, step=state["step"] + 1), 0.0, {}

    def eval_step(self, state, batch, rng):
        # scripted: one eval batch per epoch, losses consumed in order
        L = self._losses.pop(0)
        return {"loss": L, "loss_rc": L, "loss_kl": 0.0,
                "num_words": 1, "num_sents": 1}

    @staticmethod
    def sum_outputs(outputs):
        return {k: float(sum(o[k] for o in outputs))
                for k in ("loss", "loss_rc", "loss_kl",
                          "num_words", "num_sents")}

    @staticmethod
    def metrics_from_sums(sums):
        return {"loss": sums["loss"] / sums["num_sents"]}


class _OneBatchLoader:
    def __init__(self):
        self._b = {"codes": np.zeros((1, 4, 5), np.int32),
                   "target": np.zeros((1,), np.int32)}

    def set_epoch(self, e):
        pass

    def __iter__(self):
        return iter([self._b])

    def __len__(self):
        return 1


class _FakeDM:
    def train_dataloader(self):
        return _OneBatchLoader()

    def val_dataloader(self):
        return _OneBatchLoader()


def test_fit_vae_lr_plateau_decay(tmp_path):
    """Val-plateau LR decay (the reference's commented-out machinery,
    GPT_VAE_callbacks.py:456-515): losses 1.0 then 2.0 x4 -> with
    patience=2 and start epoch 0 the LR halves after epochs 2 and 4,
    not_improved resets after each decay, best_loss stays at 1.0."""
    import dataclasses as dc
    from melspec_gpt_vqvae_tpu.training.optim import get_lr
    exp = _exp(TINY_VAE)
    exp.train = dc.replace(exp.train, lr_decay=0.5, lr_decay_patience=2,
                           lr_decay_start=0, epochs=5)
    task = _ScriptedTask(exp, [1.0, 2.0, 2.0, 2.0, 2.0])
    log = TBLogger(str(tmp_path / "logs"))
    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    state = runner.fit_vae(task, _FakeDM(), epochs=5, log=log, ckpt=ckpt,
                           logging_frequency=0, ckpt_every=0)
    assert float(get_lr(state["opt_state"])) == pytest.approx(
        1e-3 * 0.5 * 0.5)

    # gate: with lr_decay_start beyond the run, the LR never moves
    exp2 = _exp(TINY_VAE)
    exp2.train = dc.replace(exp2.train, lr_decay=0.5, lr_decay_patience=2,
                            lr_decay_start=50, epochs=5)
    task2 = _ScriptedTask(exp2, [1.0, 2.0, 2.0, 2.0, 2.0])
    state2 = runner.fit_vae(task2, _FakeDM(), epochs=5, log=log, ckpt=ckpt,
                            logging_frequency=0, ckpt_every=-1)
    assert float(get_lr(state2["opt_state"])) == pytest.approx(1e-3)


def test_multi_bleu(tmp_path):
    """Pure-Python multi-bleu (reference shells to a perl script absent
    from its own repo, utils.py:250-267): perfect match -> 100; known
    mismatch -> the hand-computed pooled-precision score."""
    import utils as root_utils

    hyp = tmp_path / "hyp.txt"
    ref = tmp_path / "ref.txt"
    lines = ["1 2 3 4 5 6", "7 8 9 10 11 12"]
    hyp.write_text("\n".join(lines) + "\n")
    ref.write_text("\n".join(lines) + "\n")
    assert root_utils.call_multi_bleu_perl(
        "ignored", str(hyp), str(ref), verbose=False) == 100.0

    # one token flipped in line 1: pooled precisions over both lines are
    # p1=11/12, p2=8/10, p3=5/8, p4=3/6; BP=1 (equal lengths)
    import math
    hyp.write_text("1 2 3 0 5 6\n7 8 9 10 11 12\n")
    expect = 100.0 * math.exp(
        (math.log(11 / 12) + math.log(8 / 10) + math.log(5 / 8)
         + math.log(3 / 6)) / 4)
    got = root_utils.call_multi_bleu_perl("ignored", str(hyp), str(ref),
                                          verbose=False)
    assert abs(got - expect) < 1e-9

    # brevity penalty: hyp shorter than ref
    hyp.write_text("1 2 3\n7 8 9\n")
    got = root_utils.call_multi_bleu_perl("ignored", str(hyp), str(ref),
                                          verbose=False)
    bleu, prec, bp, hl, rl = root_utils.corpus_bleu(
        ["1 2 3", "7 8 9"], lines)
    assert bp == math.exp(1 - 12 / 6) and got == bleu
