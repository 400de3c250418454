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
