"""LSTM-VAE training-system tests (the reference's modules/Lit_vae.py role):
fit with decreasing loss, epoch-end MI/AU, IW-NLL eval, text logging.
"""

import jax
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                           GPTConfig, TrainConfig, VAEConfig,
                                           load_lstm_preset)
from melspec_gpt_vqvae_tpu.data import DataModule
from melspec_gpt_vqvae_tpu.models.lstm_vae import LSTMConfig
from melspec_gpt_vqvae_tpu.parallel import make_mesh
from melspec_gpt_vqvae_tpu.training import runner
from melspec_gpt_vqvae_tpu.training.callbacks import (LSTMTextLogger,
                                                      metrics_epoch_end)
from melspec_gpt_vqvae_tpu.training.checkpoint import CheckpointManager
from melspec_gpt_vqvae_tpu.training.logging import TBLogger
from melspec_gpt_vqvae_tpu.training.lstm_task import (LSTMVAETask,
                                                      lstm_tokens_from_batch)

pytestmark = pytest.mark.slow  # training loops; default lane: -m 'not slow'

TINY = LSTMConfig(vocab_size=18, nz=8, ni=16, enc_nh=16, dec_nh=16,
                  dec_dropout_in=0.1, dec_dropout_out=0.1,
                  bos_id=16, eos_id=17, max_len=22)


@pytest.fixture(scope="module")
def vas_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("lstm_vas")
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


def _task(steps_per_epoch=3, **vae_kw):
    exp = ExperimentConfig(
        model=GPTConfig(vocab_size=TINY.vocab_size, block_size=TINY.max_len,
                        n_layer=1, n_head=1, n_embd=TINY.ni),
        vae=VAEConfig(nz=TINY.nz, **vae_kw),
        train=TrainConfig(learning_rate=0.5, optimizer="sgd", momentum=0.5,
                          epochs=2, batch_size=4))
    return LSTMVAETask(exp, TINY, steps_per_epoch,
                       mesh=make_mesh({"data": 4}))


def test_tokens_from_batch_reference_shape():
    codes = np.arange(2 * 5 * 53).reshape(2, 5, 53) % 16
    x = np.asarray(lstm_tokens_from_batch(codes, 128, 129))
    # 5 parts of 50 per item, wrapped (reference: Lit_vae.py:172-201)
    assert x.shape == (10, 52)
    assert (x[:, 0] == 128).all() and (x[:, -1] == 129).all()
    # time-major order: first row = first 10 time cols x 5 freqs
    expect = codes[0, :, :10].T.reshape(-1)
    assert (x[0, 1:-1] == expect).all()


def test_tokens_from_batch_small_grid():
    codes = np.arange(3 * 4 * 5).reshape(3, 4, 5) % 16
    x = np.asarray(lstm_tokens_from_batch(codes, 16, 17))
    assert x.shape == (3, 22)    # one sentence per item


def test_fit_lstm_vae_end_to_end(vas_tree, tmp_path):
    """VERDICT #4 done-criterion: fit on the synthetic VAS tree with
    decreasing loss + MI/AU at epoch end."""
    dm = _dm(vas_tree)
    task = _task(steps_per_epoch=3, warm_up=1, kl_start=0.5)
    log = TBLogger(str(tmp_path / "logs"))
    ckpt = CheckpointManager(str(tmp_path / "ckpts"))
    media = LSTMTextLogger(task, log)
    epoch_cb = metrics_epoch_end(task, dm, log, limit_batches=1)

    state = task.init_state(0)
    batch = next(iter(dm.train_dataloader()))
    loss0 = float(task.eval_step(state, batch, jax.random.PRNGKey(9))["loss"])

    state = runner.fit_vae(task, dm, epochs=2, log=log, ckpt=ckpt,
                           logging_frequency=100, media_cb=media,
                           epoch_end_cb=epoch_cb)
    assert float(state["kl_weight"]) > 0.5          # annealed upward
    loss1 = float(task.eval_step(state, batch, jax.random.PRNGKey(9))["loss"])
    assert loss1 < loss0                            # learning happened

    agg = runner.evaluate_vae(task, dm, split="val", ckpt=ckpt,
                              resume="last", compute_mi_au=True,
                              iw_nsamples=4, limit_batches=1)
    for k in ("loss", "nll", "ppl", "mutual_info", "active_units",
              "iw_nll", "iw_ppl"):
        assert k in agg and np.isfinite(agg[k]), k


def test_reconstruct_strategies(vas_tree):
    dm = _dm(vas_tree)
    task = _task()
    state = task.init_state(0)
    batch = next(iter(dm.val_dataloader()))
    for strategy in ("greedy", "beam", "sample"):
        toks = np.asarray(task.reconstruct(state, batch, strategy))
        assert toks.shape == (4, TINY.max_len)
        assert (toks >= 0).all() and (toks < TINY.vocab_size).all()


def test_fb_modes_train(vas_tree):
    dm = _dm(vas_tree)
    batch = next(iter(dm.train_dataloader()))
    for fb, beta in ((1, 1.0), (2, 1.0), (3, 1.0), (0, 0.0)):
        task = _task(fb=fb, beta=beta, target_kl=2.0)
        state = task.init_state(0)
        state, loss, report = task.train_step(state, batch,
                                              jax.random.PRNGKey(0))
        assert np.isfinite(float(loss)), (fb, beta)


def test_lstm_preset_loads():
    exp, cfg = load_lstm_preset("vas")
    assert cfg.nz == 32 and cfg.ni == 512 and cfg.enc_nh == 1024
    assert cfg.vocab_size == 130 and cfg.max_len == 52
    assert exp.train.optimizer == "sgd" and exp.train.epochs == 150
