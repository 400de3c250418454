"""VQ-VAE GAN training-system tests (tiny config)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.configs import VQVAEConfig
from melspec_gpt_vqvae_tpu.training.vqvae_task import VQVAETask

pytestmark = pytest.mark.slow  # training loops; default lane: -m 'not slow'

TINY = VQVAEConfig(num_embeddings=8, embedding_dim=4, ch=8,
                   ch_mult=(1, 2), num_res_blocks=1, attn_resolutions=(),
                   resolution=16, z_channels=4, disc_ndf=8,
                   disc_num_layers=2, disc_start=1, learning_rate=1e-3)


@pytest.fixture
def task_and_state():
    task = VQVAETask(TINY)
    state = task.init_state(jax.random.PRNGKey(0), (1, 16, 16, 1))
    return task, state


def test_train_step_runs_and_logs(task_and_state):
    task, state = task_and_state
    x = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (2, 16, 16, 1)),
                    jnp.float32)
    state, logs = task.train_step(state, x)
    for k in ("train/aeloss", "train/rec_loss", "train/quant_loss",
              "train/d_weight", "train/g_loss", "train/disc_loss",
              "train/logits_real", "train/logits_fake",
              "train/perplexity"):
        assert k in logs and np.isfinite(logs[k]), k
    # before disc_iter_start both adversarial factors are zeroed
    assert logs["train/disc_factor"] == 0.0
    assert logs["train/disc_loss"] == 0.0


def test_disc_kicks_in_after_start(task_and_state):
    # step counts iterations (batches); the GAN terms activate exactly at
    # iteration == disc_start (the reference's *2 converts batches to its
    # twice-per-batch global_step — see vqvae_task disc_iter_start note)
    task, state = task_and_state
    state = dict(state, step=jnp.asarray(TINY.disc_start, jnp.int32))
    x = jnp.asarray(np.random.default_rng(1).uniform(-1, 1, (2, 16, 16, 1)),
                    jnp.float32)
    state, logs = task.train_step(state, x)
    assert logs["train/disc_factor"] == TINY.disc_factor
    assert logs["train/disc_loss"] != 0.0


def test_training_improves_reconstruction():
    task = VQVAETask(TINY)
    state = task.init_state(jax.random.PRNGKey(0), (1, 16, 16, 1))
    x = jnp.asarray(np.random.default_rng(2).uniform(-1, 1, (2, 16, 16, 1)),
                    jnp.float32)
    logs0, _, _ = task.eval_step(state, x)
    for _ in range(15):
        state, _ = task.train_step(state, x)
    logs1, recon, idx = task.eval_step(state, x)
    assert logs1["val/rec_loss"] < logs0["val/rec_loss"]
    assert recon.shape == x.shape
    assert idx.shape == (2, 8, 8)
