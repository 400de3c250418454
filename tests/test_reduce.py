"""Cross-process metric reduction (DDP sync_dist parity) tests.

jax.distributed can't spin up a second process inside pytest, so the
transport seam in parallel.reduce is injected with a fake that simulates
two hosts; the key property — multi-host val metrics equal
single-host-full-data metrics — is asserted exactly.
"""

import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.parallel import reduce as R
from melspec_gpt_vqvae_tpu.training.vae_task import VAETask


@pytest.fixture(autouse=True)
def _reset_transport():
    yield
    R.set_transport(None)


def test_single_process_identity():
    m = {"a": 1.5, "b": -2.0}
    assert R.cross_process_sum(m) == {"a": 1.5, "b": -2.0}


def _fake_two_host_transport(other_metrics):
    """Transport that appends the 'other host's' vector (sorted-key order,
    matching cross_process_sum's packing)."""
    keys = sorted(other_metrics)

    def transport(vec):
        other = np.asarray([float(other_metrics[k]) for k in keys],
                           np.float64)
        return np.stack([vec, other])

    return transport


def test_two_process_sums():
    host_a = {"loss": 1.0, "n": 2.0}
    host_b = {"loss": 3.5, "n": 4.0}
    R.set_transport(_fake_two_host_transport(host_b))
    out = R.cross_process_sum(host_a)
    assert out == {"loss": 4.5, "n": 6.0}


def _fake_outputs(rng, n):
    outs = []
    for _ in range(n):
        b = 4
        outs.append({"loss": float(rng.uniform(10, 20)),
                     "loss_rc": float(rng.uniform(8, 15)),
                     "loss_kl": float(rng.uniform(0, 5)),
                     "num_words": 19 * b, "num_sents": b})
    return outs


def test_multihost_val_equals_single_host_full_data():
    """The VERDICT-required property: epoch metrics computed per-host and
    reduced across processes must equal the metrics over the full data on
    one host (reference sync_dist: Lit_GPT_VAE.py:310-313)."""
    rng = np.random.default_rng(0)
    outputs = _fake_outputs(rng, 6)
    host_a, host_b = outputs[:3], outputs[3:]

    single = VAETask.metrics_from_sums(
        VAETask.sum_outputs(outputs))

    R.set_transport(_fake_two_host_transport(VAETask.sum_outputs(host_b)))
    multi = VAETask.metrics_from_sums(
        R.cross_process_sum(VAETask.sum_outputs(host_a)))

    for k in single:
        assert multi[k] == pytest.approx(single[k], rel=1e-12), k


# ---------------------------------------------------------------------------
# cross-process posterior pooling (full-corpus MI/AU under multi-process)
# ---------------------------------------------------------------------------


def _fake_concat_transport(other_arrays):
    """(K,) -> (P, K) transport simulating a second host for
    cross_process_concat: a size-1 vector is the counts phase (returns the
    other host's row count); anything else is the data phase (returns the
    other host's rows, zero-padded to the caller's max_n).  Consecutive
    gathers consume ``other_arrays`` in order (mu then logvar)."""
    state = {"i": 0}

    def transport(vec):
        other = np.asarray(other_arrays[state["i"]], np.float32)
        if vec.size == 1:
            return np.stack([vec, np.asarray([float(len(other))],
                                             np.float64)])
        state["i"] += 1
        n, d = other.shape
        max_n = vec.size // d
        pad = np.zeros((max_n, d), np.float32)
        pad[:n] = other
        return np.stack([vec, pad.reshape(-1)])

    return transport


def test_cross_process_concat_single_process_identity():
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    np.testing.assert_array_equal(R.cross_process_concat(a), a)
    assert R.concat_gather_fn() is None


def test_cross_process_concat_unequal_rows():
    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = (100.0 + np.arange(8, dtype=np.float32)).reshape(2, 4)
    R.set_transport(_fake_concat_transport([b]))
    assert R.concat_gather_fn() is R.cross_process_concat
    out = R.cross_process_concat(a)
    np.testing.assert_array_equal(out, np.vstack([a, b]))


def test_multihost_mi_au_covers_full_corpus():
    """Corpus MI/AU under multi-process equal the single-process
    full-corpus values: calc_mi_au pools the posterior shards across
    processes (the reference computes MI/AU over the whole val set on
    every rank — callbacks/GPT_VAE_callbacks.py:429-436)."""
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               GPTConfig, TrainConfig,
                                               VAEConfig)
    from melspec_gpt_vqvae_tpu.models import gpt_vae as V
    from melspec_gpt_vqvae_tpu.parallel import make_mesh

    model = GPTConfig(vocab_size=16, block_size=20, n_layer=1, n_head=2,
                      n_embd=16, class_size=None)
    exp = ExperimentConfig(
        model=model, vae=VAEConfig(nz=8),
        train=TrainConfig(learning_rate=1e-3, epochs=1, batch_size=4),
        data=DataConfig(batch_size=4))
    task = VAETask(exp, steps_per_epoch=2, mesh=make_mesh())
    state = task.init_state(0)
    rng = np.random.default_rng(3)
    toks = [rng.integers(0, 16, (4, 20)).astype(np.int32) for _ in range(3)]

    mi_full, au_full, _ = task.calc_mi_au(state, toks)  # 1-process reference

    # "host A" holds batches 0-1, "host B" batch 2: the fake transport
    # serves B's posteriors to A's mu gather then logvar gather
    mu_b, lv_b = V.encoder_forward(state["params"], task.cfgs,
                                   jnp.asarray(toks[2]))
    R.set_transport(_fake_concat_transport([np.asarray(mu_b),
                                            np.asarray(lv_b)]))
    mi_a, au_a, _ = task.calc_mi_au(state, toks[:2])
    assert mi_a == pytest.approx(mi_full, abs=1e-5)
    assert au_a == au_full


def test_cross_process_concat_empty_local_shard():
    """A rank with ZERO local rows still participates in the collective
    (skipping it would deadlock the other ranks' allgather) and receives
    the full corpus."""
    b = (100.0 + np.arange(8, dtype=np.float32)).reshape(2, 4)
    R.set_transport(_fake_concat_transport([b]))
    out = R.cross_process_concat(np.zeros((0, 4), np.float32))
    np.testing.assert_array_equal(out, b)


def test_cross_process_concat_all_empty():
    R.set_transport(_fake_concat_transport([np.zeros((0, 4), np.float32)]))
    out = R.cross_process_concat(np.zeros((0, 4), np.float32))
    assert out.shape == (0, 4)


def test_cross_process_concat_dtype_stable_across_process_count():
    """float64 input comes back float32 on BOTH the single-process and
    multi-process path — AU threshold comparisons must not flip with
    process count."""
    a = np.arange(6, dtype=np.float64).reshape(2, 3)
    assert R.cross_process_concat(a).dtype == np.float32  # 1-process
    R.set_transport(_fake_concat_transport([a.astype(np.float32)]))
    assert R.cross_process_concat(a).dtype == np.float32  # N-process


def test_calc_mi_au_empty_rank_joins_collective():
    """VAETask.calc_mi_au with an empty local token list still enters the
    gather and returns the OTHER rank's full-corpus statistics (the
    metrics_epoch_end callback relies on this to avoid a cross-process
    deadlock when shards are uneven)."""
    import jax.numpy as jnp

    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               GPTConfig, TrainConfig,
                                               VAEConfig)
    from melspec_gpt_vqvae_tpu.models import gpt_vae as V
    from melspec_gpt_vqvae_tpu.parallel import make_mesh

    model = GPTConfig(vocab_size=16, block_size=20, n_layer=1, n_head=2,
                      n_embd=16, class_size=None)
    exp = ExperimentConfig(
        model=model, vae=VAEConfig(nz=8),
        train=TrainConfig(learning_rate=1e-3, epochs=1, batch_size=4),
        data=DataConfig(batch_size=4))
    task = VAETask(exp, steps_per_epoch=2, mesh=make_mesh())
    state = task.init_state(0)
    rng = np.random.default_rng(7)
    toks = [rng.integers(0, 16, (4, 20)).astype(np.int32)]

    mi_full, au_full, _ = task.calc_mi_au(state, toks)  # 1-process ref

    mu_b, lv_b = V.encoder_forward(state["params"], task.cfgs,
                                   jnp.asarray(toks[0]))
    R.set_transport(_fake_concat_transport([np.asarray(mu_b),
                                            np.asarray(lv_b)]))
    mi, au, _ = task.calc_mi_au(state, [])   # empty rank
    assert mi == pytest.approx(mi_full, abs=1e-5)
    assert au == au_full

    # all ranks empty: finite-corpus guard returns nan/0 instead of raising
    R.set_transport(_fake_concat_transport(
        [np.zeros((0, 8), np.float32), np.zeros((0, 8), np.float32)]))
    mi, au, _ = task.calc_mi_au(state, [])
    assert np.isnan(mi) and au == 0
