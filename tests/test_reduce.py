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
