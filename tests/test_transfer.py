"""Chunked device->host snapshot + checkpoint cadence helpers (added after
a verify drive caught a silent ~25 min/epoch checkpoint stall through the
remote-TPU tunnel; training/checkpoint.py, utils/transfer.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from melspec_gpt_vqvae_tpu.training.runner import _should_save
from melspec_gpt_vqvae_tpu.utils.transfer import chunked_device_get


def test_chunked_device_get_matches_device_get():
    tree = {
        "big": jnp.arange(64 * 1024, dtype=jnp.float32).reshape(64, 1024),
        "small": jnp.ones((3,), jnp.bfloat16),
        "scalar": jnp.asarray(7, jnp.int32),
        "nested": {"x": jnp.linspace(0, 1, 777)},
    }
    # force the chunked path with a chunk smaller than "big" (rows split)
    got = chunked_device_get(tree, chunk_bytes=16 * 1024, force=True)
    ref = jax.tree_util.tree_map(np.asarray, jax.device_get(tree))
    for g, r in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(ref)):
        assert isinstance(g, np.ndarray) or np.isscalar(g)
        np.testing.assert_array_equal(np.asarray(g), r)
        assert np.asarray(g).dtype == r.dtype


def test_should_save_cadence():
    # default: every epoch (reference ModelCheckpoint parity)
    assert all(_should_save(e, 5, 1) for e in range(5))
    # every 2nd epoch + the final one
    assert [_should_save(e, 5, 2) for e in range(5)] == \
        [False, True, False, True, True]
    # 0 = final only
    assert [_should_save(e, 3, 0) for e in range(3)] == \
        [False, False, True]


def test_should_save_never():
    assert not any(_should_save(e, 4, -1) for e in range(4))
