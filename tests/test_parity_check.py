"""parity_check.py helpers: deterministic battery + CPU encode path."""

import sys

import numpy as np


def test_battery_is_deterministic_and_shaped():
    sys.path.insert(0, "/root/repo")
    from parity_check import make_battery
    a = make_battery(22050)   # 1 s keeps the test fast
    b = make_battery(22050)
    assert a.shape == (48, 22050) and a.dtype == np.float32
    np.testing.assert_array_equal(a, b)
    # stimuli are bounded and non-degenerate
    assert np.abs(a).max() <= 1.0
    assert (np.abs(a).max(axis=1) > 0.05).all()


def test_encode_battery_cpu_path():
    sys.path.insert(0, "/root/repo")
    from parity_check import encode_battery, make_battery
    from melspec_gpt_vqvae_tpu.configs import MelConfig
    wavs = make_battery(MelConfig().clip_samples)[:2]
    idx = encode_battery(wavs, bf16=False, pallas_mel=False,
                         use_pallas_vq=False)
    assert idx.shape == (2, 5, 53)
    assert idx.dtype == np.int32 and (idx >= 0).all() and (idx < 128).all()
