"""Native C++ fastloader tests: correctness vs numpy, error paths."""

import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.data import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("g++/fastloader unavailable")
    return native.get_lib()


@pytest.fixture
def tree(tmp_path):
    rng = np.random.default_rng(0)
    specs, codes = [], []
    for i in range(6):
        s = rng.uniform(0, 1, (80, 860)).astype(np.float32)
        p = tmp_path / f"s{i}_mel.npy"
        np.save(p, s)
        specs.append((str(p), s))
        c = rng.integers(0, 128, (5, 53)).astype(np.int64)
        pc = tmp_path / f"s{i}_mel_code.npy"
        np.save(pc, c)
        codes.append((str(pc), c))
    return specs, codes


def test_spec_batch_matches_numpy(lib, tree):
    specs, _ = tree
    paths = [p for p, _ in specs]
    out = native.load_spec_batch(paths, 80, 848, 2.0, -1.0, nthreads=3)
    assert out.shape == (6, 80, 848)
    for i, (_, s) in enumerate(specs):
        expected = 2.0 * s[:, 6:854] - 1.0   # center crop
        np.testing.assert_allclose(out[i], expected, atol=1e-6)


def test_spec_batch_f64_input(lib, tmp_path):
    s = np.random.default_rng(1).uniform(0, 1, (10, 12)).astype(np.float64)
    p = tmp_path / "d.npy"
    np.save(p, s)
    out = native.load_spec_batch([str(p)], 8, 10, 1.0, 0.0, nthreads=1)
    np.testing.assert_allclose(out[0], s[1:9, 1:11].astype(np.float32),
                               atol=1e-6)


def test_codes_batch_matches_numpy(lib, tree):
    _, codes = tree
    paths = [p for p, _ in codes]
    out = native.load_codes_batch(paths, 5, 53, nthreads=2)
    assert out.dtype == np.int32
    for i, (_, c) in enumerate(codes):
        np.testing.assert_array_equal(out[i], c.astype(np.int32))


def test_missing_file_raises(lib, tmp_path):
    with pytest.raises(IOError):
        native.load_spec_batch([str(tmp_path / "nope.npy")], 4, 4)


def test_probe(lib, tree):
    specs, _ = tree
    assert native.probe(specs[0][0]) == (80, 860)
