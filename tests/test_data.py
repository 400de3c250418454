"""Data layer tests on a synthetic on-disk VAS tree."""

import os

import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.data import (Crop, DataLoader, DataModule,
                                        VASSpecs, center_crop)
from melspec_gpt_vqvae_tpu.utils import (code_reader, grid_to_sequence,
                                         make_idx, sequence_to_grid)


@pytest.fixture(scope="module")
def vas_tree(tmp_path_factory):
    """Tiny VAS layout: features/<cls>/melspec_10s_22050hz/*.npy + codes."""
    root = tmp_path_factory.mktemp("vas_root")
    data = root / "data"
    data.mkdir()
    classes = ["baby", "dog"]
    rng = np.random.default_rng(0)
    lines = []
    for cls in classes:
        mel_dir = root / "features" / cls / "melspec_10s_22050hz"
        codes_dir = root / "features" / cls / "codes_10s"
        mel_dir.mkdir(parents=True)
        codes_dir.mkdir(parents=True)
        for i in range(6):
            vid = f"video_{i:05d}"
            np.save(mel_dir / f"{vid}_mel.npy",
                    rng.uniform(0, 1, (80, 860)).astype(np.float32))
            np.save(codes_dir / f"{vid}_mel_code.npy",
                    rng.integers(0, 128, (5, 53)).astype(np.int64))
            lines.append(f"{cls}/{vid}")
    (data / "vas_train.txt").write_text("\n".join(lines[:10]) + "\n")
    (data / "vas_valid.txt").write_text("\n".join(lines[10:]) + "\n")
    return root


def test_vas_dataset_items(vas_tree):
    ds = VASSpecs("train", str(vas_tree / "features" / "*" /
                               "melspec_10s_22050hz"),
                  data_root=str(vas_tree / "data"))
    assert len(ds) == 10
    item = ds[0]
    assert item["image"].shape == (80, 848)
    assert -1.0 <= item["image"].min() and item["image"].max() <= 1.0
    assert item["codes"].shape == (5, 53)
    assert item["label"] in ("baby", "dog")
    assert item["target"] in (0, 1)
    # labels map to sorted class order (reference: vas.py:57-58)
    assert ds.label2target == {"baby": 0, "dog": 1}


def test_loader_batching_and_shuffle(vas_tree):
    ds = VASSpecs("train", str(vas_tree / "features" / "*" /
                               "melspec_10s_22050hz"),
                  data_root=str(vas_tree / "data"))
    dl = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
    batches = list(dl)
    assert len(batches) == 2  # drop_last: 10 // 4
    assert batches[0]["image"].shape == (4, 80, 848)
    assert batches[0]["codes"].shape == (4, 5, 53)
    # deterministic per epoch
    batches2 = list(dl)
    np.testing.assert_array_equal(batches[0]["codes"], batches2[0]["codes"])
    dl.set_epoch(1)
    batches3 = list(dl)
    assert not np.array_equal(batches[0]["codes"], batches3[0]["codes"])


def test_loader_per_host_sharding(vas_tree):
    ds = VASSpecs("train", str(vas_tree / "features" / "*" /
                               "melspec_10s_22050hz"),
                  data_root=str(vas_tree / "data"))
    seen = []
    for pi in range(2):
        dl = DataLoader(ds, batch_size=2, shuffle=False,
                        process_index=pi, process_count=2, prefetch=0)
        for b in dl:
            seen.extend(b["file_path_"])
    # disjoint between hosts; drop_last trims 5 -> 4 items per host
    assert len(seen) == len(set(seen)) == 8


def test_loader_parallel_workers_order_identical(vas_tree):
    """num_workers > 1 builds batches in a thread pool but must yield the
    exact same batches in the exact same order as the serial path."""
    ds = VASSpecs("train", str(vas_tree / "features" / "*" /
                               "melspec_10s_22050hz"),
                  data_root=str(vas_tree / "data"))
    serial = list(DataLoader(ds, batch_size=3, shuffle=True, prefetch=0))
    pooled = list(DataLoader(ds, batch_size=3, shuffle=True, prefetch=2,
                             num_workers=4))
    assert len(serial) == len(pooled) == 3
    for a, b in zip(serial, pooled):
        assert a["file_path_"] == b["file_path_"]
        np.testing.assert_array_equal(a["codes"], b["codes"])


def test_loader_start_batch_skips_prefix(vas_tree):
    """set_start_batch(b) yields exactly the full iteration's suffix [b:]
    (mid-epoch resume replays an interrupted epoch from the saved batch
    index without loading the consumed prefix) — identical on the serial,
    prefetch-thread, and thread-pool paths, and reset by set_start_batch(0)."""
    ds = VASSpecs("train", str(vas_tree / "features" / "*" /
                               "melspec_10s_22050hz"),
                  data_root=str(vas_tree / "data"))
    full = list(DataLoader(ds, batch_size=3, shuffle=True, prefetch=0))
    assert len(full) == 3
    for kw in (dict(prefetch=0), dict(prefetch=2),
               dict(prefetch=2, num_workers=4)):
        dl = DataLoader(ds, batch_size=3, shuffle=True, **kw)
        dl.set_start_batch(2)
        suffix = list(dl)
        assert len(suffix) == 1
        assert suffix[0]["file_path_"] == full[2]["file_path_"]
        np.testing.assert_array_equal(suffix[0]["codes"], full[2]["codes"])
        dl.set_start_batch(0)
        again = list(dl)
        assert [b["file_path_"] for b in again] == \
            [b["file_path_"] for b in full]
    # skipping past the end yields nothing (resume saved at the last batch)
    dl = DataLoader(ds, batch_size=3, shuffle=True, prefetch=0)
    dl.set_start_batch(99)
    assert list(dl) == []


def test_datamodule_selects_vas(vas_tree):
    dm = DataModule(batch_size=2,
                    spec_dir_path=str(vas_tree / "features" / "*" /
                                      "melspec_10s_22050hz"),
                    data_root=str(vas_tree / "data"))
    dm.setup()
    assert len(dm.train_dataset) == 10
    assert len(dm.val_dataset) == 2
    batch = next(iter(dm.train_dataloader()))
    assert batch["image"].shape[0] == 2


def test_center_crop():
    x = np.arange(80 * 860, dtype=np.float32).reshape(80, 860)
    c = center_crop(x, 80, 848)
    assert c.shape == (80, 848)
    np.testing.assert_array_equal(c, x[:, 6:854])


def test_crop_random_stays_in_bounds():
    crop = Crop((4, 6), random=True, seed=0)
    x = np.arange(8 * 10, dtype=np.float32).reshape(8, 10)
    for _ in range(10):
        c = crop(x)
        assert c.shape == (4, 6)
        assert c.min() >= 0 and c.max() <= x.max()


# ------------------------- code permuter -----------------------------------

def test_make_idx_column_major():
    idx, rev = make_idx(5, 53)
    assert idx.shape == (265,)
    np.testing.assert_array_equal(idx[:5], [0, 53, 106, 159, 212])
    np.testing.assert_array_equal(rev[idx], np.arange(265))


def test_grid_sequence_roundtrip():
    rng = np.random.default_rng(0)
    codes = rng.integers(0, 128, (3, 5, 53))
    seq = grid_to_sequence(codes)
    assert seq.shape == (3, 265)
    # first 5 tokens are the first time column (reference order)
    np.testing.assert_array_equal(seq[:, :5], codes[:, :, 0])
    back = sequence_to_grid(seq, 5, 53)
    np.testing.assert_array_equal(back, codes)


def test_code_reader_matches_grid_transform():
    rng = np.random.default_rng(1)
    codes = rng.integers(0, 128, (2, 5, 53))
    raster = codes.reshape(2, -1)
    seq = code_reader(raster)  # raster -> GPT order
    np.testing.assert_array_equal(seq, grid_to_sequence(codes))
    np.testing.assert_array_equal(code_reader(seq, reverse=True), raster)


def test_code_reader_width_scaling():
    x = np.arange(2 * 530).reshape(2, 530)
    out = code_reader(x)  # 2x width "infinite sampling" fallback
    assert out.shape == (2, 530)
    np.testing.assert_array_equal(code_reader(out, reverse=True), x)


def test_native_fast_path_matches_python(vas_tree):
    from melspec_gpt_vqvae_tpu.data import native
    if not native.available():
        import pytest
        pytest.skip("fastloader unavailable")
    ds = VASSpecs("train", str(vas_tree / "features" / "*" /
                               "melspec_10s_22050hz"),
                  data_root=str(vas_tree / "data"))
    fast = DataLoader(ds, batch_size=4, shuffle=False, prefetch=0,
                      use_native=True)
    slow = DataLoader(ds, batch_size=4, shuffle=False, prefetch=0,
                      use_native=False)
    for bf, bs in zip(fast, slow):
        np.testing.assert_allclose(bf["image"], bs["image"], atol=1e-6)
        np.testing.assert_array_equal(bf["codes"], bs["codes"])
        np.testing.assert_array_equal(bf["target"], bs["target"])
        assert bf["label"] == bs["label"]
