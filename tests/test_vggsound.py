"""VGGSound dataset tests on a synthetic tree: meta CSV label maps, split
regeneration (seed 1337, valid stratified by test-class counts), item keys.
"""

import csv
import os

import numpy as np
import pytest

from melspec_gpt_vqvae_tpu.data.datasets import (VGGSoundSpecs,
                                                 make_vggsound_split_files)


@pytest.fixture(scope="module")
def vgg_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("vgg")
    specs = root / "vggsound" / "melspec_10s_22050hz"
    codes = root / "vggsound" / "codes_10s"
    specs.mkdir(parents=True)
    codes.mkdir(parents=True)
    rng = np.random.default_rng(0)

    # video ids are 11 chars; clips carry _start_end timestamps
    meta = []
    vid_names = []
    for i in range(12):
        vid = f"vid{i:08d}"
        cls = "dog barking" if i % 2 == 0 else "baby crying"
        split = "test" if i >= 9 else "train"
        meta.append([vid, "0", cls, split])
        clip = f"{vid}_16000_26000"
        vid_names.append(clip)
        np.save(specs / f"{clip}_mel.npy",
                rng.uniform(0, 1, (80, 860)).astype(np.float32))
        np.save(codes / f"{clip}_mel_code.npy",
                rng.integers(0, 1024, (5, 53)).astype(np.int64))

    data = root / "data"
    data.mkdir()
    with open(data / "vggsound.csv", "w", newline="") as f:
        csv.writer(f).writerows(meta)
    return root


def test_split_regeneration(vgg_tree):
    specs_dir = str(vgg_tree / "vggsound" / "melspec_10s_22050hz")
    splits = str(vgg_tree / "data")
    make_vggsound_split_files(specs_dir, f"{splits}/vggsound.csv", splits)
    train = open(f"{splits}/vggsound_train.txt").read().splitlines()
    valid = open(f"{splits}/vggsound_valid.txt").read().splitlines()
    test = open(f"{splits}/vggsound_test.txt").read().splitlines()
    assert len(train) + len(valid) + len(test) == 12
    assert len(test) == 3
    # valid matches the test set's class distribution (3 test clips)
    assert len(valid) == 3
    assert not set(train) & set(valid)


def test_vggsound_dataset_items(vgg_tree):
    specs_dir = str(vgg_tree / "vggsound" / "melspec_10s_22050hz")
    ds = VGGSoundSpecs("train", specs_dir,
                       splits_path=str(vgg_tree / "data"),
                       meta_path=str(vgg_tree / "data" / "vggsound.csv"))
    assert len(ds) > 0
    item = ds[0]
    assert item["image"].shape == (80, 848)
    assert item["codes"].shape == (5, 53)
    assert item["label"] in ("dog barking", "baby crying")
    # label map over sorted unique classes
    assert ds.label2target == {"baby crying": 0, "dog barking": 1}
    # fast-path accessor agrees with __getitem__
    spec_path, codes_path, target, label = ds.item_paths(0)
    assert spec_path == item["file_path_"]
    assert target == item["target"] and label == item["label"]
    assert os.path.isfile(codes_path)
