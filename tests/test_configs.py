"""Config-system tests: --override parsing and preset override plumbing.

The reference's config system is editable ``config/*.py`` modules merged
into argparse (reference GPT_train.py:63-66); here presets are frozen
dataclasses and ``--override 'k=v,...'`` is the escape hatch.
"""

import pytest

from melspec_gpt_vqvae_tpu.configs import (load_lstm_preset, load_preset,
                                           parse_overrides)


def test_parse_overrides_literal_coercion():
    ov = parse_overrides("n_layer=2,lr=0.5,flag=True,name=adam,none=None")
    assert ov == {"n_layer": 2, "lr": 0.5, "flag": True,
                  "name": "adam", "none": None}
    assert parse_overrides("") == {}


def test_parse_overrides_rejects_non_kv():
    with pytest.raises(ValueError):
        parse_overrides("n_layer")


def test_overrides_reach_presets():
    exp = load_preset("GPT", "vas", **parse_overrides("n_layer=2,n_embd=32"))
    assert exp.model.n_layer == 2 and exp.model.n_embd == 32
    # untouched fields keep the reference-verbatim preset values
    assert exp.model.block_size == 266
    exp2 = load_preset("GPT_VAE", "vas", **parse_overrides("batch_size=4"))
    assert exp2.train.batch_size == 4
    _, cfg = load_lstm_preset("vas", **parse_overrides("nz=8"))
    assert cfg.nz == 8


def test_parse_overrides_tuples_and_nested_commas():
    ov = parse_overrides("ch_mult=(1,2,4),ch=16,ratios=[8,8]")
    assert ov == {"ch_mult": (1, 2, 4), "ch": 16, "ratios": [8, 8]}


def test_unknown_override_key_fails_loudly():
    # a typo'd key must not silently train the full-size preset
    with pytest.raises(ValueError, match="n_layr"):
        load_preset("GPT", "vas", n_layr=2)
    with pytest.raises(ValueError, match="unknown override"):
        load_lstm_preset("vas", nzz=8)
