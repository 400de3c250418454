"""Legacy checkpoint migration: checkpoints saved before round 4's state
layout change (opt_state wrapped in optax.inject_hyperparams — optim.py;
'not_improved' added to the VAE extras — runner.py) must restore through
CheckpointManager.restore(defaults=...) instead of dying on orbax's
"tree structures do not match ... MISSING".  Checkpoints cost ~20 min to
save through the remote-TPU tunnel; losing them to a layout change is not
acceptable.
"""

import numpy as np
import optax
import pytest

from melspec_gpt_vqvae_tpu.training.checkpoint import (CheckpointManager,
                                                       migrate_legacy_tree,
                                                       shape_template)
from melspec_gpt_vqvae_tpu.training.optim import get_lr, gpt_adamw

import jax.numpy as jnp


def _params():
    return {"blocks": {"attn_qkv": {"w": jnp.arange(6, dtype=jnp.float32
                                                    ).reshape(2, 3)}},
            "head": {"w": jnp.ones((3, 2))}}


def _legacy_opt_state(params, lr=1e-4):
    """The pre-round-4 optimizer: bare chain, LR baked into scale()."""
    tx = optax.chain(optax.scale_by_adam(b1=0.9, b2=0.95),
                     optax.add_decayed_weights(0.01),
                     optax.scale(-lr))
    return tx.init(params)


def _new_state(params, lr=3e-4):
    tx = gpt_adamw(lr)
    return {"params": params, "opt_state": tx.init(params),
            "step": jnp.zeros((), jnp.int32)}


def test_legacy_gpt_checkpoint_restores_with_migration(tmp_path):
    params = _params()
    legacy = {"state": {"params": params,
                        "opt_state": _legacy_opt_state(params),
                        "step": jnp.asarray(7, jnp.int32)},
              "epoch": 3}
    ckpt = CheckpointManager(str(tmp_path / "v0"))
    ckpt.save(legacy, step=7, metric=1.0)
    ckpt.wait()

    fresh = _new_state(params, lr=3e-4)
    # mutate a param leaf so we can tell checkpoint values from defaults
    fresh["params"]["head"]["w"] = jnp.full((3, 2), 9.0)
    restored = ckpt.restore("last", template={
        "state": shape_template(fresh), "epoch": 0},
        defaults={"state": fresh, "epoch": 0})

    st = restored["state"]
    # checkpoint values won (params, adam moments, step, epoch)
    np.testing.assert_array_equal(np.asarray(st["params"]["head"]["w"]),
                                  np.ones((3, 2)))
    assert int(restored["epoch"]) == 3
    assert int(st["step"]) == 7
    legacy_mu = legacy["state"]["opt_state"][0].mu
    got_mu = st["opt_state"].inner_state[0].mu
    np.testing.assert_array_equal(np.asarray(got_mu["head"]["w"]),
                                  np.asarray(legacy_mu["head"]["w"]))
    # wrapper leaves filled from the fresh defaults (live-LR contract)
    assert float(get_lr(st["opt_state"])) == pytest.approx(3e-4)
    assert int(st["opt_state"].count) == 0


def test_legacy_vae_extras_gain_not_improved(tmp_path):
    params = _params()
    legacy = {"state": {"params": params,
                        "opt_state": _legacy_opt_state(params),
                        "step": jnp.asarray(2, jnp.int32)},
              "epoch": 1,
              "extras": {"best_loss": 2.5, "pre_mi": 0.1}}
    ckpt = CheckpointManager(str(tmp_path / "v0"))
    ckpt.save(legacy, step=2)
    ckpt.wait()

    fresh = _new_state(params)
    extras0 = {"best_loss": 1e4, "pre_mi": 0.0, "not_improved": 0}
    restored = ckpt.restore("last", template={
        "state": shape_template(fresh), "epoch": 0,
        "extras": dict(extras0)},
        defaults={"state": fresh, "epoch": 0, "extras": extras0})
    assert restored["extras"]["best_loss"] == pytest.approx(2.5)
    assert restored["extras"]["pre_mi"] == pytest.approx(0.1)
    assert restored["extras"]["not_improved"] == 0  # filled default


def test_new_checkpoint_roundtrip_unchanged(tmp_path):
    """defaults= must not change behaviour for current-layout saves."""
    params = _params()
    state = _new_state(params, lr=2e-4)
    ckpt = CheckpointManager(str(tmp_path / "v0"))
    ckpt.save({"state": state, "epoch": 0}, step=1)
    ckpt.wait()
    restored = ckpt.restore("last", template={
        "state": shape_template(state), "epoch": 0},
        defaults={"state": state, "epoch": 0})
    assert float(get_lr(restored["state"]["opt_state"])) \
        == pytest.approx(2e-4)


def test_migration_refuses_to_default_real_params(tmp_path):
    """A checkpoint genuinely missing a model leaf must still fail loudly
    — only wrapper/extras keys are fillable from defaults."""
    params = _params()
    legacy = {"state": {"params": {"head": params["head"]},  # blocks absent
                        "opt_state": _legacy_opt_state(
                            {"head": params["head"]}),
                        "step": jnp.asarray(0, jnp.int32)},
              "epoch": 0}
    ckpt = CheckpointManager(str(tmp_path / "v0"))
    ckpt.save(legacy, step=0)
    ckpt.wait()
    fresh = _new_state(params)
    with pytest.raises(ValueError, match="migration failed"):
        ckpt.restore("last", template={
            "state": shape_template(fresh), "epoch": 0},
            defaults={"state": fresh, "epoch": 0})


def test_restore_without_defaults_gives_actionable_error(tmp_path):
    params = _params()
    legacy = {"state": {"params": params,
                        "opt_state": _legacy_opt_state(params),
                        "step": jnp.asarray(0, jnp.int32)},
              "epoch": 0}
    ckpt = CheckpointManager(str(tmp_path / "v0"))
    ckpt.save(legacy, step=0)
    ckpt.wait()
    fresh = _new_state(params)
    with pytest.raises(ValueError, match="predates"):
        ckpt.restore("last", template={
            "state": shape_template(fresh), "epoch": 0})


def test_migrate_legacy_tree_direct():
    """Unit-level: inner_state stripping + whitelist fill, no orbax."""
    raw = {"a": {"opt_state": {"0": {"mu": 1.0}}}}
    tmpl_opt = optax.inject_hyperparams(
        lambda learning_rate: optax.chain(optax.sgd(learning_rate)))(
        learning_rate=0.5).init({"x": jnp.zeros(())})
    # build a template whose inner path mirrors raw's legacy layout
    import collections
    Leafy = collections.namedtuple("Leafy", ["inner_state", "hyperparams"])
    tmpl = {"a": {"opt_state": Leafy(
        inner_state={"0": {"mu": jnp.zeros(())}},
        hyperparams={"learning_rate": jnp.asarray(0.5)})}}
    out, filled = migrate_legacy_tree(
        raw, tmpl, defaults=tmpl)
    assert out["a"]["opt_state"].inner_state["0"]["mu"] == 1.0
    assert float(out["a"]["opt_state"].hyperparams["learning_rate"]) == 0.5
    assert filled == ["a/opt_state/hyperparams/learning_rate"]


def test_migrate_refuses_inner_chain_leaves_named_like_wrapper_state():
    """A leaf INSIDE inner_state is the real optimizer chain even when it
    shares a whitelisted name ('count', scale_by_adam's step counter):
    filling it from fresh defaults next to checkpoint-valued moments
    would corrupt bias correction, so it must hard-error, not fill."""
    import collections
    Leafy = collections.namedtuple("Leafy", ["inner_state", "count"])
    # raw legacy chain has mu but its adam 'count' is missing entirely
    raw = {"opt_state": {"0": {"mu": 1.0}}}
    tmpl = {"opt_state": Leafy(
        inner_state={"0": {"mu": jnp.zeros(()),
                           "count": jnp.zeros((), jnp.int32)}},
        count=jnp.zeros((), jnp.int32))}
    with pytest.raises(ValueError, match="inner_state/0/count"):
        migrate_legacy_tree(raw, tmpl, defaults=tmpl)
    # ...while the WRAPPER-level count (same name, outside inner_state)
    # still fills from defaults
    raw2 = {"opt_state": {"0": {"mu": 1.0,
                                "count": jnp.ones((), jnp.int32)}}}
    out, filled = migrate_legacy_tree(raw2, tmpl, defaults=tmpl)
    assert filled == ["opt_state/count"]
    assert int(out["opt_state"].inner_state["0"]["count"]) == 1
