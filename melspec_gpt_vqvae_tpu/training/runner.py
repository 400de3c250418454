"""Training loops: the Lightning-Trainer role (fit/validate/test) for both
tasks, with checkpointing, TensorBoard logging, media callbacks and resume.

Replaces the reference's ``pl.Trainer`` usage
(/root/reference/GPT_train.py:106-153, GPT_VAE_train.py:166-211): epoch
loop, per-epoch validation, ModelCheckpoint(best+last), LR monitor scalars,
periodic media logging, ``ckpt_path`` resume.

Multi-host semantics: epoch metric sums are reduced across processes
(``cross_process_sum`` — the reference's ``sync_dist=True``,
Lit_GPT_VAE.py:310-313) so printed metrics and the best-checkpoint decision
are global, and the hot loops never force a per-step host sync — the python
step counter shadows the device one (they advance in lockstep by
construction of the jitted train steps).
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import is_primary
from ..parallel.reduce import cross_process_sum
from ..utils.profiling import StepTimer
from .checkpoint import (CheckpointManager, place_like,
                         shape_template)
from .logging import TBLogger


def _host(x):
    return float(jax.device_get(x))


def _live_lr(task, state) -> float:
    """The optimizer's ACTUAL learning rate (the reference attaches a
    LearningRateMonitor reading the optimizer, GPT_train.py:92) from the
    inject_hyperparams opt state; bespoke optimizer states without one
    (the VQ-VAE's two plain Adams) fall back to the config constant."""
    try:
        from .optim import get_lr
        return _host(get_lr(state["opt_state"]))
    except (AttributeError, KeyError, TypeError):
        return task.exp.train.learning_rate


def _global_mean(local_sum: float, local_count: float) -> float:
    """Mean over all processes' (sum, count) pairs."""
    r = cross_process_sum({"sum": local_sum, "count": local_count})
    return r["sum"] / r["count"] if r["count"] else float("nan")


def _resume_position(ckpt: "CheckpointManager", restored_epoch: int):
    """Map a restored checkpoint to (start_epoch, start_batch).

    End-of-epoch checkpoints (batch_idx -1, incl. every pre-feature
    checkpoint) resume at the NEXT epoch's first batch; mid-epoch ones
    (``--ckpt_every_steps`` / ``--max_steps`` saves) resume inside the
    SAME epoch at the first unconsumed batch — the reference's Lightning
    restores mid-training seamlessly (GPT_VAE_train.py:188-190); here it
    is exact because step RNG and batch order are pure functions of
    (seed, epoch, i), pinned by
    tests/test_runner.py::test_midepoch_resume_equivalence_*."""
    b = getattr(ckpt, "restored_batch_idx", -1)
    if b >= 0:
        return restored_epoch, b + 1
    return restored_epoch + 1, 0


def _should_save(epoch: int, epochs: int, ckpt_every: int) -> bool:
    """Per-epoch checkpointing like the reference ModelCheckpoint by
    default (ckpt_every=1); ``ckpt_every=N`` saves every Nth epoch plus
    the final one, ``ckpt_every=0`` only the final one, ``-1`` never —
    for environments where the device->host snapshot is expensive
    (remote-TPU tunnel: bursts ~10-34 MB/s but sustained ~2 MB/s; see
    training/checkpoint.py + BENCH_NOTES.md)."""
    if ckpt_every < 0:
        return False
    if epoch == epochs - 1:
        return True
    return ckpt_every > 0 and (epoch + 1) % ckpt_every == 0


def fit_gpt(task, dm, *, epochs: int, log: TBLogger,
            ckpt: CheckpointManager, seed: int = 783435,
            logging_frequency: int = 200,
            media_cb: Optional[Callable] = None,
            resume: Optional[str] = None,
            limit_train_batches: Optional[int] = None,
            limit_val_batches: Optional[int] = None,
            ckpt_every: int = 1, ckpt_every_steps: int = 0,
            max_steps: Optional[int] = None):
    """Train the class-conditional GPT (reference loop semantics:
    GPT_train.py:124-128 + Lit_minGPT train/val steps).

    ``ckpt_every_steps=N`` additionally saves ``last`` every N train steps
    WITH its mid-epoch position; ``max_steps`` stops (and saves) after that
    many total optimizer steps, possibly mid-epoch.  Both resume exactly
    (see _resume_position); a resumed partial epoch's printed train loss
    averages only its remaining batches."""
    state = task.init_state(seed)
    start_epoch, start_batch = 0, 0
    if resume:
        restored = ckpt.restore(resume, template={
            "state": shape_template(state),
            "epoch": 0}, defaults={"state": state, "epoch": 0})
        state = place_like(restored["state"], state)
        start_epoch, start_batch = _resume_position(
            ckpt, int(restored["epoch"]))
        print(f"Restored from {resume} at epoch {start_epoch}" +
              (f" batch {start_batch}" if start_batch else ""))

    rng = jax.random.PRNGKey(seed)
    train_loader = dm.train_dataloader()
    val_loader = dm.val_dataloader()
    timer = task.perf_timer() if hasattr(task, "perf_timer") \
        else StepTimer()
    # one host sync per fit; afterwards the python counter shadows the
    # device step (train_step increments by exactly 1)
    step = int(jax.device_get(state["step"]))

    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        # resumed epoch: skip the already-consumed prefix without loading
        # its data; `gi` below is the batch's TRUE index within the epoch
        off = start_batch if epoch == start_epoch else 0
        # see fit_vae: only touch the loader when a skip is needed
        if off or getattr(train_loader, "start_batch", 0):
            train_loader.set_start_batch(off)
        # step RNG is a pure function of (seed, epoch, gi) — NOT a stream
        # split sequentially from fit-start — so an interrupted run resumed
        # at epoch N (or mid-epoch at batch i) sees the exact dropout keys
        # the uninterrupted run saw (resume-continuation equivalence,
        # pinned by tests/test_runner.py::test_resume_continuation_* and
        # ::test_midepoch_resume_equivalence_gpt)
        epoch_rng = jax.random.fold_in(rng, epoch)
        t0 = time.time()
        losses = []
        for i, batch in enumerate(train_loader):
            gi = i + off
            if limit_train_batches and gi >= limit_train_batches:
                break
            step_rng = jax.random.fold_in(epoch_rng, gi)
            state, loss = task.train_step(state, batch, step_rng)
            losses.append(loss)
            step += 1
            perf = timer.tick(len(batch["target"]))
            if perf:
                log.scalars(perf, step)
            if gi % 50 == 0:
                log.scalar("train/loss_step", loss, step)
                log.scalar("learning_rate", _live_lr(task, state), step)
            if media_cb and logging_frequency and \
                    (gi % logging_frequency == 0):
                media_cb(state, batch, step, "train")
            hit_budget = max_steps is not None and step >= max_steps
            # cadence keyed to the GLOBAL optimizer step (matches the CLI
            # help "every N train steps"): a per-epoch batch index would
            # reset each epoch and drift when epoch length % N != 0
            if hit_budget or (ckpt_every_steps and
                              step % ckpt_every_steps == 0):
                # mid-epoch save: no val metric exists here, so only
                # `last` is written (never `best`)
                ckpt.save({"state": state, "epoch": epoch}, step,
                          batch_idx=gi)
            if hit_budget:
                if is_primary():
                    print(f"max_steps {max_steps} reached at epoch "
                          f"{epoch} batch {gi}; stopping")
                ckpt.wait()
                return state

        # ONE d2h fetch for the whole epoch: per-element _host() would
        # issue len(losses) sequential round trips through the remote
        # tunnel (seconds per epoch at thousands of steps)
        train_loss = _global_mean(
            float(jnp.sum(jnp.stack(losses))), len(losses)) \
            if losses else float("nan")
        # validation (loss sums weighted by batch size, reduced globally)
        val_sum, val_count = 0.0, 0.0
        for i, batch in enumerate(val_loader):
            if limit_val_batches and i >= limit_val_batches:
                break
            b = len(batch["target"])
            val_sum += _host(task.eval_step(state, batch)) * b
            val_count += b
            if media_cb and logging_frequency and \
                    (i % logging_frequency == 0):
                media_cb(state, batch, step, "val")
        val_loss = _global_mean(val_sum, val_count)

        log.scalar("train/loss_epoch", train_loss, step)
        log.scalar("val/loss", val_loss, step)
        if is_primary():
            print(f"epoch {epoch}: train/loss {train_loss:.4f} "
                  f"val/loss {val_loss:.4f} ({time.time() - t0:.1f}s)")
        # every process enters save (orbax coordinates multi-host writes);
        # the monitored metric is the GLOBAL val loss on all of them
        if _should_save(epoch, epochs, ckpt_every):
            ckpt.save({"state": state, "epoch": epoch}, step,
                      metric=val_loss)
    ckpt.wait()   # async save must be durable before the fit returns
    return state


def validate_gpt(task, dm, *, ckpt: CheckpointManager,
                 resume: Optional[str] = None,
                 limit_val_batches: Optional[int] = None) -> float:
    state = task.init_state()
    if resume:
        restored = ckpt.restore(resume, template={
            "state": shape_template(state), "epoch": 0},
            defaults={"state": state, "epoch": 0})
        state = place_like(restored["state"], state)
    val_sum, val_count = 0.0, 0.0
    for i, batch in enumerate(dm.val_dataloader()):
        if limit_val_batches and i >= limit_val_batches:
            break
        b = len(batch["target"])
        val_sum += _host(task.eval_step(state, batch)) * b
        val_count += b
    val = _global_mean(val_sum, val_count)
    print(f"val/loss {val:.4f}")
    return val


def fit_vae(task, dm, *, epochs: int, log: TBLogger,
            ckpt: CheckpointManager, seed: int = 783435,
            logging_frequency: int = 500,
            media_cb: Optional[Callable] = None,
            epoch_end_cb: Optional[Callable] = None,
            resume: Optional[str] = None,
            limit_train_batches: Optional[int] = None,
            limit_val_batches: Optional[int] = None,
            ckpt_every: int = 1, ckpt_every_steps: int = 0,
            max_steps: Optional[int] = None):
    """Train the GPT-VAE (reference: GPT_VAE_train.py:186-190 +
    Lit_GPT_VAE train/val/epoch-end machinery).  The checkpoint carries
    kl_weight inside the state plus best_loss/pre_mi extras
    (reference on_save_checkpoint: Lit_GPT_VAE.py:959-964).
    ``ckpt_every_steps`` / ``max_steps``: mid-epoch save / stop with exact
    resume, as in fit_gpt (kl_weight anneal rides inside the state, so the
    anneal trajectory survives a mid-epoch restart too)."""
    state = task.init_state(seed)
    start_epoch, start_batch = 0, 0
    extras: Dict[str, Any] = {"best_loss": 1e4, "pre_mi": 0.0,
                              "not_improved": 0}
    if resume:
        restored = ckpt.restore(resume, template={
            "state": shape_template(state),
            "epoch": 0, "extras": extras},
            defaults={"state": state, "epoch": 0, "extras": dict(extras)})
        state = place_like(restored["state"], state)
        extras = restored["extras"]
        start_epoch, start_batch = _resume_position(
            ckpt, int(restored["epoch"]))
        print(f"Restored from {resume} at epoch {start_epoch}" +
              (f" batch {start_batch}" if start_batch else ""))

    rng = jax.random.PRNGKey(seed)
    eval_base = jax.random.PRNGKey(seed + 1)
    train_loader = dm.train_dataloader()
    val_loader = dm.val_dataloader()
    timer = task.perf_timer() if hasattr(task, "perf_timer") \
        else StepTimer()
    step = int(jax.device_get(state["step"]))

    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        off = start_batch if epoch == start_epoch else 0
        # only touch the loader when a skip is needed (or must be reset):
        # duck-typed stand-in loaders without set_start_batch keep working
        if off or getattr(train_loader, "start_batch", 0):
            train_loader.set_start_batch(off)
        # resume-invariant step keys: pure function of (seed, epoch, gi),
        # see fit_gpt
        epoch_rng = jax.random.fold_in(rng, epoch)
        t0 = time.time()
        for i, batch in enumerate(train_loader):
            gi = i + off
            if limit_train_batches and gi >= limit_train_batches:
                break
            step_rng = jax.random.fold_in(epoch_rng, gi)
            state, loss, report = task.train_step(state, batch, step_rng,
                                                  epoch=epoch)
            step += 1
            perf = timer.tick(batch["codes"].shape[0])
            if perf:
                log.scalars(perf, step)
            if gi % 50 == 0:
                # report values are device arrays; TBLogger materialises
                # them here (and only here)
                log.scalars(report, step)
            if media_cb and logging_frequency and \
                    (gi % logging_frequency == 0):
                media_cb(state, batch, step, "train")
            hit_budget = max_steps is not None and step >= max_steps
            # global-step cadence, see fit_gpt
            if hit_budget or (ckpt_every_steps and
                              step % ckpt_every_steps == 0):
                ckpt.save({"state": state, "epoch": epoch,
                           "extras": extras}, step, batch_idx=gi)
            if hit_budget:
                if is_primary():
                    print(f"max_steps {max_steps} reached at epoch "
                          f"{epoch} batch {gi}; stopping")
                ckpt.wait()
                return state

        # validation epoch (aggregated NLL/PPL, reference :363-383) with a
        # per-epoch pinned eval key so the monitored metric is reproducible
        epoch_key = jax.random.fold_in(eval_base, epoch)
        outputs = []
        val_tokens = []   # (B, T) arrays for the epoch-end MI/AU callback
        for i, batch in enumerate(val_loader):
            if limit_val_batches and i >= limit_val_batches:
                break
            outputs.append(task.eval_step(state, batch,
                                          jax.random.fold_in(epoch_key, i)))
            if epoch_end_cb and hasattr(task, "batch_tokens"):
                val_tokens.append(np.asarray(task.batch_tokens(batch)))
        agg = {}
        if outputs:
            sums = cross_process_sum(task.sum_outputs(outputs))
            agg = task.metrics_from_sums(sums)
        for k, v in agg.items():
            log.scalar(f"val/{k}", v, step)

        if is_primary():
            print(f"epoch {epoch}: " +
                  " ".join(f"val/{k} {v:.4f}" for k, v in agg.items()) +
                  f" kl_w {_host(state['kl_weight']):.4f}"
                  f" ({time.time() - t0:.1f}s)")
        if agg:
            # best-loss / plateau bookkeeping mirrors the reference's
            # callbeck_of_my_dreams (GPT_VAE_callbacks.py:449-515): a
            # non-improving epoch bumps not_improved; an improving one
            # resets it and takes the new best.  The LR decay itself is
            # the reference's commented-out machinery (lr *= lr_decay
            # after lr_decay_patience stale epochs, gated on
            # epoch >= lr_decay_start), opt-in via train.lr_decay > 0.
            tr = task.exp.train
            # min_delta: improvements smaller than the threshold neither
            # reset the stale counter nor advance best_loss
            # (ReduceLROnPlateau semantics; min_delta=0 keeps the old
            # any-improvement-resets behaviour).
            min_delta = getattr(tr, "lr_decay_min_delta", 0.0)
            if agg["loss"] > extras["best_loss"] - min_delta:
                extras["not_improved"] = extras.get("not_improved", 0) + 1
                if (getattr(tr, "lr_decay", 0.0)
                        and extras["not_improved"] >= tr.lr_decay_patience
                        and epoch >= tr.lr_decay_start):
                    from .optim import get_lr, with_lr
                    new_lr = get_lr(state["opt_state"]) * tr.lr_decay
                    state = dict(state,
                                 opt_state=with_lr(state["opt_state"],
                                                   new_lr))
                    extras["not_improved"] = 0
                    if is_primary():
                        print(f"epoch {epoch}: val loss plateaued "
                              f"{tr.lr_decay_patience} epochs -> "
                              f"lr {_host(new_lr):.3e}")
            else:
                extras["not_improved"] = 0
                extras["best_loss"] = agg["loss"]
            log.scalar("learning_rate", _live_lr(task, state), step)
        if _should_save(epoch, epochs, ckpt_every):
            ckpt.save({"state": state, "epoch": epoch, "extras": extras},
                      step, metric=agg.get("loss"))
        if epoch_end_cb:
            # reuse this pass's token arrays (no second val-loader read);
            # callbacks without a tokens kwarg keep the old 4-arg call
            import inspect
            if "tokens" in inspect.signature(epoch_end_cb).parameters:
                epoch_end_cb(state, epoch, agg, extras,
                             tokens=val_tokens or None)
            else:
                epoch_end_cb(state, epoch, agg, extras)
    ckpt.wait()   # async save must be durable before the fit returns
    return state


def evaluate_vae(task, dm, *, split: str = "val",
                 ckpt: Optional[CheckpointManager] = None,
                 resume: Optional[str] = None, compute_mi_au: bool = False,
                 iw_nsamples: int = 0,
                 limit_batches: Optional[int] = None) -> Dict[str, float]:
    """validate/test entry (reference test_epoch_end prints loss, kl, recon,
    nll, ppl, active_units, mutual_info: Lit_GPT_VAE.py:571-607; the
    importance-weighted NLL/PPL driver is reference utils.py:50-77)."""
    state = task.init_state()
    if resume and ckpt:
        extras0 = {"best_loss": 0.0, "pre_mi": 0.0, "not_improved": 0}
        restored = ckpt.restore(resume, template={
            "state": shape_template(state),
            "epoch": 0, "extras": dict(extras0)},
            defaults={"state": state, "epoch": 0, "extras": extras0})
        state = place_like(restored["state"], state)
    loader = dm.test_dataloader() if split == "test" else dm.val_dataloader()
    rng = jax.random.PRNGKey(0)
    # ONE loader pass: eval metrics are scalars; MI/AU and IW-NLL reuse the
    # tiny (B, T) int32 token arrays instead of hoarding full batches (a
    # VGGSound val batch list would hold ~5 GB of 80x848 f32 `image` specs)
    outputs, tokens = [], []
    keep_tokens = compute_mi_au or (iw_nsamples and iw_nsamples > 0)
    for i, batch in enumerate(loader):
        if limit_batches and i >= limit_batches:
            break
        rng, r = jax.random.split(rng)
        outputs.append(task.eval_step(state, batch, r))
        if keep_tokens:
            tokens.append(np.asarray(task.batch_tokens(batch)))
    agg = task.metrics_from_sums(
        cross_process_sum(task.sum_outputs(outputs)))
    if compute_mi_au:
        mi, au, _ = task.calc_mi_au(state, tokens)
        agg["mutual_info"] = mi
        agg["active_units"] = au
    if iw_nsamples and iw_nsamples > 0:
        iw_nll, iw_ppl = task.calc_iwnll(state, tokens,
                                         nsamples=iw_nsamples)
        agg["iw_nll"] = iw_nll
        agg["iw_ppl"] = iw_ppl
    print(f"{split}: " + " ".join(f"{k} {v:.4f}" for k, v in agg.items()))
    return agg
