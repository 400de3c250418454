"""Training loops: the Lightning-Trainer role (fit/validate/test) for both
tasks, with checkpointing, TensorBoard logging, media callbacks and resume.

Replaces the reference's ``pl.Trainer`` usage
(/root/reference/GPT_train.py:106-153, GPT_VAE_train.py:166-211): epoch
loop, per-epoch validation, ModelCheckpoint(best+last), LR monitor scalars,
periodic media logging, ``ckpt_path`` resume.
"""

from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import is_primary
from ..utils.profiling import StepTimer
from .checkpoint import CheckpointManager
from .logging import TBLogger


def _host(x):
    return float(jax.device_get(x))


def fit_gpt(task, dm, *, epochs: int, log: TBLogger,
            ckpt: CheckpointManager, seed: int = 783435,
            logging_frequency: int = 200,
            media_cb: Optional[Callable] = None,
            resume: Optional[str] = None,
            limit_train_batches: Optional[int] = None,
            limit_val_batches: Optional[int] = None):
    """Train the class-conditional GPT (reference loop semantics:
    GPT_train.py:124-128 + Lit_minGPT train/val steps)."""
    state = task.init_state(seed)
    start_epoch = 0
    if resume:
        restored = ckpt.restore(resume, template={
            "state": jax.tree_util.tree_map(np.asarray, state),
            "epoch": 0})
        state = restored["state"]
        start_epoch = int(restored["epoch"]) + 1
        print(f"Restored from {resume} at epoch {start_epoch}")

    rng = jax.random.PRNGKey(seed)
    train_loader = dm.train_dataloader()
    val_loader = dm.val_dataloader()
    timer = StepTimer()

    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        losses = []
        for i, batch in enumerate(train_loader):
            if limit_train_batches and i >= limit_train_batches:
                break
            rng, step_rng = jax.random.split(rng)
            state, loss = task.train_step(state, batch, step_rng)
            losses.append(loss)
            step = int(jax.device_get(state["step"]))
            perf = timer.tick(len(batch["target"]))
            if perf:
                log.scalars(perf, step)
            if i % 50 == 0:
                log.scalar("train/loss_step", _host(loss), step)
                log.scalar("learning_rate", task.exp.train.learning_rate,
                           step)
            if media_cb and logging_frequency and \
                    (i % logging_frequency == 0):
                media_cb(state, batch, step, "train")

        train_loss = float(np.mean([_host(l) for l in losses])) if losses \
            else float("nan")
        # validation
        val_losses = []
        for i, batch in enumerate(val_loader):
            if limit_val_batches and i >= limit_val_batches:
                break
            val_losses.append(_host(task.eval_step(state, batch)))
            if media_cb and logging_frequency and \
                    (i % logging_frequency == 0):
                media_cb(state, batch, int(jax.device_get(state["step"])),
                         "val")
        val_loss = float(np.mean(val_losses)) if val_losses else float("nan")

        step = int(jax.device_get(state["step"]))
        log.scalar("train/loss_epoch", train_loss, step)
        log.scalar("val/loss", val_loss, step)
        if is_primary():
            print(f"epoch {epoch}: train/loss {train_loss:.4f} "
                  f"val/loss {val_loss:.4f} ({time.time() - t0:.1f}s)")
            ckpt.save({"state": state, "epoch": epoch}, step,
                      metric=val_loss)
    return state


def validate_gpt(task, dm, *, ckpt: CheckpointManager,
                 resume: Optional[str] = None,
                 limit_val_batches: Optional[int] = None) -> float:
    state = task.init_state()
    if resume:
        restored = ckpt.restore(resume, template={
            "state": jax.tree_util.tree_map(np.asarray, state), "epoch": 0})
        state = restored["state"]
    losses = []
    for i, batch in enumerate(dm.val_dataloader()):
        if limit_val_batches and i >= limit_val_batches:
            break
        losses.append(_host(task.eval_step(state, batch)))
    val = float(np.mean(losses))
    print(f"val/loss {val:.4f}")
    return val


def fit_vae(task, dm, *, epochs: int, log: TBLogger,
            ckpt: CheckpointManager, seed: int = 783435,
            logging_frequency: int = 500,
            media_cb: Optional[Callable] = None,
            epoch_end_cb: Optional[Callable] = None,
            resume: Optional[str] = None,
            limit_train_batches: Optional[int] = None,
            limit_val_batches: Optional[int] = None):
    """Train the GPT-VAE (reference: GPT_VAE_train.py:186-190 +
    Lit_GPT_VAE train/val/epoch-end machinery).  The checkpoint carries
    kl_weight inside the state plus best_loss/pre_mi extras
    (reference on_save_checkpoint: Lit_GPT_VAE.py:959-964)."""
    state = task.init_state(seed)
    start_epoch = 0
    extras: Dict[str, Any] = {"best_loss": 1e4, "pre_mi": 0.0}
    if resume:
        restored = ckpt.restore(resume, template={
            "state": jax.tree_util.tree_map(np.asarray, state),
            "epoch": 0, "extras": extras})
        state = restored["state"]
        extras = restored["extras"]
        start_epoch = int(restored["epoch"]) + 1
        print(f"Restored from {resume} at epoch {start_epoch}")

    rng = jax.random.PRNGKey(seed)
    train_loader = dm.train_dataloader()
    val_loader = dm.val_dataloader()
    timer = StepTimer()

    for epoch in range(start_epoch, epochs):
        train_loader.set_epoch(epoch)
        t0 = time.time()
        for i, batch in enumerate(train_loader):
            if limit_train_batches and i >= limit_train_batches:
                break
            rng, step_rng = jax.random.split(rng)
            state, loss, report = task.train_step(state, batch, step_rng,
                                                  epoch=epoch)
            step = int(jax.device_get(state["step"]))
            perf = timer.tick(batch["codes"].shape[0])
            if perf:
                log.scalars(perf, step)
            if i % 50 == 0:
                log.scalars(report, step)
            if media_cb and logging_frequency and \
                    (i % logging_frequency == 0):
                media_cb(state, batch, step, "train")

        # validation epoch (aggregated NLL/PPL, reference :363-383)
        outputs = []
        for i, batch in enumerate(val_loader):
            if limit_val_batches and i >= limit_val_batches:
                break
            rng, eval_rng = jax.random.split(rng)
            outputs.append(task.eval_step(state, batch, eval_rng))
        agg = task.aggregate_epoch(outputs) if outputs else {}
        step = int(jax.device_get(state["step"]))
        for k, v in agg.items():
            log.scalar(f"val/{k}", v, step)

        if is_primary():
            print(f"epoch {epoch}: " +
                  " ".join(f"val/{k} {v:.4f}" for k, v in agg.items()) +
                  f" kl_w {_host(state['kl_weight']):.4f}"
                  f" ({time.time() - t0:.1f}s)")
            if agg and agg["loss"] < extras["best_loss"]:
                extras["best_loss"] = agg["loss"]
            ckpt.save({"state": state, "epoch": epoch, "extras": extras},
                      step, metric=agg.get("loss"))
        if epoch_end_cb:
            epoch_end_cb(state, epoch, agg, extras)
    return state


def evaluate_vae(task, dm, *, split: str = "val",
                 ckpt: Optional[CheckpointManager] = None,
                 resume: Optional[str] = None, compute_mi_au: bool = False,
                 limit_batches: Optional[int] = None) -> Dict[str, float]:
    """validate/test entry (reference test_epoch_end prints loss, kl, recon,
    nll, ppl, active_units, mutual_info: Lit_GPT_VAE.py:571-607)."""
    state = task.init_state()
    if resume and ckpt:
        restored = ckpt.restore(resume, template={
            "state": jax.tree_util.tree_map(np.asarray, state),
            "epoch": 0, "extras": {"best_loss": 0.0, "pre_mi": 0.0}})
        state = restored["state"]
    loader = dm.test_dataloader() if split == "test" else dm.val_dataloader()
    rng = jax.random.PRNGKey(0)
    outputs = []
    for i, batch in enumerate(loader):
        if limit_batches and i >= limit_batches:
            break
        rng, r = jax.random.split(rng)
        outputs.append(task.eval_step(state, batch, r))
    agg = task.aggregate_epoch(outputs)
    if compute_mi_au:
        loader2 = (dm.test_dataloader() if split == "test"
                   else dm.val_dataloader())
        batches = []
        for i, b in enumerate(loader2):
            if limit_batches and i >= limit_batches:
                break
            batches.append(b)
        mi, au, _ = task.calc_mi_au(state, batches)
        agg["mutual_info"] = mi
        agg["active_units"] = au
    print(f"{split}: " + " ".join(f"{k} {v:.4f}" for k, v in agg.items()))
    return agg
