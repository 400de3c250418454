#!/usr/bin/env python
"""REAL multi-process distributed validation (2 x jax.distributed on CPU).

The reference actually runs multi-rank DDP
(/root/reference/GPT_VAE_train.py:166-182: Lightning
``strategy="ddp_find_unused_parameters_false"`` + NCCL); until round 3 the
repo's multi-process layer was only ever exercised through a fake
in-process transport and a single-process virtual mesh.  This script
executes the real thing: it spawns TWO OS processes, each with 4 virtual
CPU devices, joined by ``jax.distributed.initialize`` (Gloo collectives),
and proves on a synthetic VAS tree that

  * the per-host interleaved loader shard + ``put_batch``
    (``jax.make_array_from_process_local_data``) reconstruct exactly the
    global batches a single-process run consumes
    (data/loader.py + parallel/mesh.py);
  * a full ``fit_gpt`` epoch — jitted train steps over the 8-device
    global mesh, real ``process_allgather`` metric reduction
    (parallel/reduce.py:33-35), orbax's coordinated all-process
    checkpoint save (training/runner.py + checkpoint.py) — yields a
    global val loss equal to a single-process run over the same data;
  * the multi-host-written checkpoint restores in a fresh single process
    and reproduces the same val loss.

Usage:
  python scripts/dryrun_multiprocess.py            # parent: orchestrates
Roles (internal): --role child|single|restore
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

N_ITEMS_TRAIN, N_ITEMS_VAL = 16, 8
BATCH_PER_HOST = 4            # global batch 8 with 2 processes
EPOCHS = 2                    # two saves: exercises best-copy + overwrite
SEED = 783435


def _env_for(devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    # prepend the repo, but KEEP the rest of PYTHONPATH — the remote-TPU
    # sitecustomize dir must stay importable or jax dies at startup
    # ("Backend 'axon' is not in the list of known backends", CLAUDE.md)
    env["PYTHONPATH"] = REPO + (
        ":" + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env.setdefault("JAX_COMPILATION_CACHE_DIR",
                   os.path.expanduser("~/.cache/jax_comp"))
    return env


def make_tree(root: str):
    """Tiny on-disk VAS layout (same shape as tests/test_data.py's
    fixture): features/<cls>/melspec_10s_22050hz/*_mel.npy + codes_10s/.
    Codes use vocab 16 so the dryrun GPT stays tiny."""
    import numpy as np
    rng = np.random.default_rng(0)
    data = os.path.join(root, "data")
    os.makedirs(data, exist_ok=True)
    lines = []
    per_class = (N_ITEMS_TRAIN + N_ITEMS_VAL) // 2
    for cls in ("baby", "dog"):
        mel_dir = os.path.join(root, "features", cls, "melspec_10s_22050hz")
        codes_dir = os.path.join(root, "features", cls, "codes_10s")
        os.makedirs(mel_dir, exist_ok=True)
        os.makedirs(codes_dir, exist_ok=True)
        for i in range(per_class):
            vid = f"video_{i:05d}"
            np.save(os.path.join(mel_dir, f"{vid}_mel.npy"),
                    rng.uniform(0, 1, (80, 860)).astype(np.float32))
            np.save(os.path.join(codes_dir, f"{vid}_mel_code.npy"),
                    rng.integers(0, 16, (5, 53)).astype(np.int64))
            lines.append(f"{cls}/{vid}")
    # stable interleaved class split
    order = lines[0::2] + lines[1::2]
    with open(os.path.join(data, "vas_train.txt"), "w") as f:
        f.write("\n".join(order[:N_ITEMS_TRAIN]) + "\n")
    with open(os.path.join(data, "vas_valid.txt"), "w") as f:
        f.write("\n".join(order[N_ITEMS_TRAIN:]) + "\n")


def _setup_run(tree: str, batch_size: int):
    """Shared child/single fit harness (imports jax AFTER env/dist init)."""
    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               GPTConfig, TrainConfig)
    from melspec_gpt_vqvae_tpu.parallel.mesh import make_mesh
    from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask

    # dropout 0 + f32 compute: multi-process and single-process runs see
    # identical global batches only as SETS (row order differs), so the
    # math must be row-permutation invariant for exact loss equality
    model = GPTConfig(vocab_size=16, block_size=266, n_layer=2, n_head=2,
                      n_embd=32, class_size=2, compute_dtype="float32")
    exp = ExperimentConfig(
        model=model,
        train=TrainConfig(learning_rate=1e-3, epochs=EPOCHS,
                          batch_size=batch_size),
        data=DataConfig(batch_size=batch_size))
    return GPTTask(exp, make_mesh()), _make_dm(tree, batch_size)


def _make_dm(tree: str, batch_size: int, pidx=None, pcount=None):
    """Synthetic-tree DataModule; pidx/pcount override the jax process
    identity so one process can emulate any shard view."""
    import jax
    from melspec_gpt_vqvae_tpu.data.loader import DataModule

    dm = DataModule(batch_size=batch_size,
                    spec_dir_path=os.path.join(
                        tree, "features", "*", "melspec_10s_22050hz"),
                    data_root=os.path.join(tree, "data"), seed=SEED,
                    process_index=jax.process_index() if pidx is None
                    else pidx,
                    process_count=jax.process_count() if pcount is None
                    else pcount)
    dm.setup()
    return dm


def _make_vae_task(batch_size: int):
    """Tiny VAE task (for the corpus-MI/AU collective check)."""
    from melspec_gpt_vqvae_tpu.configs import (DataConfig, ExperimentConfig,
                                               GPTConfig, TrainConfig,
                                               VAEConfig)
    from melspec_gpt_vqvae_tpu.parallel.mesh import make_mesh
    from melspec_gpt_vqvae_tpu.training.vae_task import VAETask

    model = GPTConfig(vocab_size=16, block_size=265, n_layer=1, n_head=2,
                      n_embd=16, class_size=None, compute_dtype="float32")
    exp = ExperimentConfig(
        model=model, vae=VAEConfig(nz=8),
        train=TrainConfig(learning_rate=1e-3, epochs=1,
                          batch_size=batch_size),
        data=DataConfig(batch_size=batch_size))
    return VAETask(exp, steps_per_epoch=2, mesh=make_mesh())


def run_mi(args):
    """Corpus MI/AU over the val split: 2-process shards + the collective
    posterior gather (parallel/reduce.py::cross_process_concat over real
    process_allgather) must reproduce the single-process full-corpus
    values — the reference computes MI/AU over the WHOLE val set on every
    rank (callbacks/GPT_VAE_callbacks.py:429-436)."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    if args.role == "mi_child":
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=2, process_id=args.pid)
        assert jax.process_count() == 2
    import numpy as np

    task = _make_vae_task(BATCH_PER_HOST)
    if args.role == "mi_child":
        dm = _make_dm(args.tree, BATCH_PER_HOST)
        toks = [np.asarray(task.batch_tokens(b))
                for b in dm.val_dataloader()]
    else:
        # single-process reference over the SAME corpus in gathered order
        # (rank-0 shard rows then rank-1 rows): the MI estimator draws one
        # z per posterior row, so row order must match for exact equality
        toks = []
        for pidx in (0, 1):
            dm = _make_dm(args.tree, BATCH_PER_HOST, pidx, 2)
            toks += [np.asarray(task.batch_tokens(b))
                     for b in dm.val_dataloader()]
    state = task.init_state(SEED)
    mi, au, _ = task.calc_mi_au(state, toks)
    print(json.dumps({"role": args.role, "pid": args.pid,
                      "mi": mi, "au": au}), flush=True)


def run_child(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{args.port}",
                               num_processes=2, process_id=args.pid)
    assert jax.process_count() == 2 and jax.device_count() == 8
    from melspec_gpt_vqvae_tpu.training import runner
    from melspec_gpt_vqvae_tpu.training.checkpoint import CheckpointManager
    from melspec_gpt_vqvae_tpu.training.logging import TBLogger

    task, dm = _setup_run(args.tree, BATCH_PER_HOST)
    log = TBLogger(os.path.join(args.out, f"tb_{args.pid}"))
    ckpt = CheckpointManager(args.ckpt)
    runner.fit_gpt(task, dm, epochs=EPOCHS, log=log, ckpt=ckpt, seed=SEED)
    # re-derive the final printed val loss for the parent to compare
    val = runner.validate_gpt(task, dm, ckpt=ckpt, resume="last")
    print(json.dumps({"role": "child", "pid": args.pid, "val": val}),
          flush=True)


def run_single(args):
    import jax
    jax.config.update("jax_platforms", "cpu")
    from melspec_gpt_vqvae_tpu.training import runner
    from melspec_gpt_vqvae_tpu.training.checkpoint import CheckpointManager
    from melspec_gpt_vqvae_tpu.training.logging import TBLogger

    task, dm = _setup_run(args.tree, 2 * BATCH_PER_HOST)  # global batch
    log = TBLogger(os.path.join(args.out, "tb_single"))
    ckpt = CheckpointManager(args.ckpt)
    runner.fit_gpt(task, dm, epochs=EPOCHS, log=log, ckpt=ckpt, seed=SEED)
    val = runner.validate_gpt(task, dm, ckpt=ckpt, resume="last")
    print(json.dumps({"role": "single", "val": val}), flush=True)


def run_restore(args):
    """Fresh single process restores the checkpoint the 2-process run
    wrote collectively and reproduces its val loss."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from melspec_gpt_vqvae_tpu.training import runner
    from melspec_gpt_vqvae_tpu.training.checkpoint import CheckpointManager

    task, dm = _setup_run(args.tree, 2 * BATCH_PER_HOST)
    ckpt = CheckpointManager(args.ckpt)
    val = runner.validate_gpt(task, dm, ckpt=ckpt, resume="last")
    val_best = runner.validate_gpt(task, dm, ckpt=ckpt, resume="best")
    print(json.dumps({"role": "restore", "val": val, "val_best": val_best}),
          flush=True)


def _last_json(out: str) -> dict:
    for line in reversed(out.strip().splitlines()):
        try:
            return json.loads(line)
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"no JSON line in output:\n{out}")


def run_parent():
    import socket
    import tempfile
    tmp = tempfile.mkdtemp(prefix="mp_dryrun_")
    tree = os.path.join(tmp, "vas")   # DataModule infers dataset by substring
    make_tree(tree)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    me = os.path.abspath(__file__)
    mp_ckpt = os.path.join(tmp, "ckpt_mp")

    def spawn(role, pid=None, ckpt=None, devices=4, use_port=None):
        cmd = [sys.executable, me, "--role", role, "--tree", tree,
               "--out", tmp, "--ckpt", ckpt or tmp,
               "--port", str(use_port or port)]
        if pid is not None:
            cmd += ["--pid", str(pid)]
        return subprocess.Popen(cmd, env=_env_for(devices),
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT, text=True)

    print("spawning 2 jax.distributed CPU processes (4 devices each)...",
          flush=True)
    procs = [spawn("child", pid=i, ckpt=mp_ckpt) for i in range(2)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for i, (p, o) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            raise SystemExit(f"child {i} failed:\n{o}")
    vals = [_last_json(o)["val"] for o in outs]
    print(f"2-process global val losses: {vals}")
    assert abs(vals[0] - vals[1]) < 1e-9, \
        f"ranks disagree on the GLOBAL val loss: {vals}"

    print("running single-process reference (8 devices, global batch)...",
          flush=True)
    sp = spawn("single", ckpt=os.path.join(tmp, "ckpt_sp"), devices=8)
    o = sp.communicate(timeout=900)[0]
    if sp.returncode != 0:
        raise SystemExit(f"single-process run failed:\n{o}")
    val_single = _last_json(o)["val"]
    print(f"single-process val loss: {val_single}")
    assert abs(vals[0] - val_single) < 1e-4, (
        f"multi-process val {vals[0]} != single-process {val_single} — "
        f"the runs must consume identical global batches")

    print("restoring the multi-host-written checkpoint in a fresh "
          "process...", flush=True)
    rp = spawn("restore", ckpt=mp_ckpt, devices=8)
    o = rp.communicate(timeout=900)[0]
    if rp.returncode != 0:
        raise SystemExit(f"restore run failed:\n{o}")
    r = _last_json(o)
    print(f"restored val loss: {r['val']} (best: {r['val_best']})")
    assert abs(r["val"] - vals[0]) < 1e-6, (r, vals)

    print("corpus-MI collective: 2-process posterior gather vs "
          "single-process full corpus...", flush=True)
    with socket.socket() as s:       # phase-1 coordinator port may linger
        s.bind(("localhost", 0))
        port2 = s.getsockname()[1]
    mprocs = [spawn("mi_child", pid=i, devices=4, use_port=port2)
              for i in range(2)]
    mouts = [p.communicate(timeout=600)[0] for p in mprocs]
    for i, (p, o) in enumerate(zip(mprocs, mouts)):
        if p.returncode != 0:
            raise SystemExit(f"mi_child {i} failed:\n{o}")
    mis = [_last_json(o) for o in mouts]
    assert abs(mis[0]["mi"] - mis[1]["mi"]) < 1e-9 \
        and mis[0]["au"] == mis[1]["au"], \
        f"ranks disagree on the GLOBAL corpus MI/AU: {mis}"
    msp = spawn("mi_single", devices=8)
    o = msp.communicate(timeout=600)[0]
    if msp.returncode != 0:
        raise SystemExit(f"mi_single run failed:\n{o}")
    ms = _last_json(o)
    print(f"2-process corpus MI {mis[0]['mi']:.6f} au {mis[0]['au']} | "
          f"single-process {ms['mi']:.6f} au {ms['au']}")
    assert abs(mis[0]["mi"] - ms["mi"]) < 1e-6 and mis[0]["au"] == ms["au"], \
        (mis, ms)

    print(json.dumps({"ok": True, "val_multiprocess": vals[0],
                      "val_singleprocess": val_single,
                      "val_restored": r["val"],
                      "mi_multiprocess": mis[0]["mi"],
                      "mi_singleprocess": ms["mi"],
                      "au_multiprocess": mis[0]["au"],
                      "au_singleprocess": ms["au"]}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--role", default="parent",
                    choices=["parent", "child", "single", "restore",
                             "mi_child", "mi_single"])
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", type=int, default=0)
    ap.add_argument("--tree", default="")
    ap.add_argument("--out", default="")
    ap.add_argument("--ckpt", default="")
    args = ap.parse_args()
    if args.role == "parent":
        run_parent()
    elif args.role == "child":
        run_child(args)
    elif args.role == "single":
        run_single(args)
    elif args.role in ("mi_child", "mi_single"):
        run_mi(args)
    else:
        run_restore(args)


if __name__ == "__main__":
    main()
