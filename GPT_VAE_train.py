#!/usr/bin/env python
"""GPT-VAE training CLI.

Entry-point parity with /root/reference/GPT_VAE_train.py:29-211 — the full
flag surface (optimisation, IW sampling, annealing warm_up/kl_start,
beta/fb/target_kl free bits, fix_var/freeze_epoch/save_latent, stage-2
--load_path encoder warm start, --gpus/--num_nodes), rebuilt TPU-native:
the Lightning DDP Trainer becomes a jitted train step over a
jax.sharding mesh (--mesh 'data=N[,model=M]'); --gpus/--num_nodes are
accepted for CLI compatibility but the mesh spans all visible devices.
"""

import argparse
import os


def init_config():
    parser = argparse.ArgumentParser(description="GPT-VAE (TPU-native)")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--experiment", type=str, required=True)
    parser.add_argument("--model", type=str, choices=["gpt", "lstm"],
                        default="gpt",
                        help="lstm = the legacy LSTM-VAE system "
                             "(reference modules/Lit_vae.py; no entry point "
                             "exists for it in the reference)")
    parser.add_argument("--gpus", nargs="+", type=int, default=[0],
                        help="accepted for parity; mesh spans all devices")
    parser.add_argument("--num_nodes", type=int, default=1)

    # optimisation.  --opt/--lr default to the preset (AdamW at the preset
    # LR — the reference parsed these flags but always built AdamW,
    # Lit_GPT_VAE.py:887-943); passing them explicitly overrides.
    parser.add_argument("--momentum", type=float, default=0.0,
                        help="SGD momentum (used with --opt sgd)")
    parser.add_argument("--opt", type=str,
                        choices=["sgd", "adam", "adamw", "adafactor"],
                        default=None,
                        help="default: preset optimizer (adamw); adafactor "
                             "fits GPT-XL-scale VAEs on one chip")
    parser.add_argument("--lr", type=float, default=None,
                        help="default: preset learning rate")
    parser.add_argument("--lr_decay", type=float, default=0.0,
                        help="val-plateau LR decay factor, e.g. 0.5 "
                             "(0 = off; the reference's commented-out "
                             "machinery, GPT_VAE_callbacks.py:456-515)")
    parser.add_argument("--lr_decay_patience", type=int, default=5,
                        help="stale val epochs before decaying "
                             "(reference decay_epoch)")
    parser.add_argument("--lr_decay_start", type=int, default=15,
                        help="no decay before this epoch (reference "
                             "current_epoch >= 15 gate)")
    parser.add_argument("--nsamples", type=int, default=1)
    parser.add_argument("--iw_train_nsamples", type=int, default=-1)
    parser.add_argument("--iw_train_ns", type=int, default=1)
    parser.add_argument("--iw_nsamples", type=int, default=500)

    # mode
    parser.add_argument("--train", type=int, default=0)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--workers", type=int, default=1)
    parser.add_argument("--eval", type=int, default=0)
    parser.add_argument("--test", type=int, default=0)
    parser.add_argument("--logging_frequency", type=int, default=500)
    parser.add_argument("--load_path", type=str, default="",
                        help="stage-2: load encoder weights from this ckpt")
    parser.add_argument("--test_interpolation", type=int, default=0)

    # decoding
    parser.add_argument("--reconstruct_from", type=str, default="")
    parser.add_argument("--reconstruct_to", type=str, default="decoding.txt")
    parser.add_argument("--decoding_strategy", type=str,
                        choices=["greedy", "beam", "sample"],
                        default="greedy")
    parser.add_argument("--reconstruct_spec", type=str, default="")
    parser.add_argument("--vocoder", type=str, default="")

    # annealing
    parser.add_argument("--warm_up", type=int, default=10)
    parser.add_argument("--kl_start", type=float, default=1.0)

    parser.add_argument("--seed", type=int, default=783435)
    parser.add_argument("--save_latent", type=int, default=0)
    parser.add_argument("--fix_var", type=float, default=-1)
    parser.add_argument("--freeze_epoch", type=int, default=-1)
    parser.add_argument("--beta", type=float, default=1.0,
                        help="0 => plain AE")
    parser.add_argument("--fb", type=int, default=0,
                        help="free bits mode 0/1/2/3")
    parser.add_argument("--target_kl", type=float, default=-1)

    # TPU-native additions
    parser.add_argument("--data_root", type=str, default="./data")
    parser.add_argument("--mesh", type=str, default="",
                        help="e.g. 'data=8', 'data=4,model=2', "
                             "'data=2,pipe=4' (pipeline parallel)")
    parser.add_argument("--pp_micro", type=int, default=0,
                        help="pipeline microbatches (0 = 2*stages)")
    parser.add_argument("--limit_train_batches", type=int, default=0)
    parser.add_argument("--limit_val_batches", type=int, default=0)
    parser.add_argument("--epochs_override", type=int, default=0)
    parser.add_argument("--ckpt_every", type=int, default=1,
                        help="checkpoint every N epochs (+ final); 0 = "
                             "final only, -1 = never — for slow-d2h "
                             "links (remote tunnel)")
    parser.add_argument("--ckpt_every_steps", type=int, default=0,
                        help="ALSO save 'last' every N train steps with "
                             "its mid-epoch position; resume continues at "
                             "the exact next batch (0 = off)")
    parser.add_argument("--max_steps", type=int, default=0,
                        help="stop (and checkpoint) after this many total "
                             "optimizer steps, possibly mid-epoch "
                             "(0 = no budget); Lightning Trainer parity")
    parser.add_argument("--param_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="bfloat16 + --opt adafactor fits the 2.09B "
                             "vggsound GPT-XL on a single 16GB chip "
                             "(3.5s/step measured)")
    parser.add_argument("--prng", type=str, default="rbg",
                        choices=["rbg", "threefry"],
                        help="rbg = TPU hardware RNG: 4.3x faster VAE train "
                             "steps (threefry dropout masks dominated)")
    parser.add_argument("--profile", type=str, default="",
                        help="capture a jax.profiler trace into this dir")
    parser.add_argument("--override", type=str, default="",
                        help="comma k=v preset overrides (the reference's "
                             "editable config/*.py equivalent), e.g. "
                             "'n_layer=2,n_embd=32,batch_size=4'")
    parser.add_argument("--platform", type=str, default="",
                        help="force a jax platform (e.g. 'cpu'); the "
                             "remote TPU registers at interpreter start, "
                             "so an env var is too late to opt out")
    return parser.parse_args()


def parse_mesh(spec: str):
    from melspec_gpt_vqvae_tpu.parallel import parse_mesh as _parse
    return _parse(spec)


def main(args):
    import dataclasses

    import jax
    import numpy as np

    if getattr(args, "platform", ""):
        jax.config.update("jax_platforms", args.platform)
    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    if args.prng == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")

    from melspec_gpt_vqvae_tpu.configs import VAEConfig, load_preset
    from melspec_gpt_vqvae_tpu.data import DataModule
    from melspec_gpt_vqvae_tpu.parallel import (make_mesh,
                                            maybe_init_distributed)
    maybe_init_distributed()
    from melspec_gpt_vqvae_tpu.training import runner
    from melspec_gpt_vqvae_tpu.training.callbacks import (
        FrozenDecoders, VAETextLogger, metrics_epoch_end)
    from melspec_gpt_vqvae_tpu.training.checkpoint import (CheckpointManager,
                                                           merge_subtree)
    from melspec_gpt_vqvae_tpu.training.logging import TBLogger
    from melspec_gpt_vqvae_tpu.training.vae_task import VAETask

    np.random.seed(args.seed)
    if args.model == "lstm":
        return run_lstm(args)
    from melspec_gpt_vqvae_tpu.configs import parse_overrides
    exp = load_preset("GPT_VAE", args.dataset,
                      **parse_overrides(getattr(args, "override", "")))
    exp.vae = VAEConfig(
        nz=exp.model.n_embd, nsamples=args.nsamples,
        iw_train_nsamples=args.iw_train_nsamples,
        iw_train_ns=args.iw_train_ns, iw_nsamples=args.iw_nsamples,
        warm_up=args.warm_up, kl_start=args.kl_start, beta=args.beta,
        fb=args.fb, target_kl=args.target_kl, fix_var=args.fix_var,
        freeze_epoch=args.freeze_epoch, save_latent=args.save_latent)
    if args.epochs_override:
        exp.train = dataclasses.replace(exp.train,
                                        epochs=args.epochs_override)
    if args.opt is not None:
        exp.train = dataclasses.replace(exp.train, optimizer=args.opt,
                                        momentum=args.momentum)
    if args.lr is not None:
        exp.train = dataclasses.replace(exp.train, learning_rate=args.lr)
    if args.lr_decay:
        exp.train = dataclasses.replace(
            exp.train, lr_decay=args.lr_decay,
            lr_decay_patience=args.lr_decay_patience,
            lr_decay_start=args.lr_decay_start)
    if args.param_dtype != "float32":
        exp.model = exp.model.replace(dtype=args.param_dtype)
    print(f"devices: {jax.devices()}")

    mesh = make_mesh(parse_mesh(args.mesh))
    dm = DataModule(batch_size=exp.train.batch_size,
                    spec_dir_path=exp.data.spec_dir_path,
                    data_root=args.data_root,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())
    dm.setup()
    steps_per_epoch = len(dm.train_dataloader())
    task = VAETask(exp, steps_per_epoch, mesh,
                   pp_micro=args.pp_micro)

    run_dir = os.path.join("lightning_logs",
                           f"{args.experiment}-{args.dataset}")
    log = TBLogger(run_dir)
    ckpt = CheckpointManager(os.path.join(
        run_dir, "checkpoints", f"version_{log.version}"))

    vq_params = voc_params = voc_cfg = None
    if args.reconstruct_spec:
        from melspec_gpt_vqvae_tpu.utils.convert import load_vqvae_params
        vq_params = load_vqvae_params(args.reconstruct_spec, exp.vqvae)
    if args.vocoder:
        from melspec_gpt_vqvae_tpu.utils.convert import load_vocoder_params
        voc_params, voc_cfg = load_vocoder_params(args.vocoder)
    decoders = FrozenDecoders(exp.vqvae, vq_params, voc_cfg, voc_params,
                              code_h=exp.vqvae.code_h,
                              code_w=exp.vqvae.code_w)
    media_cb = VAETextLogger(task, log, decoders,
                             sample_rate=exp.data.sample_rate)
    epoch_cb = metrics_epoch_end(task, dm, log,
                                 limit_batches=args.limit_val_batches or None)

    # stage-2 encoder-only warm start (reference: GPT_VAE_train.py:133-144)
    stage2 = None
    if args.load_path and args.resume is None:
        loaded = ckpt.load_tree(os.path.abspath(args.load_path))
        tree = loaded.get("state", loaded).get("params", loaded)
        stage2 = tree
        print(f"loaded encoder from: {args.load_path}")

    from melspec_gpt_vqvae_tpu.utils.profiling import trace

    if args.train:
      with trace(args.profile or None):
        if stage2 is not None:
            state = task.init_state(args.seed)
            state["params"] = merge_subtree(state["params"], stage2,
                                            "encoder")
            # persist the warm start by saving as a resumable 'last'
            ckpt.save({"state": state, "epoch": -1,
                       "extras": {"best_loss": 1e4, "pre_mi": 0.0,
                                  "not_improved": 0}}, 0)
            args.resume = "last"
        runner.fit_vae(task, dm, epochs=exp.train.epochs, log=log,
                       ckpt=ckpt, seed=args.seed,
                       logging_frequency=args.logging_frequency,
                       media_cb=media_cb, epoch_end_cb=epoch_cb,
                       resume=args.resume,
                       limit_train_batches=args.limit_train_batches or None,
                       limit_val_batches=args.limit_val_batches or None,
                       ckpt_every=args.ckpt_every,
                       ckpt_every_steps=args.ckpt_every_steps,
                       max_steps=args.max_steps or None)
    if args.eval == 1:
        runner.evaluate_vae(task, dm, split="val", ckpt=ckpt,
                            resume=args.resume, compute_mi_au=True,
                            limit_batches=args.limit_val_batches or None)
    if args.test == 1:
        # --test runs the IW-NLL/PPL driver too (reference utils.py:50-77)
        runner.evaluate_vae(
            task, dm,
            split="test" if "vggsound" in exp.data.spec_dir_path else "val",
            ckpt=ckpt, resume=args.resume, compute_mi_au=True,
            iw_nsamples=args.iw_nsamples,
            limit_batches=args.limit_val_batches or None)

    def _restored_state(which):
        import utils as root_utils  # noqa: F401  (keeps parity surface)
        from melspec_gpt_vqvae_tpu.training.checkpoint import (
            place_like, shape_template)
        state = task.init_state(args.seed)
        extras0 = {"best_loss": 1e4, "pre_mi": 0.0, "not_improved": 0}
        template = {"state": shape_template(state),
                    "epoch": 0, "extras": dict(extras0)}
        # defaults= migrates round<=3 checkpoints (bare-chain opt_state,
        # no 'not_improved') — see CheckpointManager.restore
        return place_like(ckpt.restore(
            which, template=template,
            defaults={"state": state, "epoch": 0,
                      "extras": extras0})["state"], state)

    def _limited_val():
        for i, b in enumerate(dm.val_dataloader()):
            if args.limit_val_batches and i >= args.limit_val_batches:
                break
            yield b

    if args.reconstruct_from:
        # reconstruct the val split with --decoding_strategy and dump token
        # rows (reference driver: utils.py:19-47)
        import utils as root_utils
        state = _restored_state(args.reconstruct_from)
        root_utils.reconstruct(task, state, _limited_val(),
                               args.decoding_strategy, args.reconstruct_to)
        print(f"reconstructions ({args.decoding_strategy}) -> "
              f"{args.reconstruct_to}")

    if args.save_latent:
        # dump posterior means + labels (reference: utils.py:216-247)
        import utils as root_utils
        state = _restored_state(args.resume or "last")
        fname = os.path.join(run_dir, "latent.txt")
        root_utils.visualize_latent(task, state, _limited_val(), fname)
        print(f"latents -> {fname}")

    if args.test_interpolation:
        # latent interpolation between the first two val items (reference
        # audio_interpolation: GPT_VAE_callbacks.py:324-386); media logged
        # through the same TextLogger pipeline
        state = _restored_state(args.resume or "last")
        batch = next(iter(dm.val_dataloader()))
        media_cb.log_interpolation(state, batch,
                                   int(jax.device_get(state["step"])))
        print("interpolation media logged")


def run_lstm(args):
    """The legacy LSTM-VAE training system (reference modules/Lit_vae.py:
    19-910 + callbacks/VAE_callbacks.py — importable but entry-point-less
    in the reference; here it is a first-class --model lstm mode)."""
    import dataclasses

    import jax

    from melspec_gpt_vqvae_tpu.configs import VAEConfig, load_lstm_preset
    from melspec_gpt_vqvae_tpu.data import DataModule
    from melspec_gpt_vqvae_tpu.parallel import (make_mesh,
                                            maybe_init_distributed)
    maybe_init_distributed()
    from melspec_gpt_vqvae_tpu.training import runner
    from melspec_gpt_vqvae_tpu.training.callbacks import (LSTMTextLogger,
                                                          metrics_epoch_end)
    from melspec_gpt_vqvae_tpu.training.checkpoint import CheckpointManager
    from melspec_gpt_vqvae_tpu.training.lstm_task import LSTMVAETask
    from melspec_gpt_vqvae_tpu.training.logging import TBLogger

    from melspec_gpt_vqvae_tpu.configs import parse_overrides
    exp, cfg = load_lstm_preset(args.dataset,
                                **parse_overrides(getattr(args, "override",
                                                          "")))
    exp.vae = VAEConfig(
        nz=cfg.nz, nsamples=args.nsamples,
        iw_train_nsamples=args.iw_train_nsamples,
        iw_train_ns=args.iw_train_ns, iw_nsamples=args.iw_nsamples,
        warm_up=args.warm_up, kl_start=args.kl_start, beta=args.beta,
        fb=args.fb, target_kl=args.target_kl, fix_var=args.fix_var)
    if args.fix_var > 0:
        cfg = cfg._replace(fix_var=args.fix_var)
    if args.epochs_override:
        exp.train = dataclasses.replace(exp.train,
                                        epochs=args.epochs_override)
    if args.opt is not None:
        exp.train = dataclasses.replace(exp.train, optimizer=args.opt,
                                        momentum=args.momentum)
    if args.lr is not None:
        exp.train = dataclasses.replace(exp.train, learning_rate=args.lr)
    if args.lr_decay:
        exp.train = dataclasses.replace(
            exp.train, lr_decay=args.lr_decay,
            lr_decay_patience=args.lr_decay_patience,
            lr_decay_start=args.lr_decay_start)

    mesh = make_mesh(parse_mesh(args.mesh))
    dm = DataModule(batch_size=exp.train.batch_size,
                    spec_dir_path=exp.data.spec_dir_path,
                    data_root=args.data_root,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())
    dm.setup()
    task = LSTMVAETask(exp, cfg, steps_per_epoch=len(dm.train_dataloader()),
                       mesh=mesh)

    run_dir = os.path.join("lightning_logs",
                           f"{args.experiment}-{args.dataset}")
    log = TBLogger(run_dir)
    ckpt = CheckpointManager(os.path.join(
        run_dir, "checkpoints", f"version_{log.version}"))
    media_cb = LSTMTextLogger(task, log)
    epoch_cb = metrics_epoch_end(task, dm, log,
                                 limit_batches=args.limit_val_batches or None)

    if args.train:
        runner.fit_vae(task, dm, epochs=exp.train.epochs, log=log,
                       ckpt=ckpt, seed=args.seed,
                       logging_frequency=args.logging_frequency,
                       media_cb=media_cb, epoch_end_cb=epoch_cb,
                       resume=args.resume,
                       limit_train_batches=args.limit_train_batches or None,
                       limit_val_batches=args.limit_val_batches or None,
                       ckpt_every=args.ckpt_every,
                       ckpt_every_steps=args.ckpt_every_steps,
                       max_steps=args.max_steps or None)
    if args.eval == 1:
        runner.evaluate_vae(task, dm, split="val", ckpt=ckpt,
                            resume=args.resume, compute_mi_au=True,
                            limit_batches=args.limit_val_batches or None)
    if args.test == 1:
        runner.evaluate_vae(task, dm, split="val", ckpt=ckpt,
                            resume=args.resume, compute_mi_au=True,
                            iw_nsamples=args.iw_nsamples,
                            limit_batches=args.limit_val_batches or None)


if __name__ == "__main__":
    main(init_config())
