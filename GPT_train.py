#!/usr/bin/env python
"""Class-conditional GPT training CLI.

Entry-point parity with /root/reference/GPT_train.py:25-153 — same flags
(--dataset/--experiment/--train/--resume/--workers/--eval/--test/
--logging_frequency/--test_interpolation/--reconstruct_spec/--vocoder),
same config-preset merge, same log/checkpoint layout
(``lightning_logs/{experiment}-{dataset}``), rebuilt on the TPU-native
stack: jitted train steps over a jax.sharding mesh instead of a Lightning
Trainer.
"""

import argparse
import os
import sys


def init_config():
    parser = argparse.ArgumentParser(
        description="GPT transformer for VQVAE_spec (TPU-native)")
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--experiment", type=str, required=True)
    parser.add_argument("--train", type=int, default=0)
    parser.add_argument("--resume", type=str, default=None)
    parser.add_argument("--workers", type=int, default=1)
    parser.add_argument("--eval", type=int, default=0)
    parser.add_argument("--test", type=int, default=0)
    parser.add_argument("--logging_frequency", type=int, default=200)
    parser.add_argument("--test_interpolation", type=int, default=0)
    parser.add_argument("--reconstruct_spec", type=str, default="",
                        help="frozen VQ-VAE ckpt for spectrogram decode")
    parser.add_argument("--vocoder", type=str, default="",
                        help="frozen MelGAN ckpt dir for audio decode")
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
    args = parser.parse_args()
    args.seed = 783435
    return args


def parse_mesh(spec: str):
    from melspec_gpt_vqvae_tpu.parallel import parse_mesh as _parse
    return _parse(spec)


def main(args):
    import jax
    import numpy as np

    if getattr(args, "platform", ""):
        jax.config.update("jax_platforms", args.platform)
    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    if args.prng == "rbg":
        jax.config.update("jax_default_prng_impl", "rbg")

    from melspec_gpt_vqvae_tpu.configs import load_preset
    from melspec_gpt_vqvae_tpu.data import DataModule
    from melspec_gpt_vqvae_tpu.parallel import (make_mesh,
                                            maybe_init_distributed)
    maybe_init_distributed()
    from melspec_gpt_vqvae_tpu.training.callbacks import (FrozenDecoders,
                                                          GPTImageLogger)
    from melspec_gpt_vqvae_tpu.training.checkpoint import CheckpointManager
    from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask
    from melspec_gpt_vqvae_tpu.training.logging import TBLogger
    from melspec_gpt_vqvae_tpu.training import runner

    np.random.seed(args.seed)
    from melspec_gpt_vqvae_tpu.configs import parse_overrides
    exp = load_preset("GPT", args.dataset,
                      **parse_overrides(getattr(args, "override", "")))
    if args.epochs_override:
        exp.train = exp.train.__class__(
            learning_rate=exp.train.learning_rate,
            epochs=args.epochs_override, batch_size=exp.train.batch_size)
    print(f"devices: {jax.devices()}")

    mesh = make_mesh(parse_mesh(args.mesh))
    dm = DataModule(batch_size=exp.train.batch_size,
                    spec_dir_path=exp.data.spec_dir_path,
                    data_root=args.data_root,
                    process_index=jax.process_index(),
                    process_count=jax.process_count())
    dm.setup()
    task = GPTTask(exp, mesh, pp_micro=args.pp_micro)

    run_dir = os.path.join("lightning_logs",
                           f"{args.experiment}-{args.dataset}")
    log = TBLogger(run_dir)
    ckpt = CheckpointManager(os.path.join(
        run_dir, "checkpoints", f"version_{log.version}"))

    # frozen decoders for media logging (the reference callbacks load their
    # own VQ-VAE + vocoder copies; here they are optional param trees)
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

    media_cb = GPTImageLogger(task, log, decoders,
                              sample_rate=exp.data.sample_rate)

    from melspec_gpt_vqvae_tpu.utils.profiling import trace

    if args.train:
      with trace(args.profile or None):
        runner.fit_gpt(task, dm, epochs=exp.train.epochs, log=log,
                       ckpt=ckpt, seed=args.seed,
                       logging_frequency=args.logging_frequency,
                       media_cb=media_cb, resume=args.resume,
                       limit_train_batches=args.limit_train_batches or None,
                       limit_val_batches=args.limit_val_batches or None,
                       ckpt_every=args.ckpt_every,
                       ckpt_every_steps=args.ckpt_every_steps,
                       max_steps=args.max_steps or None)
    if args.eval == 1:
        runner.validate_gpt(task, dm, ckpt=ckpt, resume=args.resume,
                            limit_val_batches=args.limit_val_batches or None)
    if args.test == 1:
        runner.validate_gpt(task, dm, ckpt=ckpt, resume=args.resume,
                            limit_val_batches=args.limit_val_batches or None)


if __name__ == "__main__":
    main(init_config())
