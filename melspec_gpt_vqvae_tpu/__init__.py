"""melspec_gpt_vqvae_tpu — a TPU-native (JAX/XLA/Pallas/pjit) audio-token framework.

A from-scratch rebuild of the capabilities of karchkha/MelSpec_GPT_VQVAE
(see /root/reference): 10-second audio clips are turned into 80x848 log-mel
spectrograms, compressed by a SpecVQGAN-style VQ-VAE into a 5x53 grid of
codebook indices, flattened column-major into 265-token sequences, and modeled
by (a) a class-conditional GPT and (b) a GPT-VAE with an unmasked GPT encoder
and a latent-conditioned causal GPT decoder.  Generated token sequences are
decoded back to spectrograms by the VQ-VAE decoder and to waveforms by a
MelGAN vocoder.

Architecture (TPU-first, not a port):
  - `ops/`      pure-JAX + Pallas compute: mel frontend, fused attention,
                on-device VQ nearest-neighbour, sampling primitives.
  - `models/`   functional models: scan-stacked GPT with KV-cached decode,
                flax VQ-VAE / MelGAN / PatchGAN, GPT-VAE ELBO machinery.
  - `data/`     split-file datasets, transforms, per-host sharded loader.
  - `parallel/` device mesh + sharding rules (data / model axes).
  - `training/` train states, optimizers, checkpointing, logging, callbacks.
"""

__version__ = "0.5.0"
