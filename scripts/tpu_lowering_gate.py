"""TPU-lowering gate: every Pallas kernel must lower for Mosaic.

Round 4 shipped a fused vocoder kernel that passed all 201 CPU tests
(interpret mode) yet failed Mosaic *lowering* on the real chip, crashing
bench.py / sample.py / serve.py at default settings.  Interpret-mode tests
cannot catch that class of failure; this gate can, without touching the
device: Mosaic compiles Pallas kernels during jit *lowering* (client-side),
so ``jax.jit(fn).lower(abstract_args)`` on the TPU backend exercises the
exact code path that crashed — in seconds, with zero device transfers
(all inputs are ShapeDtypeStructs via jax.eval_shape).

Run before every snapshot (mandatory, see .claude/skills/verify/SKILL.md):

    python scripts/tpu_lowering_gate.py          # on the TPU host

Exits nonzero listing every kernel that fails to lower.  Shapes below are
the production geometries each kernel actually sees (bench.py defaults /
reference presets); update them when the pipeline's shapes change.
"""

from __future__ import annotations

import sys
import traceback

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from melspec_gpt_vqvae_tpu.configs import VocoderConfig  # noqa: E402


def _sds(shape, dtype):
    return jax.ShapeDtypeStruct(shape, dtype)


def gate_vocoder_fused():
    """Fused MelGAN resblock stacks, all four stage geometries, via the
    production entry point (FusedConvs drives supports()/pack_stack/
    fused_resblock_stack exactly as bench.py's detokenize does)."""
    from melspec_gpt_vqvae_tpu.models import quantized as qz
    from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator

    cfg = VocoderConfig()
    mel = _sds((4, 848, cfg.n_mel_channels), jnp.bfloat16)
    model = MelGANGenerator(cfg)
    params = jax.eval_shape(
        lambda m: model.init(jax.random.PRNGKey(0), m)["params"], mel)
    params = jax.tree.map(lambda s: _sds(s.shape, jnp.bfloat16), params)

    def fn(p, m):
        return qz.melgan_apply(p, cfg, m, qz.FusedConvs())

    jax.jit(fn).lower(params, mel)


def gate_attention():
    """Full-sequence fused attention (prefill / parity path), VAS
    geometry: B=8, H=16, T=265 (block 265+1 cond), hd=64."""
    from melspec_gpt_vqvae_tpu.ops.attention import attend_pallas

    q = _sds((8, 16, 266, 64), jnp.bfloat16)
    jax.jit(attend_pallas, static_argnames=("n_unmasked",)).lower(
        q, q, q, n_unmasked=0)


def gate_flash_attention():
    """Flash attention fwd + custom-VJP bwd at VAS train geometry."""
    from melspec_gpt_vqvae_tpu.ops.flash_attention import flash_attention

    # production call site (models/gpt.py:155): f32 q/k/v, bf16 keep-mask
    # (make_dropout_mask — Mosaic cannot cast uint8 in-kernel)
    q = _sds((8, 16, 266, 64), jnp.float32)
    mask = _sds((8, 16, 266, 266), jnp.bfloat16)

    def loss(q_, k_, v_, m_):
        return jnp.sum(flash_attention(q_, k_, v_, m_, 0, 0.7))

    jax.jit(jax.grad(loss, argnums=(0, 1, 2))).lower(q, q, q, mask)


def gate_vq():
    """VQ nearest-neighbour at tokenize shapes, both codebooks
    (VAS K=128, VGGSound K=1024); D=256, N = 16 clips x 5 x 53."""
    from melspec_gpt_vqvae_tpu.ops.vq import vq_nearest_index_pallas

    x = _sds((16 * 5 * 53, 256), jnp.float32)
    for k in (128, 1024):
        cb = _sds((k, 256), jnp.float32)
        jax.jit(vq_nearest_index_pallas).lower(x, cb)


def gate_mel():
    """Fused STFT+mel frontend at extract/bench shapes (10 s clips)."""
    from melspec_gpt_vqvae_tpu.ops.mel_pallas import waveform_to_mel_pallas

    wav = _sds((4, 220500), jnp.float32)
    jax.jit(waveform_to_mel_pallas,
            static_argnames=("cfg", "block_frames")).lower(wav)


def gate_decode_attention():
    """int8 KV decode-attention kernel (opt-in path) at VAS decode
    geometry: L=24, H=16, B=32, hd=64, T=272 (padded cache)."""
    from melspec_gpt_vqvae_tpu.ops.decode_attention import decode_attend_int8

    L, H, B, hd, T = 24, 16, 32, 64, 272
    q = _sds((B, H, hd), jnp.bfloat16)
    k = _sds((L, H, B, hd, T), jnp.int8)
    sc = _sds((L, H, B, T), jnp.bfloat16)
    lay = _sds((), jnp.int32)
    jax.jit(decode_attend_int8).lower(q, k, k, sc, sc, lay, lay)


GATES = [
    ("vocoder_fused_resblock_stack", gate_vocoder_fused),
    ("attend_pallas", gate_attention),
    ("flash_attention_fwd_bwd", gate_flash_attention),
    ("vq_nearest_index", gate_vq),
    ("mel_frontend", gate_mel),
    ("decode_attend_int8", gate_decode_attention),
]


def main() -> int:
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(f"FATAL: default backend is '{backend}', not TPU — this gate "
              "only means something on the TPU host (Mosaic lowering is "
              "skipped in interpret mode).", file=sys.stderr)
        return 2

    failures = []
    for name, fn in GATES:
        try:
            fn()
            print(f"  lower OK   {name}")
        except Exception:
            print(f"  lower FAIL {name}")
            traceback.print_exc()
            failures.append(name)

    if failures:
        print(f"\nGATE FAILED: {len(failures)} kernel(s) do not lower for "
              f"Mosaic: {', '.join(failures)}", file=sys.stderr)
        return 1
    print(f"\nGATE OK: all {len(GATES)} Pallas kernels lower for TPU.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
