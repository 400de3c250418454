#!/usr/bin/env python
"""End-to-end benchmark on the real chip.

Measures the BASELINE.json north-star: 10-second clips/sec/chip through the
full pipeline — mel frontend -> VQ-VAE encode (tokenize) -> KV-cached GPT
decode (265 tokens, class-conditional) -> VQ-VAE decode -> MelGAN vocoder
waveform — at reference scale (VAS: 24L/16H/1024d GPT, 128-code VQ-VAE,
ngf-32 MelGAN).  The reference's sampler re-runs a full forward per token
with no KV cache (/root/reference/transformer/minGPT.py:331-358); the cache
+ batching is where this pipeline wins.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

import json
import os
import time


def _enable_compile_cache():
    """Persistent compilation cache: the pipeline compiles once per machine;
    driver re-runs skip the multi-minute XLA compile."""
    import jax
    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main():
    import jax
    _enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    from melspec_gpt_vqvae_tpu.configs import MelConfig, load_preset
    from melspec_gpt_vqvae_tpu.models.gpt import init_gpt_params, gpt_generate, class_embed
    from melspec_gpt_vqvae_tpu.models.vocoder import MelGANGenerator
    from melspec_gpt_vqvae_tpu.models.vqvae import VQModel
    from melspec_gpt_vqvae_tpu.ops.mel import waveform_to_mel
    from melspec_gpt_vqvae_tpu.ops.mel_pallas import waveform_to_mel_pallas

    B = int(os.environ.get("BENCH_BATCH", "512"))
    platform = jax.devices()[0].platform
    on_tpu = platform not in ("cpu",)

    exp = load_preset("GPT", "vas")
    int8_kv = os.environ.get("BENCH_INT8_KV", "1") == "1" and on_tpu
    int8_w = os.environ.get("BENCH_INT8_W", "1") == "1" and on_tpu
    # BENCH_KV overrides: auto | int8 | int4 (packed nibbles)
    kv = os.environ.get("BENCH_KV", "int8" if int8_kv else "auto")
    gcfg = exp.model.replace(
        dtype="bfloat16" if on_tpu else "float32",
        cache_dtype=kv if on_tpu else "auto",
        decode_weight_dtype="int8" if int8_w else "auto")
    vcfg = exp.vqvae
    mcfg = MelConfig()

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)

    gpt_params = init_gpt_params(k1, gcfg)
    vq = VQModel(vcfg)
    vq_params = vq.init(k2, jnp.zeros((1, 80, 848, 1)))["params"]
    melgan = MelGANGenerator(exp.vocoder)
    voc_params = melgan.init(k3, jnp.zeros((1, 848, 80)))["params"]
    if on_tpu:
        # conv stacks in bf16 (flax computes in the promoted param/input
        # dtype); the VQ argmin stays f32-HIGHEST inside ops/vq
        to_bf16 = lambda t: jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16), t)
        vq_params = to_bf16(vq_params)
        voc_params = to_bf16(voc_params)

    use_pallas_mel = os.environ.get("BENCH_PALLAS_MEL", "1") == "1" and on_tpu
    # int8 tokenize (encoder convs): opt-in and SEPARATE from the decode
    # knob — int8 near the codebook argmin can flip code indices
    # (scripts/int8_quality.py reports the flip rate); the parity-gated
    # extract_codes path never uses it
    int8_tok = os.environ.get("BENCH_INT8_TOK", "0") == "1" and on_tpu

    def tokenize(vqp, qs, wav):
        """wav (B, 220500) -> mel -> [-1,1] crop -> VQ codes (B, 265)."""
        if use_pallas_mel:
            mel = waveform_to_mel_pallas(wav, mcfg)       # fused kernel
        else:
            mel = waveform_to_mel(wav, mcfg)              # (B, 80, 860)
        mel = mel[:, :, 6:854]                            # center crop 848
        x = (2.0 * mel - 1.0)[..., None]                  # NHWC
        if on_tpu:
            x = x.astype(jnp.bfloat16)
        if int8_tok:
            from melspec_gpt_vqvae_tpu.models import quantized as qz
            grid = qz.encode_to_indices_apply(vqp, vcfg, x,
                                              qz.Int8Convs(qs))
        else:
            grid = vq.apply({"params": vqp}, x,
                            method="encode_to_indices")   # (B, 5, 53)
        return jnp.swapaxes(grid, 1, 2).reshape(grid.shape[0], -1)

    segments = int(os.environ.get("BENCH_SEGMENTS", "8"))

    def generate(gp, c, key):
        cond = class_embed(gp, c)
        return gpt_generate(gp, gcfg, key, cond, None, steps=265,
                            temperature=1.0, top_k=100, sample=True,
                            segments=segments)

    # int8 decode stage: calibrated per-layer requantisation through the
    # VQ decoder + vocoder (quality-gated: scripts/int8_quality.py; the
    # int8 MXU path measured 1.27-1.66x on the stage's dominant shapes)
    int8_dec = os.environ.get("BENCH_INT8_DECODE", "0") == "1" and on_tpu
    # fused vocoder resblock-stack kernel (ops/vocoder_pallas.py): default
    # on; FusedConvs self-gates to TPU + supported geometry
    fused_voc = (os.environ.get("BENCH_FUSED_VOC", "1") == "1"
                 and not int8_dec)
    qstate = None
    if int8_dec:
        from melspec_gpt_vqvae_tpu.models.quantized import build_qstate
        qstate = build_qstate(vq_params, voc_params, vcfg, exp.vocoder)

    def detokenize(vqp, vocp, qs, tokens):
        """(B, 265) GPT-order tokens -> spec -> waveform.

        Inverse of tokenize's time-major flatten (sequence_to_grid;
        reference code_reader(reverse=True), minGPT.py:438-456)."""
        grid = tokens.reshape(-1, vcfg.code_w, vcfg.code_h)
        grid = jnp.swapaxes(grid, 1, 2)                   # (B, 5, 53)
        if int8_dec:
            from melspec_gpt_vqvae_tpu.models import quantized as qz
            ex = qz.Int8Convs(qs)
            spec = qz.decode_code_apply(vqp, vcfg, grid, ex)[..., 0]
        else:
            spec = vq.apply({"params": vqp}, grid,
                            method="decode_code")[..., 0]  # (B, 80, 848)
        mel01 = jnp.clip((spec.astype(jnp.float32) + 1.0) / 2.0, 0.0, 1.0)
        if on_tpu:
            mel01 = mel01.astype(jnp.bfloat16)
        mel01 = jnp.swapaxes(mel01, 1, 2)
        if int8_dec:
            return qz.melgan_apply(vocp, exp.vocoder, mel01, ex)
        if fused_voc:
            from melspec_gpt_vqvae_tpu.models import quantized as qzf
            return qzf.melgan_apply(vocp, exp.vocoder, mel01,
                                    qzf.FusedConvs())
        return melgan.apply({"params": vocp}, mel01)      # (B, samples)

    # params are explicit jit args — closing over them would bake hundreds
    # of MB of weights into the programs as constants (catastrophic compiles)
    _tok = jax.jit(tokenize)
    _gen = jax.jit(generate)
    _det = jax.jit(detokenize)
    generate_j = lambda c, key: _gen(gpt_params, c, key)
    # chunking bounds conv-stack activation memory so the GPT decode batch
    # (the stage that gains from batch amortisation) can grow past it
    tok_chunk = int(os.environ.get("BENCH_TOK_CHUNK", "128"))

    def tokenize_j(wav):
        if not tok_chunk or wav.shape[0] <= tok_chunk:
            return _tok(vq_params, tok_qstate, wav)
        return jnp.concatenate(
            [_tok(vq_params, tok_qstate, wav[i:i + tok_chunk])
             for i in range(0, wav.shape[0], tok_chunk)], axis=0)
    # chunked detokenize bounds VQ-decoder/vocoder activation memory so
    # B can exceed 128 (decode throughput rises with batch)
    detok_chunk = int(os.environ.get("BENCH_DETOK_CHUNK", "128"))

    def detokenize_j(toks):
        if not detok_chunk or toks.shape[0] <= detok_chunk:
            return _det(vq_params, voc_params, qstate, toks)
        return jnp.concatenate(
            [_det(vq_params, voc_params, qstate, toks[i:i + detok_chunk])
             for i in range(0, toks.shape[0], detok_chunk)], axis=0)

    # deterministic tone/chirp battery (shared with parity_check.py) tiled
    # to B — realistic codebook-usage patterns instead of Gaussian noise
    from parity_check import make_battery
    battery = make_battery(mcfg.clip_samples)
    reps = -(-B // battery.shape[0])
    wav = jnp.asarray(np.tile(battery, (reps, 1))[:B], jnp.float32)

    tok_qstate = None
    if int8_tok:
        from melspec_gpt_vqvae_tpu.models.quantized import build_encode_qstate
        mel_c = jax.jit(lambda w: waveform_to_mel(w, mcfg))(wav[:32])
        x_c = (2.0 * mel_c[:, :, 6:854] - 1.0)[..., None].astype(
            jnp.bfloat16 if on_tpu else jnp.float32)
        tok_qstate = build_encode_qstate(vq_params, vcfg, x_c)
    rng = np.random.default_rng(0)
    cls = jnp.asarray(rng.integers(0, gcfg.class_size, (B,)), jnp.int32)

    def pipeline(key):
        toks = tokenize_j(wav)
        gen = generate_j(cls, key)
        out = detokenize_j(gen)
        return toks, gen, out

    def sync(x):
        """Force completion via a dependent scalar device_get —
        block_until_ready can return early through the remote-TPU tunnel
        (measured: 0.18s 'decode' vs a 0.46s bandwidth roof)."""
        return float(jnp.sum(x[..., :1].astype(jnp.float32)))

    # warmup / compile
    t0 = time.time()
    toks, gen, out = pipeline(k4)
    sync(out)
    compile_s = time.time() - t0

    iters = 3 if on_tpu else 1
    t0 = time.time()
    for i in range(iters):
        toks, gen, out = pipeline(jax.random.fold_in(k4, i))
    sync(out)
    total = (time.time() - t0) / iters

    # stage timings
    def timeit(fn, *a):
        sync(fn(*a))
        t = time.time()
        for i in range(iters):
            r = fn(*a)
        sync(r)
        return (time.time() - t) / iters

    t_tok = timeit(tokenize_j, wav)
    t_gen = timeit(generate_j, cls, k4)
    t_dec = timeit(detokenize_j, gen)

    clips_per_sec = B / total
    tokens_per_sec = B * 265 / t_gen
    result = {
        "metric": "10s clips/sec/chip end-to-end (mel->VQ->GPT->vocoder)",
        "value": round(clips_per_sec, 3),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec / 50.0, 3),
        "gpt_tokens_per_sec": round(tokens_per_sec, 1),
        "batch": B,
        "platform": platform,
        "kv_cache": gcfg.cache_dtype,
        "decode_weights": gcfg.decode_weight_dtype,
        "int8_decode": int8_dec,
        "int8_tokenize": int8_tok,
        "stage_seconds": {"tokenize": round(t_tok, 4),
                          "gpt_decode": round(t_gen, 4),
                          "vq_decode+vocoder": round(t_dec, 4)},
        "compile_seconds": round(compile_s, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
