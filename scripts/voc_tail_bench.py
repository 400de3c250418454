#!/usr/bin/env python
"""Vocoder TAIL micro-bench: the final leaky->reflectpad->conv7(32->1)
->tanh at T=217k — the last unprofiled piece of the vocoder stage.

The shape is MXU-hostile (C_out=1: a 1/128-lane tile) but tiny in FLOPs
(7*32*2 MACs/sample); if it's bandwidth-bound at the input-read roof it
is already done, if XLA pays a padded-lane penalty there may be a win in
a VPU formulation: y[t] = sum_k dot(x[t+k], w[k]) as 7 shifted
multiply-reduces that XLA fuses into elementwise code (no MXU at all).

Times via the scan-of-steps harness (per-call dispatch timing through
the tunnel overstates small stages ~2x — BENCH_NOTES).  Prints the
bf16 input-read roofline next to each measurement.

Usage: python scripts/voc_tail_bench.py   (TPU, one job)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from melspec_gpt_vqvae_tpu.models.quantized import _reflect_pad_1d
from melspec_gpt_vqvae_tpu.ops.quant import conv_float

B = int(os.environ.get("VT_B", "128"))
T = int(os.environ.get("VT_T", str(848 * 256)))   # bench mel T=848, r=256
C = 32
K = 7
HBM_GBS = 819e9   # v5e HBM read bandwidth


def tail_conv(x, w, b):
    """The production tail (models/quantized.py::melgan_apply end)."""
    x = nn.leaky_relu(x, 0.2)
    x = _reflect_pad_1d(x, 3)
    y = conv_float(x, w, b, padding=0)
    return jnp.tanh(y)[..., 0]


def tail_vpu(x, w, b):
    """Same math as 7 shifted multiply-reduces (pure VPU, no conv op).
    w: (K, 1, C) in? conv_float takes flax (K, C_in, C_out)."""
    x = nn.leaky_relu(x, 0.2)
    x = _reflect_pad_1d(x, 3)                     # (B, T+6, C)
    acc = jnp.zeros((x.shape[0], T), jnp.float32)
    for k in range(K):
        xk = lax.dynamic_slice_in_dim(x, k, T, 1)             # (B, T, C)
        wk = w[k, :, 0].astype(jnp.float32)                   # (C,)
        acc = acc + jnp.einsum("btc,c->bt", xk.astype(jnp.float32), wk)
    return jnp.tanh(acc + b[0].astype(jnp.float32))


def _fold_weights(w, f=4):
    """Pack the 7-tap (K, C, 1) kernel into a k=3 conv over folded rows:
    (3, f*C, f) where tap s, input lane p'*C+c, output phase p holds
    w[4s - 4 + p' - p + 3, c] (the time algebra in tail_folded)."""
    wp = jnp.zeros((3, f * C, f), w.dtype)
    for s in range(3):
        for pp in range(f):
            for p in range(f):
                k = 4 * s - 4 + pp - p + 3
                if 0 <= k < K:
                    wp = wp.at[s, pp * C:(pp + 1) * C, p].set(w[k, :, 0])
    return wp


def tail_folded(x, wp, b, f=4):
    """Same math as tail_conv via lane folding: reshape (B, T, 32) to
    (B, T/f, f*32) rows and run ONE k=3 conv (C_in=f*32 -> C_out=f) —
    the 7 taps become row-halo reuse inside a single conv window instead
    of 7 separate full-tensor passes."""
    bsz, t, c = x.shape
    x = nn.leaky_relu(x, 0.2)
    # pad to times [-f, t+3]: reflect left 3 (+1 dead slot), reflect
    # right 3 (+1 dead slot to reach a multiple of f)
    left = jnp.concatenate([x[:, :1], x[:, 1:4][:, ::-1]], 1)   # dead+refl
    right = jnp.concatenate([x[:, -4:-1][:, ::-1], x[:, -1:]], 1)
    xp = jnp.concatenate([left, x, right], 1)       # (B, t+8, C)
    xf = xp.reshape(bsz, (t + 2 * f) // f, f * c)
    y = lax.conv_general_dilated(
        xf, wp, (1,), "VALID",
        dimension_numbers=("NHC", "HIO", "NHC"))    # (B, t/f, f)
    return jnp.tanh(y.reshape(bsz, t) + b[0])


def time_scan(fn, x, iters=8):
    def step(c, _):
        y = fn(c)
        fb = jnp.mean(y[:, :1].astype(jnp.float32)) * 1e-6
        return c + fb.astype(c.dtype)[None, None], ()

    run = jax.jit(lambda x0: lax.scan(step, x0, None, length=iters)[0])
    run(x).block_until_ready()
    t0 = time.time()
    run(x).block_until_ready()
    return (time.time() - t0) / iters


def main():
    global T
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, C), jnp.bfloat16)
    # production bf16 path casts the vocoder tree to bf16 (pipeline.py)
    w = (jax.random.normal(key, (K, C, 1), jnp.float32) * 0.1
         ).astype(jnp.bfloat16)
    b = jnp.zeros((1,), jnp.bfloat16)

    read_gb = B * T * C * 2 / 1e9
    roof_s = read_gb * 1e9 / HBM_GBS
    out = {"B": B, "T": T, "read_gb_bf16": round(read_gb, 2),
           "input_read_roof_s": round(roof_s, 4)}

    # parity at a small T (jitted: eager op-by-op through the tunnel on
    # GB-size tensors is minutes); same math at any T
    T_full, T = T, 4096
    xs = jax.random.normal(key, (2, T, C), jnp.bfloat16)
    wp = _fold_weights(w)
    y0 = jax.jit(tail_conv)(xs, w, b)
    y1 = jax.jit(tail_vpu)(xs, w, b)
    y2 = jax.jit(tail_folded)(xs, wp, b)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                - y1.astype(jnp.float32))))
    err2 = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                 - y2.astype(jnp.float32))))
    T = T_full
    out["vpu_vs_conv_max_abs_err"] = err
    out["folded_vs_conv_max_abs_err"] = err2

    out["conv_s"] = round(time_scan(lambda a: tail_conv(a, w, b), x), 4)
    out["vpu_s"] = round(time_scan(lambda a: tail_vpu(a, w, b), x), 4)
    out["folded_s"] = round(time_scan(lambda a: tail_folded(a, wp, b),
                                      x), 4)
    out["conv_vs_roof"] = round(out["conv_s"] / roof_s, 2)
    out["speedup_vpu"] = round(out["conv_s"] / max(out["vpu_s"], 1e-9), 2)
    out["speedup_folded"] = round(out["conv_s"]
                                  / max(out["folded_s"], 1e-9), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
