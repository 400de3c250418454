#!/usr/bin/env python
"""Microbench: fused Pallas decode attention vs the XLA path, 24 layers at
the bench point (B=512, H=16, hd=64, T=265, int8 depth-major cache).

Prints ms per 24-layer sweep for each impl plus the HBM floor.
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
import numpy as np

from melspec_gpt_vqvae_tpu.ops.decode_attention import (decode_attend_int8,
                                                        decode_attend_int8_xla)

L = int(os.environ.get("KB_L", "24"))
B = int(os.environ.get("KB_B", "512"))
H, HD = 16, 64
T = int(os.environ.get("KB_T", "265"))
POS = int(os.environ.get("KB_POS", "200"))
ITERS = int(os.environ.get("KB_ITERS", "10"))


def main():
    @jax.jit
    def fill():
        k = jax.lax.broadcasted_iota(jnp.int8, (L, H, B, HD, T), 4) - 31
        v = jax.lax.broadcasted_iota(jnp.int8, (L, H, B, HD, T), 3) - 63
        ks = 0.01 + 0.001 * jax.lax.broadcasted_iota(
            jnp.bfloat16, (L, H, B, T), 3)
        vs = 0.01 + 0.002 * jax.lax.broadcasted_iota(
            jnp.bfloat16, (L, H, B, T), 2)
        q = 0.1 * jax.lax.broadcasted_iota(jnp.float32, (B, H, HD), 2)
        return q, k, v, ks, vs

    q, k, v, ks, vs = fill()
    pos = jnp.asarray(POS, jnp.int32)

    def sweep(fn):
        @jax.jit
        def run(q, k, v, ks, vs, pos):
            def body(acc, l):
                # acc feeds q so layers stay sequential (no hoisting)
                return acc + fn(q + 1e-6 * acc, k, v, ks, vs, l,
                                pos).astype(q.dtype), None
            out, _ = jax.lax.scan(body, jnp.zeros_like(q), jnp.arange(L))
            return out
        return run

    results = {}
    for name, fn in [("pallas", decode_attend_int8),
                     ("xla", decode_attend_int8_xla)]:
        run = sweep(fn)
        o = run(q, k, v, ks, vs, pos)
        float(jnp.sum(o[:1, :1]))              # compile + sync
        t0 = time.time()
        for _ in range(ITERS):
            o = run(q, k, v, ks, vs, pos)
        float(jnp.sum(o[:1, :1]))
        dt = (time.time() - t0) / ITERS
        results[name] = round(dt * 1e3, 3)
        print(f"{name:8s} {dt*1e3:8.3f} ms / {L} layers", flush=True)

    bytes_read = 2 * L * B * H * (POS + 1) * (HD + 2)   # int8 kv + bf16 scales
    results["hbm_floor_ms"] = round(bytes_read / 819e9 * 1e3, 3)
    print(json.dumps({"B": B, "T": T, "pos": POS, **results}))


if __name__ == "__main__":
    main()
