#!/usr/bin/env python
"""Probe: are int8 convolutions faster than bf16 on this chip's MXU?

The VQ decoder measures 73% of the bf16 MXU peak (BENCH_NOTES "VQ-decoder
profile") — int8 would double the theoretical peak IF XLA lowers int8
conv_general_dilated onto the MXU int8 path the way it does int8 dots.
This probe times the decoder's two dominant conv shapes (L0 80x848/128ch
and L2 20x212/256ch 3x3 NHWC) plus a vocoder-like 1-D conv, int8 vs
bf16, before any quantised-decode implementation work is committed.

Timing: lax.scan over iterations with a feedback term (per-call timing
through the tunnel is invalid for ms-scale steps; CLAUDE.md).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    from melspec_gpt_vqvae_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()
    import jax.numpy as jnp
    import numpy as np

    B = int(os.environ.get("PROBE_B", "32"))
    ITERS = int(os.environ.get("PROBE_ITERS", "20"))
    dn = jax.lax.conv_dimension_numbers((1, 1, 1, 1), (1, 1, 1, 1),
                                        ("NHWC", "HWIO", "NHWC"))

    shapes = [
        ("L0 80x848 128->128 3x3", (B, 80, 848, 128), (3, 3, 128, 128)),
        ("L2 20x212 256->256 3x3", (B, 20, 212, 256), (3, 3, 256, 256)),
        ("voc 1x4240 256->256 1x7", (B, 1, 4240, 256), (1, 7, 256, 256)),
    ]

    def bench(x, w, dtype):
        if dtype == "int8":
            x = jnp.clip(jnp.round(x * 31), -127, 127).astype(jnp.int8)
            w = jnp.clip(jnp.round(w * 31), -127, 127).astype(jnp.int8)
            pref = jnp.int32
        else:
            x = x.astype(jnp.bfloat16)
            w = w.astype(jnp.bfloat16)
            pref = jnp.float32

        def step(carry, _):
            y = jax.lax.conv_general_dilated(
                carry, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=pref)
            # feedback keeps iterations dependent (no hoisting); renorm
            # keeps int8 in range via a cast chain
            if dtype == "int8":
                nxt = jnp.clip(y >> 7, -127, 127).astype(jnp.int8)
            else:
                nxt = (y * 1e-3).astype(jnp.bfloat16)
            return nxt, ()

        @jax.jit
        def run(x0):
            out, _ = jax.lax.scan(step, x0, None, length=ITERS)
            return jnp.sum(jnp.abs(out.astype(jnp.float32)))

        float(run(x))                       # compile
        t0 = time.time()
        s = float(run(x))
        dt = (time.time() - t0) / ITERS
        return dt, s

    rng = np.random.default_rng(0)
    out = []
    for name, xs, ws in shapes:
        x = jnp.asarray(rng.standard_normal(xs), jnp.float32)
        w = jnp.asarray(rng.standard_normal(ws) * 0.05, jnp.float32)
        tb, _ = bench(x, w, "bf16")
        ti, _ = bench(x, w, "int8")
        flops = 2 * np.prod(xs) * ws[0] * ws[1] * ws[3]
        row = {"shape": name,
               "bf16_ms": round(tb * 1e3, 2),
               "int8_ms": round(ti * 1e3, 2),
               "bf16_tflops": round(flops / tb / 1e12, 1),
               "int8_tops": round(flops / ti / 1e12, 1),
               "int8_speedup": round(tb / ti, 2)}
        out.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"batch": B, "iters": ITERS,
                      "verdict": "int8 convs "
                      + ("WIN" if all(r["int8_speedup"] > 1.3 for r in out)
                         else "do not clearly win")}))


if __name__ == "__main__":
    main()
