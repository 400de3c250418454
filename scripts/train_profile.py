#!/usr/bin/env python
"""Profile-backed train-step attribution (round-3 gap: the VAS VAE
step's remaining ~300 ms was explained with arithmetic, not a trace).

Captures a ``jax.profiler`` trace of the VAS GPT-VAE train step at the
preset policy (remat=attn + mixed precision, bs 24), parses the XPlane
protos directly (tensorflow's profiler protobuf — no TensorBoard UI
needed on this headless host), and prints a per-category device-time
table: where each millisecond of the step actually goes, grouped by the
XLA ``hlo_category`` the compiler assigned (convolution/dot fusions,
loop fusions = elementwise chains, RNG, copies, ...).

Writes TRAIN_PROFILE.json.  Usage:
  python scripts/train_profile.py                (TPU, one job, ~10 min)
  python scripts/train_profile.py --model gpt    (GPT-class step instead)
  TP_STEPS=4 ... --bs 8                          (knobs)

If the remote (tunnelled) backend cannot produce device planes, the
script says so explicitly and exits non-zero — no silent fallback to
estimates.
"""

import argparse
import collections
import glob
import json
import os
import sys
import time

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))


def capture(logdir, model, bs, steps, policy):
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from melspec_gpt_vqvae_tpu.configs import load_preset

    jax.config.update("jax_default_prng_impl", "rbg")
    exp = load_preset("GPT_VAE" if model == "vae" else "GPT", "vas")
    for k in ("n_layer", "n_embd", "n_head"):   # CPU smoke shrinking
        v = int(os.environ.get(f"TP_{k.upper()}", "0"))
        if v:
            policy[k] = v
    if policy:
        exp = dataclasses.replace(exp, model=exp.model.replace(**policy))
    bs = bs or exp.train.batch_size
    rng0 = np.random.default_rng(0)

    if model == "vae":
        from melspec_gpt_vqvae_tpu.training.vae_task import VAETask
        task = VAETask(exp, steps_per_epoch=100)
        state = task.init_state(0)
        x = task._shard({"codes": rng0.integers(
            0, exp.model.vocab_size, (bs, 5, 53)).astype(np.int32)})
        freeze = jnp.asarray(False)
        # donate the carried state: without donation params + moments
        # exist twice across the call boundary (OOM at VAS scale)
        step = jax.jit(lambda s, r: task._train_step_fn(s, x, r, freeze)[0],
                       donate_argnums=0)
    else:
        from melspec_gpt_vqvae_tpu.training.gpt_task import GPTTask
        task = GPTTask(exp)
        state = task.init_state(0)
        x = jnp.asarray(rng0.integers(0, exp.model.vocab_size, (bs, 265)),
                        jnp.int32)
        c = jnp.asarray(rng0.integers(0, exp.model.class_size, (bs,)),
                        jnp.int32)
        step = jax.jit(lambda s, r: task._train_step_fn(s, x, c, r)[0],
                       donate_argnums=0)

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    for i in range(2):   # compile + warm
        state = step(state, jax.random.fold_in(key, i))
    jax.tree_util.tree_leaves(state)[0].block_until_ready()
    print(f"compile+warm {time.time() - t0:.1f}s", flush=True)

    jax.profiler.start_trace(logdir)
    t0 = time.time()
    for i in range(steps):
        state = step(state, jax.random.fold_in(key, 10 + i))
    # dependent scalar forces completion through the tunnel
    _ = float(jnp.sum(jax.tree_util.tree_leaves(state["params"])[0][:1]
                      .astype(jnp.float32)))
    wall = time.time() - t0
    jax.profiler.stop_trace()
    print(f"traced {steps} steps in {wall:.2f}s "
          f"({wall / steps * 1e3:.0f} ms/step wall incl. dispatch)",
          flush=True)
    return wall, steps, dict(exp.model.__dict__ if hasattr(exp.model,
                                                           "__dict__")
                             else {}), bs


def parse_xplanes(logdir):
    """Aggregate device-plane op durations by hlo_category."""
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ImportError:   # proto path moved across TF versions
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir} — trace capture "
                         "produced nothing")
    import re

    by_cat = collections.Counter()          # category -> ps (XLA Ops line)
    by_op = collections.Counter()           # (category, op) -> ps
    by_while = collections.Counter()         # container loops (lax.scan)
    device_planes = 0
    module_ps = 0                            # "XLA Modules" line envelope
    async_ps = 0                             # overlapped DMA copies

    def hlo_short(text):
        """'%fusion.7 = f32[..] fusion(..), kind=..' -> ('fusion.7',
        'fusion')."""
        m = re.match(r"%([^ ]+) =", text)
        nm = m.group(1) if m else text[:40]
        m2 = re.search(r"= \S+ ([a-z0-9\-]+)\(", text)
        opcode = m2.group(1) if m2 else nm.split(".")[0]
        return nm, opcode

    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if not (plane.name.startswith("/device:TPU")
                    or plane.name.startswith("/device:CPU")):
                continue
            smeta = plane.stat_metadata
            emeta = plane.event_metadata
            saw_ops = False
            for line in plane.lines:
                if line.name == "XLA Modules":
                    for ev in line.events:
                        module_ps += ev.duration_ps
                    continue
                if line.name == "Async XLA Ops":
                    for ev in line.events:
                        async_ps += ev.duration_ps
                    continue
                if line.name != "XLA Ops":
                    continue
                saw_ops = True
                for ev in line.events:
                    md = emeta.get(ev.metadata_id)
                    text = md.name if md else "?"
                    nm, opcode = hlo_short(text)
                    cat = None
                    for stats in ((ev.stats, smeta),
                                  (md.stats if md else (), smeta)):
                        for st in stats[0]:
                            sm = stats[1].get(st.metadata_id)
                            if sm and sm.name == "hlo_category":
                                cat = st.str_value or None
                    if cat is None:
                        cat = {"fusion": "fusion (uncategorised)",
                               "copy-start": "copy",
                               "copy-done": "copy", "copy": "copy",
                               "rng-bit-generator": "rng"}.get(
                                   opcode, opcode)
                    d = ev.duration_ps
                    if cat == "while" or opcode == "while":
                        # a lax.scan/while is a CONTAINER: its body ops
                        # appear as their own events on the same line, so
                        # counting it as a category double-counts — keep
                        # it as the per-subgraph (enc/dec fwd/bwd) view
                        by_while[nm] += d
                        continue
                    by_cat[cat] += d
                    by_op[(cat, nm)] += d
            if saw_ops:
                device_planes += 1
    total_ps = max(1, sum(by_cat.values()))
    busy_ps = module_ps or total_ps
    if device_planes == 0:
        raise SystemExit(
            "trace has NO device XLA-Ops lines — the remote backend did "
            "not export a device timeline; attribution must stay "
            "measurement-free (record this as an environment limit)")
    return (by_cat, by_op, by_while, total_ps, busy_ps, async_ps, device_planes)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="vae", choices=["vae", "gpt"])
    ap.add_argument("--bs", type=int, default=0)
    ap.add_argument("--steps", type=int,
                    default=int(os.environ.get("TP_STEPS", "6")))
    ap.add_argument("--logdir", default="/tmp/train_profile")
    ap.add_argument("--remat_policy", default="")
    ap.add_argument("--no_mixed", action="store_true")
    args = ap.parse_args()

    policy = {}
    if args.remat_policy:
        policy["remat_policy"] = args.remat_policy
    if args.no_mixed:
        policy["mixed_precision"] = False

    os.makedirs(args.logdir, exist_ok=True)
    wall, steps, _, bs = capture(args.logdir, args.model, args.bs,
                                 args.steps, policy)
    (by_cat, by_op, by_while, total_ps, busy_ps, async_ps,
     planes) = parse_xplanes(args.logdir)

    step_ms_device = busy_ps / 1e9 / steps
    rows = []
    for cat, ps in by_cat.most_common():
        ms = ps / 1e9 / steps
        rows.append({"category": cat, "ms_per_step": round(ms, 2),
                     "pct_of_device": round(100.0 * ps / total_ps, 1)})
    top_ops = [{"category": c, "op": o,
                "ms_per_step": round(ps / 1e9 / steps, 2)}
               for (c, o), ps in by_op.most_common(15)]

    out = {"model": args.model, "bs": bs, "steps_traced": steps,
           "wall_ms_per_step": round(wall / steps * 1e3, 1),
           "device_busy_ms_per_step": round(step_ms_device, 1),
           "dispatch_gap_ms_per_step": round(
               wall / steps * 1e3 - step_ms_device, 1),
           "async_copy_ms_per_step": round(
               async_ps / 1e9 / steps, 2),
           "device_planes": planes,
           "scan_loops_ms": {k: round(v / 1e9 / steps, 1)
                             for k, v in by_while.most_common(8)},
           "categories": rows, "top_ops": top_ops}
    with open(os.path.join(_ROOT, "TRAIN_PROFILE.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "top_ops"},
                     indent=1))
    for r in top_ops[:10]:
        print(f"  {r['ms_per_step']:8.2f} ms  {r['category']:<28} "
              f"{r['op']}")


if __name__ == "__main__":
    main()
