#!/usr/bin/env python
"""Find the backward-scan layout copies TRAIN_PROFILE.json attributed
~24 ms/step to (copy.288 / copy.294): compile the SAME VAS VAE train
step (cache-hit through the tunnel) and dump the optimized HLO, then
print each big `copy` op with its operand shapes + layouts so the
source tensor is identifiable."""
import os, re, sys
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
import dataclasses
import jax, jax.numpy as jnp, numpy as np
from melspec_gpt_vqvae_tpu.configs import load_preset

jax.config.update("jax_default_prng_impl", "rbg")
exp = load_preset("GPT_VAE", "vas")
policy = dict(remat_policy="attn", mixed_precision=True)
exp = dataclasses.replace(exp, model=exp.model.replace(**policy))
bs = exp.train.batch_size
rng0 = np.random.default_rng(0)
from melspec_gpt_vqvae_tpu.training.vae_task import VAETask
task = VAETask(exp, steps_per_epoch=100)
state = task.init_state(0)
x = task._shard({"codes": rng0.integers(
    0, exp.model.vocab_size, (bs, 5, 53)).astype(np.int32)})
freeze = jnp.asarray(False)
step = jax.jit(lambda s, r: task._train_step_fn(s, x, r, freeze)[0],
               donate_argnums=0)
lowered = step.lower(state, jax.random.PRNGKey(0))
compiled = lowered.compile()
txt = compiled.as_text()
open("/tmp/vae_step_opt.hlo", "w").write(txt)
print("HLO bytes:", len(txt))
for m in re.finditer(r'^\s*(\S+) = (\S+) copy\(([^)]*)\)', txt, re.M):
    name, shape = m.group(1), m.group(2)
    nums = [int(n) for n in re.findall(r'\d+', shape.split('{')[0])]
    import math
    elems = math.prod(nums) if nums else 0
    if elems >= 1 << 22:   # >= 4M elements
        print(f"{name}  {shape}  <- {m.group(3)[:120]}")
