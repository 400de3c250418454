"""Class-conditional GPT training system (the reference's ``Lit_minGPT``,
/root/reference/transformer/minGPT.py:216-665, rebuilt as jitted pure
functions over an explicit train state).

  * CE loss over all 265 positions with the conditioning offset
    (reference shared_step/forward: minGPT.py:260-285, 413-417);
  * AdamW with the minGPT decay partition (optim.py);
  * KV-cached sampling galleries for logging — half-prefix sample,
    from-scratch sample, deterministic sample, reconstruction, attention
    maps (reference log_images: minGPT.py:530-612);
  * data-parallel by construction: the train step is jitted over a mesh
    with the batch sharded on the ``data`` axis; XLA inserts the gradient
    psum that DDP did with NCCL (reference: GPT_VAE_train.py:172-174).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..configs import ExperimentConfig, GPTConfig
from ..models.gpt import (class_embed, cross_entropy_loss, gpt_apply,
                          gpt_attention_maps, gpt_generate, init_gpt_params)
from ..parallel.mesh import MODEL_AXIS, make_mesh, put_batch, replicated
from .optim import gpt_adamw

TrainState = Dict[str, Any]


def tokens_from_batch(codes: jnp.ndarray) -> jnp.ndarray:
    """(B, 5, 53) code grid -> (B, 265) column-major tokens
    (reference get_x: minGPT.py:387-394)."""
    b = codes.shape[0]
    return jnp.swapaxes(codes, 1, 2).reshape(b, -1).astype(jnp.int32)


def gpt_loss_fn(params, cfg: GPTConfig, x: jnp.ndarray, c: jnp.ndarray,
                rng: Optional[jax.Array] = None, train: bool = False,
                use_pallas=None) -> jnp.ndarray:
    """Conditioned next-token CE (reference: minGPT.py:260-285, 413-417).

    x: (B, 265) tokens; c: (B,) or (B, 1) class index.
    """
    cond = class_embed(params, c)
    logits, _ = gpt_apply(params, cfg, x[:, :-1], cond, train=train, rng=rng,
                          use_pallas=use_pallas)
    logits = logits[:, cond.shape[1] - 1:]   # p(x_i | x_<i, class)
    return cross_entropy_loss(logits, x)


class GPTTask:
    """Owns config + mesh + jitted steps for the GPT-class model.

    A mesh with a ``pipe`` axis switches the loss to the pipeline-parallel
    stack (parallel/pipeline.py): blocks stage-sharded over ``pipe``,
    microbatched GPipe schedule, composing with the ``data`` axis.
    ``pp_micro`` sets the microbatch count (0 = 2 * n_stages).
    """

    def __init__(self, exp: ExperimentConfig, mesh=None, use_pallas=None,
                 pp_micro: int = 0):
        self.exp = exp
        self.cfg = exp.model
        self.mesh = mesh or make_mesh()
        self.use_pallas = use_pallas
        self.optimizer = gpt_adamw(exp.train.learning_rate,
                                   exp.train.weight_decay, exp.train.betas)

        from ..parallel.pipeline import PIPE_AXIS, gpt_pp_loss_fn
        self.pp = PIPE_AXIS in self.mesh.shape
        self.pp_micro = pp_micro

        cfg, opt = self.cfg, self.optimizer
        # In the differentiated loss, "auto" (None) resolves to the XLA
        # path: the fused Pallas attention is inference-only (no VJP).  An
        # explicit use_pallas=True is honored as requested.
        train_pallas = bool(use_pallas) if use_pallas is not None else False

        if self.pp:
            mesh_, micro = self.mesh, pp_micro

            def loss_fn(p, x, c, rng=None, train=False, use_pallas=None):
                return gpt_pp_loss_fn(p, cfg, x, c, mesh_, n_micro=micro,
                                      rng=rng, train=train,
                                      use_pallas=use_pallas)
        else:
            def loss_fn(p, x, c, rng=None, train=False, use_pallas=None):
                return gpt_loss_fn(p, cfg, x, c, rng, train=train,
                                   use_pallas=use_pallas)
        self._loss_fn = loss_fn

        def train_step(state, x, c, rng):
            def loss(p):
                return loss_fn(p, x, c, rng, train=True,
                               use_pallas=train_pallas)
            l, g = jax.value_and_grad(loss)(state["params"])
            updates, opt_state = opt.update(g, state["opt_state"],
                                            state["params"])
            params = optax.apply_updates(state["params"], updates)
            return {"params": params, "opt_state": opt_state,
                    "step": state["step"] + 1}, l

        def eval_step(params, x, c):
            return loss_fn(params, x, c, use_pallas=use_pallas)

        self._train_step_fn = train_step   # unjitted (bench_train scans it)
        self._train_step = jax.jit(train_step, donate_argnums=0)
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def perf_timer(self, window: int = 50):
        """StepTimer reporting tokens/s + MFU for this task's train step
        (perf/* scalars on TensorBoard)."""
        from ..utils.profiling import StepTimer, count_params, gpt_fwd_flops
        shapes = jax.eval_shape(
            lambda k: init_gpt_params(k, self.cfg), jax.random.PRNGKey(0))
        n = count_params(shapes)
        # batch_size is PER PROCESS (each host loads its shard of the
        # global batch); StepTimer's contract is global-batch FLOPs over
        # all devices' peak, and tick() receives local rows
        b = self.exp.train.batch_size * jax.process_count()
        t = self.cfg.block_size - 1
        fwd = gpt_fwd_flops(n, b, t, self.cfg.n_layer, self.cfg.n_embd)
        return StepTimer(window, tokens_per_example=t,
                         flops_per_step=3.0 * fwd,
                         batch_scale=jax.process_count())

    def init_state(self, seed: int = 783435) -> TrainState:
        params = init_gpt_params(jax.random.PRNGKey(seed), self.cfg)
        if self.pp:
            from ..parallel.pipeline import shard_gpt_params_pp
            params = shard_gpt_params_pp(self.mesh, params)
        elif MODEL_AXIS in self.mesh.shape:
            # --mesh ...,model=N: Megatron-TP shard the weights (and, via
            # optax init on the sharded tree, the optimizer moments) —
            # a replicated tree here would silently waste the TP axis
            from ..parallel.mesh import shard_gpt_params
            params = shard_gpt_params(self.mesh, params)
        else:
            params = jax.device_put(params, replicated(self.mesh))
        from ..parallel.mesh import replicate_stragglers
        # scalar leaves (opt count, live LR, step) must span the mesh like
        # everything else or a committed restore breaks (see mesh.py)
        return replicate_stragglers(self.mesh, {
            "params": params,
            "opt_state": self.optimizer.init(params),
            "step": jnp.zeros((), jnp.int32)})

    def _shard_batch(self, batch: Dict) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = tokens_from_batch(jnp.asarray(batch["codes"]))
        c = jnp.asarray(batch["target"]).reshape(-1)
        # local rows -> global batch array (multi-process safe)
        return put_batch(self.mesh, x), put_batch(self.mesh, c)

    def train_step(self, state: TrainState, batch: Dict,
                   rng: jax.Array) -> Tuple[TrainState, float]:
        x, c = self._shard_batch(batch)
        state, loss = self._train_step(state, x, c, rng)
        return state, loss

    def eval_step(self, state: TrainState, batch: Dict) -> float:
        x, c = self._shard_batch(batch)
        return self._eval_step(state["params"], x, c)

    # ------------------------------------------------------------------
    # Sampling / galleries (reference log_images: minGPT.py:530-612)
    # ------------------------------------------------------------------

    def sample(self, params, key, c, steps: int, given=None,
               temperature: float = 1.0, top_k: Optional[int] = None,
               sample: bool = True) -> jnp.ndarray:
        """KV-cached replacement for the reference's full-forward loop
        (minGPT.py:293-360)."""
        cond = class_embed(params, jnp.asarray(c).reshape(-1))
        return gpt_generate(params, self.cfg, key, cond, given, steps=steps,
                            temperature=temperature, top_k=top_k,
                            sample=sample, use_pallas=self.use_pallas)

    def log_samples(self, params, key, batch, temperature=1.0, top_k=100,
                    n: int = 1) -> Dict[str, np.ndarray]:
        """The reference's gallery: codes, half/nopix/det samples + attention
        maps.  VQ-decoding to spectrograms is done by the caller via a
        VQModel (separation the reference TODO'd at minGPT.py:512-513)."""
        x = tokens_from_batch(jnp.asarray(batch["codes"]))[:n]
        c = jnp.asarray(batch["target"]).reshape(-1)[:n]
        keys = jax.random.split(key, 3)
        t = x.shape[1]

        half = self.sample(params, keys[0], c, steps=t - t // 2,
                           given=x[:, :t // 2], temperature=temperature,
                           top_k=top_k, sample=True)
        nopix = self.sample(params, keys[1], c, steps=t,
                            temperature=temperature, top_k=top_k,
                            sample=True)
        det = self.sample(params, keys[2], c, steps=t, sample=False)

        cond = class_embed(params, c)
        att = gpt_attention_maps(params, self.cfg, nopix, cond)
        return {"codes": np.asarray(x), "codes_half": np.asarray(half),
                "codes_nopix": np.asarray(nopix),
                "codes_det": np.asarray(det), "att_nopix": np.asarray(att)}
