"""On-device vector-quantisation nearest-neighbour search.

The reference computes an (N, K) distance matrix with torch then argmins
(/root/reference/vqvae/big_model_attn_gan.py:28-33).  Here the hot path is a
Pallas TPU kernel: the codebook (K<=1024, D=256 -> <=1 MB) lives in VMEM, the
flattened latents stream through in MXU-aligned tiles, and the kernel fuses
the |x|^2 + |e|^2 - 2<x,e> distance with the argmin so the (N, K) distance
matrix never hits HBM.  A pure-XLA fallback keeps CPU tests running.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def vq_nearest_index_xla(x: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """argmin_k ||x_n - e_k||^2, pure XLA.  x: (N, D), codebook: (K, D)."""
    x2 = jnp.sum(x * x, axis=1, keepdims=True)
    e2 = jnp.sum(codebook * codebook, axis=1)
    # full f32 on the MXU: bf16 passes flip argmin results near codebook
    # decision boundaries, breaking code-index parity with the reference.
    xe = jnp.dot(x, codebook.T, preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    dist = x2 + e2[None, :] - 2.0 * xe
    return jnp.argmin(dist, axis=1).astype(jnp.int32)


def _vq_kernel(x_ref, cb_ref, e2_ref, out_ref):
    x = x_ref[:]                                     # (BN, D)
    cb = cb_ref[:]                                   # (K, D)
    scores = jax.lax.dot_general(
        x, cb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)         # (BN, K)
    # ||x||^2 is constant per row — drop it; argmin of (e2 - 2 x.e) is the same.
    dist = e2_ref[:] - 2.0 * scores
    out_ref[:] = jnp.argmin(dist, axis=1, keepdims=True).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_n",))
def vq_nearest_index_pallas(x: jnp.ndarray, codebook: jnp.ndarray,
                            block_n: int = 512) -> jnp.ndarray:
    """Pallas kernel: fused distance + argmin, codebook resident in VMEM."""
    n, d = x.shape
    k = codebook.shape[0]
    n_pad = _round_up(max(n, 8), block_n)
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
    e2 = jnp.sum(codebook.astype(jnp.float32) ** 2, axis=1)[None, :]  # (1, K)

    out = pl.pallas_call(
        _vq_kernel,
        grid=(n_pad // block_n,),
        in_specs=[
            pl.BlockSpec((block_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_n, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        interpret=not _on_tpu(),  # lets CPU tests exercise the kernel
    )(x.astype(jnp.float32), codebook.astype(jnp.float32), e2)
    return out[:n, 0]


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def vq_nearest_index(x: jnp.ndarray, codebook: jnp.ndarray,
                     use_pallas: bool | None = None) -> jnp.ndarray:
    """Nearest codebook index for each row of x.  (N, D) x (K, D) -> (N,).

    Inputs are stop_gradient'ed: argmin indices carry no tangents, and the
    Pallas kernel has no autodiff rule — without this, differentiating VQ-VAE
    training through the quantiser fails on TPU ("Linearization failed").
    The straight-through estimator supplies the gradient path instead
    (models/vqvae.py).
    """
    x = jax.lax.stop_gradient(x)
    codebook = jax.lax.stop_gradient(codebook)
    if use_pallas is None:
        use_pallas = _on_tpu()
    if use_pallas:
        return vq_nearest_index_pallas(x, codebook)
    return vq_nearest_index_xla(x, codebook)


def vq_lookup(indices: jnp.ndarray, codebook: jnp.ndarray) -> jnp.ndarray:
    """indices (...,) -> embeddings (..., D)
    (reference ``get_codebook_entry``: big_model_attn_gan.py:56-71)."""
    return jnp.take(codebook, indices, axis=0)
