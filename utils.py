"""Root-level research utilities.

API parity with /root/reference/utils.py: init helpers (:7-16), the
importance-weighted NLL driver ``calc_iwnll`` (:50-77), corpus ``calc_mi``
v3 (:90-158) and ``calc_au`` (:161-188), latent dumping helpers
``sample_sentences``/``visualize_latent`` (:191-247), and
``call_multi_bleu_perl`` (:250-267 — which references a perl script absent
from the reference repo as well; kept as an explicit stub).

The math lives in melspec_gpt_vqvae_tpu.models.gpt_vae; these wrappers keep
the reference's (model, loader)-shaped call signatures.
"""

from __future__ import annotations

import math
import os

import jax
import jax.numpy as jnp
import numpy as np


def uniform_initializer(stdv: float):
    """(reference: utils.py:7-11)"""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -stdv, stdv)
    return init


def xavier_normal_initializer():
    """(reference: utils.py:13-16)"""
    import flax.linen as nn
    return nn.initializers.xavier_normal()


def calc_iwnll(task, state, loader, nsamples: int = 500, ns: int = 10,
               key=None):
    """IW NLL/PPL over an eval loader for a VAETask + train state
    (reference: utils.py:50-77).  ``loader`` yields batch dicts with a
    ``codes`` entry; returns (nll, ppl)."""
    return task.calc_iwnll(state, loader, nsamples=nsamples, ns=ns, key=key)


def calc_mi(task, state, loader, key=None):
    """Corpus mutual information (reference: utils.py:90-158)."""
    batches = list(loader)
    mi, _, _ = task.calc_mi_au(state, batches, key=key)
    return mi


def calc_au(task, state, loader, delta: float = 0.01):
    """Active units (reference: utils.py:161-188)."""
    from melspec_gpt_vqvae_tpu.models.gpt_vae import (
        active_units_from_means, encoder_forward)
    from melspec_gpt_vqvae_tpu.training.gpt_task import tokens_from_batch
    means = []
    for b in loader:
        x = tokens_from_batch(jnp.asarray(b["codes"]))
        mu, _ = encoder_forward(state["params"], task.cfgs, x)
        means.append(np.asarray(mu))
    au, au_var = active_units_from_means(
        jnp.asarray(np.concatenate(means, axis=0)), delta)
    return int(au), au_var


def sample_sentences(task, state, strategy: str, fname: str,
                     nsamples: int = 100, key=None):
    """Sample token sequences from the prior and dump them
    (reference: utils.py:191-213)."""
    from melspec_gpt_vqvae_tpu.models.gpt_vae import sample_from_prior
    key = key if key is not None else jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    z = sample_from_prior(k1, task.cfgs, nsamples)[:, None, :]
    toks = np.asarray(task.decode(state, z, strategy, key=k2))
    with open(fname, "w") as f:
        for row in toks:
            f.write(" ".join(str(int(t)) for t in row) + "\n")
    return toks


def visualize_latent(task, state, loader, fname: str = "latent.txt"):
    """Dump posterior means + labels for latent-space visualisation
    (reference: utils.py:216-247)."""
    from melspec_gpt_vqvae_tpu.models.gpt_vae import encoder_forward
    from melspec_gpt_vqvae_tpu.training.gpt_task import tokens_from_batch
    rows = []
    for b in loader:
        x = tokens_from_batch(jnp.asarray(b["codes"]))
        mu, _ = encoder_forward(state["params"], task.cfgs, x)
        labels = b.get("label", ["?"] * x.shape[0])
        for lbl, vec in zip(labels, np.asarray(mu)):
            rows.append((lbl, vec))
    with open(fname, "w") as f:
        for lbl, vec in rows:
            f.write(lbl + "\t" + " ".join(f"{v:.6f}" for v in vec) + "\n")
    return rows


def reconstruct(task, state, loader, strategy: str, fname: str, key=None):
    """Reconstruct a whole loader and dump token rows
    (reference: utils.py:19-47)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    with open(fname, "w") as f:
        for b in loader:
            key, k = jax.random.split(key)
            rec = np.asarray(task.reconstruct(state, b, strategy, key=k))
            for row in rec:
                f.write(" ".join(str(int(t)) for t in row) + "\n")


def corpus_bleu(hyp_lines, ref_lines, max_n: int = 4):
    """Corpus BLEU with the multi-bleu.perl semantics: modified n-gram
    precision for n=1..4 pooled over the corpus, geometric mean, brevity
    penalty exp(1 - ref_len/hyp_len) when hyp is shorter.  Returns
    (bleu_percent, precisions, bp, hyp_len, ref_len)."""
    from collections import Counter

    match = [0] * max_n
    total = [0] * max_n
    hyp_len = ref_len = 0
    for hyp, ref in zip(hyp_lines, ref_lines):
        h, r = hyp.split(), ref.split()
        hyp_len += len(h)
        ref_len += len(r)
        for n in range(1, max_n + 1):
            hc = Counter(tuple(h[i:i + n]) for i in range(len(h) - n + 1))
            rc = Counter(tuple(r[i:i + n]) for i in range(len(r) - n + 1))
            total[n - 1] += max(0, len(h) - n + 1)
            match[n - 1] += sum(min(c, rc[g]) for g, c in hc.items())
    precisions = [m / t if t else 0.0 for m, t in zip(match, total)]
    if min(precisions) > 0:
        log_avg = sum(math.log(p) for p in precisions) / max_n
        geo = math.exp(log_avg)
    else:
        geo = 0.0
    bp = 1.0 if hyp_len > ref_len or hyp_len == 0 else math.exp(
        1.0 - ref_len / hyp_len)
    return 100.0 * bp * geo, precisions, bp, hyp_len, ref_len


def call_multi_bleu_perl(fname_bleu: str, fname_hyp: str, fname_ref: str,
                         verbose: bool = True) -> float:
    """BLEU of a reconstruction dump vs the original token rows.

    The reference shells out to scripts/multi-bleu.perl — a script absent
    from its own repo (utils.py:250-267), so its version can never run.
    This one computes the same score in pure Python (``corpus_bleu``
    reimplements the perl's pooled modified-precision + brevity-penalty
    math) and returns the float the reference would have parsed from
    "BLEU = X, ...".  ``fname_bleu`` is accepted for signature parity and
    ignored."""
    with open(fname_hyp) as f:
        hyp = [ln.rstrip("\n") for ln in f]
    with open(fname_ref) as f:
        ref = [ln.rstrip("\n") for ln in f]
    if len(hyp) != len(ref):
        raise ValueError(f"hyp has {len(hyp)} lines, ref has {len(ref)}")
    bleu, prec, bp, hl, rl = corpus_bleu(hyp, ref)
    if verbose:
        pstr = "/".join(f"{100 * p:.1f}" for p in prec)
        print(f"BLEU = {bleu:.2f}, {pstr} "
              f"(BP={bp:.3f}, hyp_len={hl}, ref_len={rl})")
    return bleu
