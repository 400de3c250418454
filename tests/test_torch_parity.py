"""Numerical parity with torch semantics (no reference code involved).

Builds the same computation with torch.nn.functional primitives from the
same weights and checks our JAX forward matches: LayerNorm eps, exact-erf
GELU, causal masked softmax attention, and the VQ straight-through argmin.
This is the strongest CPU-side guard for checkpoint-conversion fidelity.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from melspec_gpt_vqvae_tpu.configs import GPTConfig  # noqa: E402
from melspec_gpt_vqvae_tpu.models import gpt as G  # noqa: E402
from melspec_gpt_vqvae_tpu.utils.convert import convert_gpt_state_dict  # noqa: E402


def _torch_block_forward(sd, x, n_head, n_unmasked=0):
    """minGPT block semantics in torch.nn.functional (pre-LN, exact GELU,
    masked softmax attention) — written from the math, not the reference."""
    import torch.nn.functional as F

    def ln(x, w, b):
        return F.layer_norm(x, (x.shape[-1],), w, b, eps=1e-5)

    B, T, C = x.shape
    h = ln(x, sd["ln1.weight"], sd["ln1.bias"])
    q = h @ sd["attn.query.weight"].T + sd["attn.query.bias"]
    k = h @ sd["attn.key.weight"].T + sd["attn.key.bias"]
    v = h @ sd["attn.value.weight"].T + sd["attn.value.bias"]
    hd = C // n_head
    q = q.view(B, T, n_head, hd).transpose(1, 2)
    k = k.view(B, T, n_head, hd).transpose(1, 2)
    v = v.view(B, T, n_head, hd).transpose(1, 2)
    att = (q @ k.transpose(-2, -1)) / (hd ** 0.5)
    mask = torch.tril(torch.ones(T, T, dtype=torch.bool))
    if n_unmasked > 0:
        mask[:n_unmasked, :n_unmasked] = True
    att = att.masked_fill(~mask, float("-inf"))
    att = F.softmax(att, dim=-1)
    y = (att @ v).transpose(1, 2).reshape(B, T, C)
    y = y @ sd["attn.proj.weight"].T + sd["attn.proj.bias"]
    x = x + y
    h2 = ln(x, sd["ln2.weight"], sd["ln2.bias"])
    m = F.gelu(h2 @ sd["mlp.0.weight"].T + sd["mlp.0.bias"])  # exact erf
    m = m @ sd["mlp.2.weight"].T + sd["mlp.2.bias"]
    return x + m


@pytest.mark.parametrize("n_unmasked", [0, 7])
def test_gpt_forward_matches_torch_semantics(n_unmasked):
    d, V, T, H = 16, 13, 7, 2
    rng = np.random.default_rng(0)

    def t(shape, s=0.2):
        return torch.from_numpy(
            (rng.standard_normal(shape) * s).astype(np.float32))

    sd_block = {
        "ln1.weight": t(d, 0.1) + 1, "ln1.bias": t(d, 0.1),
        "attn.query.weight": t((d, d)), "attn.query.bias": t(d),
        "attn.key.weight": t((d, d)), "attn.key.bias": t(d),
        "attn.value.weight": t((d, d)), "attn.value.bias": t(d),
        "attn.proj.weight": t((d, d)), "attn.proj.bias": t(d),
        "ln2.weight": t(d, 0.1) + 1, "ln2.bias": t(d, 0.1),
        "mlp.0.weight": t((4 * d, d)), "mlp.0.bias": t(4 * d),
        "mlp.2.weight": t((d, 4 * d)), "mlp.2.bias": t(d),
    }
    tok_emb = t((V, d), 1.0)
    pos_emb = t((1, T, d), 0.5)
    ln_f_w, ln_f_b = t(d, 0.1) + 1, t(d, 0.1)
    head_w = t((V, d))

    # torch forward
    x_ids = torch.from_numpy(rng.integers(0, V, (2, T)))
    x = tok_emb[x_ids] + pos_emb[:, :T]
    x = _torch_block_forward(sd_block, x, H, n_unmasked)
    x = torch.nn.functional.layer_norm(x, (d,), ln_f_w, ln_f_b, eps=1e-5)
    logits_t = (x @ head_w.T).numpy()

    # ours, via the converter
    sd = {f"transformer.blocks.0.{k}": v.numpy() for k, v in sd_block.items()}
    sd["transformer.tok_emb.weight"] = tok_emb.numpy()
    sd["transformer.pos_emb"] = pos_emb.numpy()
    sd["transformer.ln_f.weight"] = ln_f_w.numpy()
    sd["transformer.ln_f.bias"] = ln_f_b.numpy()
    sd["transformer.head.weight"] = head_w.numpy()
    params = jax.tree_util.tree_map(
        jnp.asarray, convert_gpt_state_dict(sd, n_layer=1))
    cfg = GPTConfig(vocab_size=V, block_size=T, n_layer=1, n_head=H,
                    n_embd=d, n_unmasked=n_unmasked)
    logits_j, _ = G.gpt_apply(params, cfg, jnp.asarray(x_ids.numpy()),
                              use_pallas=False)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t, atol=2e-5)


def test_vq_straight_through_matches_torch():
    """The VQ loss/quantised output matches a torch implementation of the
    same math (distances, argmin, mse losses, straight-through)."""
    from melspec_gpt_vqvae_tpu.models.vqvae import VectorQuantizer

    rng = np.random.default_rng(1)
    K, D = 8, 4
    cb = rng.standard_normal((K, D)).astype(np.float32)
    z = rng.standard_normal((2, 3, 3, D)).astype(np.float32)

    # torch math (from the VQ-VAE paper's formulation)
    zt = torch.from_numpy(z)
    cbt = torch.from_numpy(cb)
    flat = zt.reshape(-1, D)
    d2 = (flat ** 2).sum(1, keepdim=True) + (cbt ** 2).sum(1) \
        - 2 * flat @ cbt.T
    idx_t = d2.argmin(1)
    quant_t = cbt[idx_t].reshape(zt.shape)
    e_loss = torch.mean((quant_t.detach() - zt) ** 2)
    q_loss = torch.mean((quant_t - zt.detach()) ** 2)
    loss_t = (q_loss + 0.25 * e_loss).item()

    vq = VectorQuantizer(K, D)
    loss_j, quant_j, (perp, idx_j) = vq.apply(
        {"params": {"embedding": jnp.asarray(cb)}}, jnp.asarray(z))
    np.testing.assert_array_equal(np.asarray(idx_j).reshape(-1),
                                  idx_t.numpy())
    np.testing.assert_allclose(float(loss_j), loss_t, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(quant_j), quant_t.numpy(),
                               atol=1e-6)  # forward value of straight-through


def test_lstm_cell_matches_torch():
    """Fused-gate LSTM scan vs torch.nn.LSTM from the same weights (gate
    order i,f,g,o; b = bias_ih + bias_hh) — guards LSTM-VAE checkpoint
    conversion fidelity (reference encoders: modules/encoders/enc_lstm.py)."""
    from melspec_gpt_vqvae_tpu.models.lstm_vae import lstm_run

    ni, nh, B, T = 6, 10, 3, 5
    rng = np.random.default_rng(0)
    tl = torch.nn.LSTM(ni, nh, num_layers=1, batch_first=True)
    x = rng.standard_normal((B, T, ni)).astype(np.float32)
    with torch.no_grad():
        out_t, (h_t, c_t) = tl(torch.from_numpy(x))

    p = {"wx": jnp.asarray(tl.weight_ih_l0.detach().numpy().T),
         "wh": jnp.asarray(tl.weight_hh_l0.detach().numpy().T),
         "b": jnp.asarray((tl.bias_ih_l0 + tl.bias_hh_l0).detach().numpy())}
    h0 = jnp.zeros((B, nh))
    out_j, (h_j, c_j) = lstm_run(p, jnp.asarray(x), h0, h0)

    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t[0].numpy(),
                               rtol=1e-5, atol=1e-5)
