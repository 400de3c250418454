"""Legacy LSTM VAE family tests (SURVEY.md §2.2 inventory)."""

import jax
import jax.numpy as jnp
import numpy as np

from melspec_gpt_vqvae_tpu.models import lstm_vae as L

CFG = L.LSTMConfig(vocab_size=20, nz=8, ni=12, enc_nh=16, dec_nh=16,
                   bos_id=18, eos_id=19, max_len=15,
                   dec_dropout_in=0.5, dec_dropout_out=0.5)


def _x(b=3, t=10, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 18, (b, t)).astype(np.int32)
    x[:, 0] = CFG.bos_id
    x[:, -1] = CFG.eos_id
    return jnp.asarray(x)


def test_encoder_shapes_and_kl():
    p = L.init_lstm_encoder(jax.random.PRNGKey(0), CFG)
    mu, logvar = L.lstm_encoder_forward(p, CFG, _x())
    assert mu.shape == (3, 8) and logvar.shape == (3, 8)
    z, kl = L.lstm_encode(p, CFG, jax.random.PRNGKey(1), _x(), 4)
    assert z.shape == (3, 4, 8) and kl.shape == (3,)
    assert (np.asarray(kl) >= -1e-4).all()  # >=0 up to float rounding


def test_decoder_reconstruct_error():
    p = L.init_lstm_decoder(jax.random.PRNGKey(0), CFG)
    z = jnp.asarray(np.random.default_rng(1).standard_normal((3, 2, 8)),
                    jnp.float32)
    err = L.lstm_reconstruct_error(p, CFG, _x(), z)
    assert err.shape == (3, 2)
    assert (np.asarray(err) > 0).all()
    np.testing.assert_allclose(
        np.asarray(L.lstm_log_probability(p, CFG, _x(), z)),
        -np.asarray(err), atol=1e-6)


def test_sample_decode_terminates_and_masks():
    p = L.init_lstm_decoder(jax.random.PRNGKey(0), CFG)
    z = jnp.zeros((2, 8))
    toks, lengths = L.lstm_sample_decode(p, CFG, jax.random.PRNGKey(0), z,
                                         greedy=True)
    assert toks.shape == (2, CFG.max_len)
    # greedy from identical z is identical
    toks2, _ = L.lstm_sample_decode(p, CFG, jax.random.PRNGKey(5), z,
                                    greedy=True)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))


def test_beam_search_beats_or_matches_greedy():
    p = L.init_lstm_decoder(jax.random.PRNGKey(2), CFG)
    z = jnp.asarray(np.random.default_rng(3).standard_normal((3, 8)),
                    jnp.float32)
    top, scores = L.lstm_beam_search(p, CFG, z, beam=4)
    assert top.shape == (3, CFG.max_len)
    assert scores.shape == (3,)

    # score the greedy sequence under the model; beam score must be >= it
    def seq_logp(tokens):
        src = jnp.concatenate(
            [jnp.full((tokens.shape[0], 1), CFG.bos_id, jnp.int32),
             tokens[:, :-1]], axis=1)
        logits = L.lstm_decode_logits(p, CFG, src, z)
        logp = jax.nn.log_softmax(logits, -1)
        return jnp.sum(jnp.take_along_axis(
            logp, tokens[..., None], axis=-1)[..., 0], axis=-1)

    greedy, _ = L.lstm_sample_decode(p, CFG, jax.random.PRNGKey(0), z,
                                     greedy=True)
    sg = np.asarray(seq_logp(greedy))
    sb = np.asarray(seq_logp(top))
    assert (sb >= sg - 1e-3).all()


def test_vae_loss_and_mh_sampling():
    p = L.init_lstm_vae(jax.random.PRNGKey(0), CFG)
    loss, rec, kl = L.lstm_vae_loss(p, CFG, jax.random.PRNGKey(1), _x(), 0.5)
    np.testing.assert_allclose(np.asarray(loss),
                               np.asarray(rec + 0.5 * kl), rtol=1e-5)
    zs = L.mh_sample_posterior(p, CFG, jax.random.PRNGKey(2), _x(),
                               nsamples=4, burn_in=2)
    assert zs.shape == (3, 4, 8)
    assert np.isfinite(np.asarray(zs)).all()


def test_lstm_lm_and_discriminators():
    p = L.init_lstm_lm(jax.random.PRNGKey(0), CFG)
    nll = L.lstm_lm_nll(p, CFG, _x())
    assert nll.shape == (3,) and (np.asarray(nll) > 0).all()

    mean = jnp.asarray(np.random.default_rng(0).standard_normal((5, 8)),
                       jnp.float32)
    lin = L.init_linear_discriminator(jax.random.PRNGKey(1), 8, 4)
    assert L.linear_discriminator_logits(lin, mean).shape == (5, 4)
    mlp = L.init_mlp_discriminator(jax.random.PRNGKey(2), 8, 4)
    assert L.mlp_discriminator_logits(mlp, mean).shape == (5, 4)


def test_vocab_entry():
    from melspec_gpt_vqvae_tpu.data.vocab import VocabEntry
    v = VocabEntry()
    assert len(v) == 130
    assert v["<s>"] == 128 and v["</s>"] == 129
    assert v[5] == 5
    assert v.id2word(128) == "<s>"
    assert 7 in v and "<s>" in v
    assert v.decode_sentence([jnp.asarray(128), jnp.asarray(3)]) == ["<s>", 3]
