"""Transformer decoder tests: teacher-forced parallel pass vs incremental
KV-cache stepping (the property the on-device beam search relies on),
shapes, attention maps, and gradient health. SURVEY.md §4 'Module units'."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.data.tokenizer import SOS_EOS_ID
from pytorch_end2end_speech_recognition_tpu.models.decoder_transformer import (
    TransformerDecoder,
)
from pytorch_end2end_speech_recognition_tpu.utils.config import ModelConfig


def _cfg(vocab=12):
    cfg = ModelConfig()
    cfg.decoder = "transformer"
    cfg.decoder_layers = 2
    cfg.decoder_dim = 16
    cfg.decoder_heads = 2
    cfg.decoder_ffn_dim = 32
    cfg.decoder_dropout = 0.1
    cfg.vocab_size = vocab
    cfg.dtype = "float32"
    return cfg


def _setup(rng, B=2, T=9, d_enc=10, U=5, vocab=12):
    cfg = _cfg(vocab)
    dec = TransformerDecoder(d_enc, cfg, nnx.Rngs(0))
    enc = jnp.asarray(rng.standard_normal((B, T, d_enc)).astype(np.float32))
    enc_lens = jnp.asarray([T, T - 3], jnp.int32)[:B]
    tokens = jnp.asarray(rng.integers(2, vocab, (B, U)).astype(np.int32))
    token_lens = jnp.asarray([U, U - 2], jnp.int32)[:B]
    return cfg, dec, enc, enc_lens, tokens, token_lens


def test_step_matches_teacher_forced(rng):
    """Stepping with the KV cache must reproduce the parallel forward's
    log-probs at every position (same tokens fed)."""
    cfg, dec, enc, enc_lens, tokens, token_lens = _setup(rng)
    B, U = tokens.shape
    T = enc.shape[1]
    ref = dec(enc, enc_lens, tokens, token_lens, train=False)  # (B,U+1,V)

    keys = dec.precompute(enc)
    mask = jnp.arange(T)[None, :] < enc_lens[:, None]
    state = dec.init_state(B, T, max_len=U + 1)
    sos = jnp.full((B,), SOS_EOS_ID, jnp.int32)
    inputs = jnp.concatenate([sos[:, None], tokens], axis=1)   # (B,U+1)
    for u in range(U + 1):
        logp, state, attn = dec.step(inputs[:, u], state, keys, enc, mask)
        np.testing.assert_allclose(
            np.asarray(logp), np.asarray(ref[:, u]), atol=1e-4, rtol=1e-4
        )
        assert attn.shape == (B, T)
        # cross-attention is a masked softmax: padded frames get 0 weight
        np.testing.assert_allclose(
            np.asarray(attn.sum(axis=-1)), 1.0, atol=1e-5
        )
        assert float(jnp.abs(jnp.where(mask, 0.0, attn)).max()) < 1e-6


def test_forward_shapes_and_attn(rng):
    cfg, dec, enc, enc_lens, tokens, token_lens = _setup(rng)
    B, U = tokens.shape
    T = enc.shape[1]
    logps, attn = dec(enc, enc_lens, tokens, token_lens, return_attn=True)
    assert logps.shape == (B, U + 1, cfg.vocab_size)
    assert attn.shape == (B, U + 1, T)
    # log-softmax rows normalize
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logps).sum(-1)), 1.0, atol=1e-4
    )


def test_gradients_flow_and_dropout_rng(rng):
    cfg, dec, enc, enc_lens, tokens, token_lens = _setup(rng)
    graphdef, params = nnx.split(dec, nnx.Param)

    def loss_fn(p, key):
        d = nnx.merge(graphdef, p)
        logps = d(enc, enc_lens, tokens, token_lens, train=True, rng=key)
        return -logps.mean()

    loss, grads = jax.value_and_grad(loss_fn)(params, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)
    # different dropout keys -> different training losses
    loss2 = loss_fn(params, jax.random.PRNGKey(1))
    assert abs(float(loss) - float(loss2)) > 0


def test_causality(rng):
    """Changing a later input token must not affect earlier positions."""
    cfg, dec, enc, enc_lens, tokens, token_lens = _setup(rng)
    ref = dec(enc, enc_lens, tokens, token_lens)
    tok2 = tokens.at[:, -1].set((tokens[:, -1] + 1) % cfg.vocab_size)
    out2 = dec(enc, enc_lens, tok2, token_lens)
    U = tokens.shape[1]
    np.testing.assert_allclose(
        np.asarray(ref[:, :U]), np.asarray(out2[:, :U]), atol=1e-5
    )
    assert float(jnp.abs(ref[:, U] - out2[:, U]).max()) > 1e-6
