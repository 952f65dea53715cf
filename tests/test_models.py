"""Model unit tests: encoder shapes/length math, masking invariance,
decoder teacher forcing, LM. SURVEY.md §4 "Module units"."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.models.decoder import (
    AttentionDecoder,
)
from pytorch_end2end_speech_recognition_tpu.models.encoders import (
    build_encoder,
)
from pytorch_end2end_speech_recognition_tpu.models.lm import RnnLm, lm_loss
from pytorch_end2end_speech_recognition_tpu.utils.config import ModelConfig


def _x(rng, B=2, T=37, F=80):
    return jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))


def _cfg(**kw):
    base = dict(encoder_dim=32, encoder_ffn_dim=64, encoder_heads=4,
                decoder_dim=32, embed_dim=16, attention_dim=24,
                vocab_size=11, dtype="float32", lm_dim=32, lm_embed_dim=16)
    base.update(kw)
    return ModelConfig(**base)


ENCODER_CASES = [
    ("blstm", dict(encoder_layers=2), 1),
    ("pblstm", dict(encoder_layers=3, pyramid_layers=2), 4),
    ("pblstm", dict(encoder_layers=3, pyramid_layers=2, vgg_frontend=True), 16),
    ("transformer", dict(encoder_layers=2), 4),
    ("conformer", dict(encoder_layers=2), 4),
]


@pytest.mark.parametrize("kind,kw,downsample", ENCODER_CASES)
def test_encoder_shapes_and_lengths(kind, kw, downsample, rng):
    cfg = _cfg(encoder=kind, **kw)
    enc = build_encoder(80, cfg, nnx.Rngs(0))
    x = _x(rng, T=64)
    lens = jnp.asarray([64, 33])
    y, out_lens = enc(x, lens)
    assert y.shape[0] == 2 and y.shape[2] == enc.d_out
    # downsampling factor check (within rounding)
    assert abs(int(out_lens[0]) - 64 // downsample) <= 1
    # padding frames are exactly zero
    T_out = y.shape[1]
    for b in range(2):
        n = int(out_lens[b])
        if n < T_out:
            assert np.abs(np.asarray(y[b, n:])).max() == 0.0


@pytest.mark.parametrize("kind,kw,downsample", ENCODER_CASES)
def test_encoder_padding_invariance(kind, kw, downsample, rng):
    """Same row content, different batch padding -> same valid outputs."""
    cfg = _cfg(encoder=kind, **kw)
    enc = build_encoder(80, cfg, nnx.Rngs(0))
    x = _x(rng, B=1, T=32)
    lens = jnp.asarray([32])
    y1, l1 = enc(x, lens)
    # pad with garbage: encoders must zero pad frames on entry (contract:
    # frontend zero-pads; encoders enforce defensively)
    x_pad = jnp.concatenate([x, jnp.full((1, 32, 80), 7.0)], axis=1)
    y2, l2 = enc(x_pad, lens)
    n = int(l1[0])
    assert int(l2[0]) == n
    np.testing.assert_allclose(
        np.asarray(y1[0, :n]), np.asarray(y2[0, :n]), rtol=2e-4, atol=2e-4
    )


def test_decoder_teacher_forcing_shapes(rng):
    cfg = _cfg()
    dec = AttentionDecoder(24, cfg, nnx.Rngs(0))
    enc = jnp.asarray(rng.standard_normal((2, 15, 24)).astype(np.float32))
    enc_lens = jnp.asarray([15, 9])
    tokens = jnp.asarray([[3, 4, 5, 0], [6, 7, 0, 0]], dtype=jnp.int32)
    token_lens = jnp.asarray([3, 2])
    logps = dec(enc, enc_lens, tokens, token_lens)
    assert logps.shape == (2, 5, cfg.vocab_size)
    # log-probs normalized
    s = np.exp(np.asarray(logps)).sum(axis=-1)
    np.testing.assert_allclose(s, 1.0, rtol=1e-4)


def test_decoder_step_matches_scan(rng):
    """Manual step loop must equal the scan forward (beam search relies on
    step())."""
    cfg = _cfg()
    dec = AttentionDecoder(24, cfg, nnx.Rngs(0))
    enc = jnp.asarray(rng.standard_normal((1, 12, 24)).astype(np.float32))
    enc_lens = jnp.asarray([12])
    tokens = jnp.asarray([[3, 4, 5]], dtype=jnp.int32)
    token_lens = jnp.asarray([3])
    logps_scan = dec(enc, enc_lens, tokens, token_lens)

    keys = dec.att.precompute(enc)
    mask = jnp.arange(12)[None, :] < enc_lens[:, None]
    state = dec.init_state(1, 12)
    inputs = [1, 3, 4, 5]
    outs = []
    for t in inputs:
        logp, state, _ = dec.step(
            jnp.asarray([t], dtype=jnp.int32), state, keys, enc, mask
        )
        outs.append(logp)
    logps_loop = jnp.stack(outs, axis=1)
    np.testing.assert_allclose(
        np.asarray(logps_scan), np.asarray(logps_loop), rtol=1e-5, atol=1e-5
    )


def test_location_attention_is_distribution(rng):
    cfg = _cfg()
    dec = AttentionDecoder(24, cfg, nnx.Rngs(0))
    enc = jnp.asarray(rng.standard_normal((2, 10, 24)).astype(np.float32))
    keys = dec.att.precompute(enc)
    mask = jnp.arange(10)[None, :] < jnp.asarray([[10], [6]])[:, 0][:, None]
    state = dec.init_state(2, 10)
    _, _, attn = dec.step(
        jnp.asarray([1, 1], dtype=jnp.int32), state, keys, enc, mask
    )
    a = np.asarray(attn)
    np.testing.assert_allclose(a.sum(axis=1), 1.0, rtol=1e-5)
    # masked positions get ~0 attention
    assert a[1, 6:].max() < 1e-6


def test_rnn_lm_forward_and_loss(rng):
    cfg = _cfg()
    lm = RnnLm(cfg, nnx.Rngs(0))
    tokens = jnp.asarray([[3, 4, 5, 0], [6, 0, 0, 0]], dtype=jnp.int32)
    lens = jnp.asarray([3, 1])
    logps = lm(tokens, lens)
    assert logps.shape == (2, 5, cfg.vocab_size)
    loss, count = lm_loss(lm, tokens, lens)
    assert float(loss) > 0
    assert int(count) == (3 + 1) + (1 + 1)  # targets + eos per row


def test_transformer_lm_step_matches_parallel(rng):
    from pytorch_end2end_speech_recognition_tpu.models.lm import (
        TransformerLm,
        lm_loss,
    )
    from pytorch_end2end_speech_recognition_tpu.utils.config import (
        ModelConfig,
    )

    cfg = ModelConfig(vocab_size=11, lm_type="transformer", lm_layers=2,
                      lm_dim=16, lm_heads=2, lm_ffn_dim=32)
    lm = TransformerLm(cfg, nnx.Rngs(0))
    B, U = 2, 6
    tokens = jnp.asarray(rng.integers(2, 11, (B, U)).astype(np.int32))
    lens = jnp.asarray([U, U - 2], jnp.int32)
    ref = lm(tokens, lens)                          # (B, U+1, V)
    state = lm.init_state(B, U + 1)
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        SOS_EOS_ID,
    )

    inputs = jnp.concatenate(
        [jnp.full((B, 1), SOS_EOS_ID, jnp.int32), tokens], axis=1)
    for u in range(U + 1):
        logp, state = lm.step(inputs[:, u], state)
        np.testing.assert_allclose(np.asarray(logp), np.asarray(ref[:, u]),
                                   atol=1e-4, rtol=1e-4)
    # lm_loss is generic over LM kinds
    loss, count = lm_loss(lm, tokens, lens)
    assert np.isfinite(float(loss)) and int(count) == int(lens.sum()) + B
