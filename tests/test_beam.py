"""Beam search tests: on-device jitted beam vs host-side oracle equivalence,
greedy-attention property, LM fusion, CTC prefix scorer vs CTC forward.
SURVEY.md §4 'Decode regression' + §7 hard part (b)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.data.tokenizer import SOS_EOS_ID
from pytorch_end2end_speech_recognition_tpu.decode.beam import BeamSearchDecoder
from pytorch_end2end_speech_recognition_tpu.decode.oracle import (
    CtcPrefixScorerNp,
    beam_search_oracle,
)
from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
from pytorch_end2end_speech_recognition_tpu.models.lm import RnnLm
from pytorch_end2end_speech_recognition_tpu.ops.ctc import ctc_loss_xla
from pytorch_end2end_speech_recognition_tpu.utils.config import (
    AsrConfig,
    DecodeConfig,
)


def _tiny_model(vocab=10, decoder="lstm"):
    cfg = AsrConfig()
    cfg.model.encoder = "blstm"
    cfg.model.encoder_layers = 1
    cfg.model.encoder_dim = 16
    cfg.model.vocab_size = vocab
    cfg.model.decoder = decoder
    cfg.model.decoder_layers = 2 if decoder == "transformer" else 1
    cfg.model.decoder_dim = 16
    cfg.model.decoder_heads = 2
    cfg.model.embed_dim = 8
    cfg.model.attention_dim = 12
    cfg.model.location_kernel = 5
    cfg.model.location_filters = 4
    cfg.model.ctc_weight = 0.3
    cfg.model.dtype = "float32"
    cfg.frontend.spec_augment = False
    return AsrModel(cfg, nnx.Rngs(0)), cfg


def _enc_and_logp(model, rng, B=2, Ts=4800):
    audio = jnp.asarray(rng.standard_normal((B, Ts)).astype(np.float32) * 0.1)
    audio_lens = jnp.asarray([Ts, Ts // 2], dtype=jnp.int32)[:B]
    enc, enc_lens = model.encode(audio, audio_lens, train=False)
    ctc_logp = jax.nn.log_softmax(model.ctc_logits(enc), axis=-1)
    return enc, enc_lens, ctc_logp


def _oracle_steps(model, enc_b, enc_len, lm=None, max_len=16):
    """Wrap decoder/LM step fns for one utterance (numpy interface)."""
    T = enc_b.shape[0]
    enc1 = enc_b[None]
    keys = model.decoder.precompute(enc1)
    mask = (jnp.arange(T) < enc_len)[None, :]

    def att_step(token, state):
        if state == "INIT":
            state = model.decoder.init_state(1, T, max_len)
        logp, new_state, attn = model.decoder.step(
            jnp.asarray([token], dtype=jnp.int32), state, keys, enc1, mask
        )
        return np.asarray(logp[0]), new_state, np.asarray(attn[0])

    if lm is None:
        return att_step, None

    def lm_step(token, state):
        if state == "INIT":
            state = lm.init_state(1, max_len)
        logp, new_state = lm.step(jnp.asarray([token], dtype=jnp.int32), state)
        return np.asarray(logp[0]), new_state

    return att_step, lm_step


def _device_nbest(out, b, n):
    toks = np.asarray(out["tokens"])[b]
    lens = np.asarray(out["lengths"])[b]
    scores = np.asarray(out["scores"])[b]
    return [(toks[k, : lens[k]].tolist(), float(scores[k])) for k in range(n)]


@pytest.mark.parametrize("ctc_w,lm_w,cov,decoder,lm_type", [
    (0.3, 0.0, 0.0, "lstm", "lstm"), (0.0, 0.0, 0.0, "lstm", "lstm"),
    (0.5, 0.2, 0.0, "lstm", "lstm"), (0.3, 0.0, 0.4, "lstm", "lstm"),
    (0.3, 0.0, 0.0, "transformer", "lstm"),
    (0.5, 0.2, 0.0, "transformer", "lstm"),
    (0.5, 0.2, 0.0, "lstm", "transformer")])
def test_beam_matches_oracle(ctc_w, lm_w, cov, decoder, lm_type, rng):
    model, cfg = _tiny_model(decoder=decoder)
    lm = None
    if lm_w > 0:
        from pytorch_end2end_speech_recognition_tpu.models.lm import build_lm

        cfg.model.lm_type = lm_type
        cfg.model.lm_layers = 1
        cfg.model.lm_dim = 12
        cfg.model.lm_embed_dim = 8
        cfg.model.lm_heads = 2
        lm = build_lm(cfg.model, nnx.Rngs(1))
    dcfg = DecodeConfig(beam_size=3, ctc_weight=ctc_w, lm_weight=lm_w,
                        pre_beam_k=6, nbest=3, coverage_penalty=cov)
    enc, enc_lens, ctc_logp = _enc_and_logp(model, rng)
    bsd = BeamSearchDecoder(model, dcfg, lm=lm)
    max_len = 6
    out = bsd.search_arrays(enc, enc_lens, ctc_logp, max_len)

    for b in range(enc.shape[0]):
        # oracle works on the valid (unpadded) encoder region
        T_b = int(enc_lens[b])
        # device pads enc to bucket T; oracle gets the same padded arrays so
        # CTC pad-frame handling matches (blank-certain pad frames)
        att_step, lm_step = _oracle_steps(model, np.asarray(enc[b]), T_b, lm,
                                          max_len=max_len)
        ref = beam_search_oracle(
            att_step, np.asarray(ctc_logp[b]), T_b,
            vocab_size=cfg.model.vocab_size,
            beam_size=3, ctc_weight=ctc_w, lm_step=lm_step, lm_weight=lm_w,
            coverage_penalty=cov, max_len=max_len, pre_beam_k=6, nbest=3,
        )
        got = _device_nbest(out, b, len(ref))
        for (rt, rs), (gt, gs) in zip(ref, got):
            assert rt == gt, (b, ref, got)
            assert abs(rs - gs) < 1e-3, (b, rs, gs)


def test_beam_size_one_attention_only_is_greedy(rng):
    """beam=1, ctc_w=0 must equal stepwise argmax attention decoding."""
    model, cfg = _tiny_model()
    dcfg = DecodeConfig(beam_size=1, ctc_weight=0.0, pre_beam_k=8, nbest=1)
    enc, enc_lens, ctc_logp = _enc_and_logp(model, rng, B=1)
    bsd = BeamSearchDecoder(model, dcfg)
    max_len = 5
    out = bsd.search_arrays(enc, enc_lens, ctc_logp, max_len)
    got = _device_nbest(out, 0, 1)[0][0]

    # manual greedy attention decode
    T = enc.shape[1]
    keys = model.decoder.precompute(enc)
    mask = jnp.arange(T)[None, :] < enc_lens[:, None]
    state = model.decoder.init_state(1, T, max_len)
    tok = jnp.asarray([SOS_EOS_ID], dtype=jnp.int32)
    expected = []
    for _ in range(max_len):
        logp, state, _ = model.decoder.step(tok, state, keys, enc, mask)
        lp = np.array(logp[0])
        lp[0] = -1e30  # blank never emitted
        nxt = int(np.argmax(lp))
        if nxt == SOS_EOS_ID:
            break
        expected.append(nxt)
        tok = jnp.asarray([nxt], dtype=jnp.int32)
    assert got == expected


def test_ctc_prefix_scorer_matches_ctc_forward(rng):
    """Oracle prefix scorer final score == CTC log-likelihood (both impls
    already cross-checked; this pins the test in the suite)."""
    T, V = 10, 6
    logits = rng.standard_normal((T, V)).astype(np.float32)
    logp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    for labels in ([2, 3], [2, 2], [4, 5, 4]):
        sc = CtcPrefixScorerNp(logp, T)
        state = sc.initial_state()
        last = None
        for c in labels:
            _, state = sc.score(last, state, c)
            last = c
        full = sc.final_score(state)
        ll = -float(ctc_loss_xla(
            jnp.asarray(logits)[None], jnp.asarray([T]),
            jnp.asarray([labels], dtype=jnp.int32),
            jnp.asarray([len(labels)]))[0])
        assert abs(full - ll) < 1e-4


def test_beam_nbest_sorted_and_finished(rng):
    model, cfg = _tiny_model()
    dcfg = DecodeConfig(beam_size=4, ctc_weight=0.3, pre_beam_k=6, nbest=4)
    enc, enc_lens, ctc_logp = _enc_and_logp(model, rng)
    bsd = BeamSearchDecoder(model, dcfg)
    out = bsd.search_arrays(enc, enc_lens, ctc_logp, 8)
    scores = np.asarray(out["scores"])
    assert (np.diff(scores, axis=1) <= 1e-6).all()
    lens = np.asarray(out["lengths"])
    assert (lens <= 8).all() and (lens > 0).any()
    # finished hyps (if any) keep frozen finite scores
    fin = np.asarray(out["finished"])
    assert np.isfinite(scores[fin]).all() if fin.any() else True


@pytest.mark.parametrize("dp,tp", [
    (8, 1), pytest.param(4, 2, marks=pytest.mark.slow)])  # TP variant ~18s
def test_mesh_decode_matches_single_device(dp, tp, rng):
    """Mesh-aware decode (r2 VERDICT missing item 4): BeamSearchDecoder
    over a ('data','model') mesh — batch DP-sharded, encoder TP-sharded —
    must reproduce the single-device N-best. dp=8/tp=1 is token-exact
    (rows never cross devices); dp=4/tp=2 allows reduction-order noise in
    scores but the same transcripts."""
    from pytorch_end2end_speech_recognition_tpu.data.dataset import Batch
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        CharTokenizer,
    )
    from pytorch_end2end_speech_recognition_tpu.parallel.mesh import make_mesh

    model, cfg = _tiny_model()
    tok = CharTokenizer(charset="ABCDEF")
    assert tok.vocab_size == cfg.model.vocab_size
    B, Ts = 8, 4800
    audio = (rng.standard_normal((B, Ts)) * 0.1).astype(np.float32)
    audio_lens = np.asarray(
        [Ts, Ts // 2, Ts, Ts // 4, Ts, Ts // 2, Ts, Ts], np.int32)
    batch = Batch(audio=audio, audio_lens=audio_lens,
                  tokens=np.zeros((B, 4), np.int32),
                  token_lens=np.zeros((B,), np.int32),
                  ids=[f"u{i}" for i in range(B)],
                  texts=[""] * B)
    dcfg = DecodeConfig(beam_size=4, pre_beam_k=6, ctc_weight=0.3, nbest=2)

    ref = BeamSearchDecoder(model, dcfg).decode_batch(batch, tok)
    got = BeamSearchDecoder(model, dcfg,
                            mesh=make_mesh(dp=dp, tp=tp)).decode_batch(
                                batch, tok)
    for r, g in zip(ref, got):
        assert [h["text"] for h in r] == [h["text"] for h in g]
        if tp == 1:
            assert [h["tokens"] for h in r] == [h["tokens"] for h in g]
        for hr, hg in zip(r, g):
            np.testing.assert_allclose(hr["score"], hg["score"],
                                       rtol=0, atol=2e-3)
