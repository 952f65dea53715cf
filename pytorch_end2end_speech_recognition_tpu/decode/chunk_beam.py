"""Chunk-synchronized joint CTC/attention beam search with bounded state.

r4's StreamingBeamTranscriber accumulated EVERY encoder frame + logit row
host-side and ran one full-utterance beam at stream end: O(T) memory, a new
compiled beam per t_bucket multiple, and final latency linear in stream
length (r4 VERDICT missing item 2). This module replaces that design with a
block-synchronous beam (the TPU-native take on blockwise-synchronous beam
search for streaming encoders): the beam ADVANCES once per fixed-size chunk
of encoder frames, and everything carried across chunks is O(1) in stream
length:

- hypothesis arrays (tokens/lengths/scores) bounded by `max_tokens`,
- a sliding right-aligned window of the last `window_frames` encoder
  frames for the attention decoder (+ the location-attention history,
  shifted in lockstep with the window),
- per-hypothesis CTC lattice columns (r_n, r_b) over that SAME window —
  the prefix-score frame scan is resumable, so each chunk extends every
  carried hypothesis's lattice across the new frames, and candidate
  extensions are scored with emission anywhere in the window, chaining
  exactly through the column carried from before the window. Scoring
  over the window (not just the new chunk) matters: when the beam WAITS
  a chunk because the attention decoder wants more right-context, the
  token's acoustic mass from the waited-through frames is still counted
  when the extension is finally taken,
- the windowed CTC log-probs, and decoder/LM incremental state (per-row
  positions: hypotheses fall out of lockstep once they can wait).

Within a chunk, beam steps run in a `lax.while_loop`. Each live hypothesis
offers Pk token extensions plus one WAIT slot advertised at
`total + wait_threshold`: an extension is taken only when its joint score
beats waiting, i.e. when the chunk actually contains acoustic evidence for
the token (a token absent from the chunk scores far below the threshold;
a present one far above). All scores for a fixed prefix are constant
within a chunk, so a hypothesis that waits once is SETTLED for the rest of
the chunk — the loop exits when every hypothesis is settled (or, on the
final chunk, finished: the wait slot becomes the EOS slot with the exact
full-utterance CTC end mass from the carried lattice).

Approximations vs the full-pass beam (all vanish on the equivalence test
where one window covers the utterance and the model is peaky):
- a token must be emitted (in the CTC lattice sense) within the sliding
  window at the time the beam hypothesizes it; emission mass outside the
  window is dropped. The beam hypothesizes tokens near their mass, so
  for peaky CTC models and windows of several seconds this is negligible.
- the attention decoder sees the sliding window, not all frames
  (monotonic ASR attention looks at recent frames; `window_frames` is the
  fidelity knob, exactly like StreamingEncoder.overlap_s).
- a hypothesis kept via WAIT can re-derive an extension next chunk that
  already exists in the beam (a duplicate occupying one slot with a
  strictly lower score). The vectorized beam has no dedup, matching
  decode/beam.py.

Genre parity: the reference genre has no streaming decode at all
(SURVEY.md §5.7); rung 5 (BASELINE.json:11) pairs streaming encode with
the flagship joint beam.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
    BLANK_ID,
    SOS_EOS_ID,
)
from pytorch_end2end_speech_recognition_tpu.decode.beam import (
    NEG_INF,
    _tile_beam,
    log_add,
)
from pytorch_end2end_speech_recognition_tpu.utils.config import DecodeConfig


class ChunkBeamDecoder:
    """Streaming joint beam over fixed-size encoder-frame chunks.

    Usage:
        cb = ChunkBeamDecoder(model, decode_cfg, lm=lm)
        carry = cb.init(B=1)
        for each chunk of `chunk_frames` encoder frames:
            carry, beam = cb.feed(carry, enc_c, logp_c, chunk_len,
                                  final=..., min_tokens=...)
        # `beam` holds the current (tokens, lengths, scores) arrays:
        # partials mid-stream, the final N-best after the final chunk.

    One jitted program serves every chunk including the final one
    (`final` is traced), so the compile set is exactly one shape.
    """

    def __init__(self, model, cfg: DecodeConfig, lm=None,
                 chunk_frames: int = 64, window_frames: int = 256,
                 steps_per_chunk: int = 16, max_tokens: int = 256,
                 wait_threshold: float = -2.5,
                 final_margin: float = 25.0):
        assert window_frames >= chunk_frames > 0
        self.cfg = cfg
        self.C = int(chunk_frames)
        self.W = int(window_frames)
        self.S = int(steps_per_chunk)
        self.U = int(max_tokens)
        self.tau = float(wait_threshold)
        # ESPnet-style end detection on the FINAL chunk: once some
        # hypothesis has taken EOS and leads every live one by this many
        # log units, further extensions cannot recover — stop instead of
        # grinding out up to max_tokens steps (the no-EOS junk-audio
        # worst case was 2.3 s/stream in r5_streaming.json). Large enough
        # to never trigger on the overfit-model equivalence tests.
        self.final_margin = float(final_margin)
        self.model_split = nnx.split(model)
        self.lm_split = nnx.split(lm) if lm is not None else None
        from pytorch_end2end_speech_recognition_tpu.models.decoder_transformer import (  # noqa: E501
            TransformerDecoder,
        )
        from pytorch_end2end_speech_recognition_tpu.models.lm import (
            TransformerLm,
        )

        self._dec_per_row = isinstance(model.decoder, TransformerDecoder)
        self._lm_per_row = isinstance(lm, TransformerLm)
        self._d_enc = model.decoder.d_enc
        self._vocab = int(model.cfg.model.vocab_size)
        self._compiled = lru_cache(maxsize=8)(self._build)

    # ------------------------------------------------------------------ init
    def init(self, B: int = 1):
        """Device carry for B parallel streams."""
        K, W, U = self.cfg.beam_size, self.W, self.U
        graphdef, state = self.model_split
        model = nnx.merge(graphdef, state)
        # U+1 like the LM cache below: a hypothesis AT the U-token cap is
        # still stepped for EOS scoring with pos == U — a U-sized
        # transformer KV cache would clamp its PE row and silently drop
        # the cache write, corrupting the final-chunk EOS score
        dec_state = model.decoder.init_state(B * K, W, U + 1)
        lm_state = None
        if self.lm_split is not None:
            lm = nnx.merge(*self.lm_split)
            lm_state = lm.init_state(B * K, U + 1)
        neg = jnp.full((B, K), NEG_INF)
        # Pre-stream window slots behave as an infinite blank-certain
        # prehistory: lattice columns (r_n=-inf, r_b=0) pass through the
        # blank recursion unchanged and reproduce decode/beam.py's
        # cumsum-of-blanks empty-prefix init exactly; the matching lp_win
        # rows are blank-certain so candidate emission there is impossible.
        r0 = jnp.stack(
            [jnp.full((B, K, W), NEG_INF), jnp.zeros((B, K, W))], axis=-1)
        return {
            "enc_win": jnp.zeros((B, W, self._d_enc), jnp.float32),
            "win_valid": jnp.zeros((B, W), bool),
            "tokens": jnp.zeros((B, K, U), jnp.int32),
            "lengths": jnp.zeros((B, K), jnp.int32),
            "last": jnp.full((B, K), SOS_EOS_ID, jnp.int32),
            "att_cum": jnp.zeros((B, K)),
            "lm_cum": jnp.zeros((B, K)),
            "total": jnp.where(jnp.arange(K)[None, :] == 0, 0.0, neg),
            "finished": jnp.zeros((B, K), bool),
            "coverage": jnp.zeros((B, K)),
            "cum_attn": jnp.zeros((B, K, W)),
            "r_win": r0,
            "r_prevcol": jnp.stack(
                [jnp.full((B, K), NEG_INF), jnp.zeros((B, K))], axis=-1),
            "lp_win": jnp.broadcast_to(
                jnp.full((self._vocab,), NEG_INF).at[BLANK_ID].set(0.0),
                (B, W, self._vocab)).astype(jnp.float32),
            "dec_state": dec_state,
            "lm_state": lm_state,
        }

    # ------------------------------------------------------------------ feed
    def feed(self, carry, enc_chunk, ctc_logp_chunk, chunk_len,
             final=False, min_tokens=None):
        """Advance the beam over one chunk.

        enc_chunk: (B, C, d_enc); ctc_logp_chunk: (B, C, V) log-softmax;
        chunk_len: (B,) valid frames (C except possibly the final chunk).
        Returns (carry, beam_dict) where beam_dict holds 'tokens'
        (B, K, U), 'lengths', 'scores', 'finished' — score-sorted.
        """
        B = enc_chunk.shape[0]
        V = ctc_logp_chunk.shape[-1]
        if min_tokens is None:
            min_tokens = jnp.zeros((B,), jnp.int32)
        fn = self._compiled(B, V)
        return fn(carry, enc_chunk, ctc_logp_chunk,
                  jnp.asarray(chunk_len, jnp.int32),
                  jnp.asarray(final, bool),
                  jnp.asarray(min_tokens, jnp.int32))

    # ----------------------------------------------------------------- build
    def _build(self, B: int, V: int):
        cfg = self.cfg
        K, Pk = cfg.beam_size, min(cfg.pre_beam_k, V - 2)
        C, W, U = self.C, self.W, self.U
        graphdef, mstate = self.model_split
        lm_split = self.lm_split
        ctc_w, lm_w = cfg.ctc_weight, cfg.lm_weight
        lp_pen = cfg.length_penalty
        cov_pen, cov_tau = cfg.coverage_penalty, cfg.coverage_tau
        tau = self.tau
        dec_kw = {"per_row_pos": True} if self._dec_per_row else {}
        lm_kw = {"per_row_pos": True} if self._lm_per_row else {}

        def feed(carry, enc_c, logp_c, chunk_len, is_final, min_tokens):
            model = nnx.merge(graphdef, mstate)
            lm = nnx.merge(*lm_split) if lm_split is not None else None

            # ---- pad rows of the chunk: blank certain, labels impossible
            t_idx = jnp.arange(C)[None, :, None]
            pad = t_idx >= chunk_len[:, None, None]
            blank_row = jnp.full((V,), NEG_INF).at[BLANK_ID].set(0.0)
            lp = jnp.where(pad, blank_row[None, None, :], logp_c)  # (B,C,V)
            lp_blank = lp[:, :, BLANK_ID]                          # (B,C)

            # ---- slide the window left by C (always — validity mask
            # handles the not-yet-full case; right-aligned by construction)
            enc_win = jnp.concatenate(
                [carry["enc_win"], enc_c.astype(jnp.float32)], axis=1
            )[:, C:]
            win_valid = jnp.concatenate(
                [carry["win_valid"],
                 jnp.arange(C)[None, :] < chunk_len[:, None]], axis=1
            )[:, C:]
            cum_attn = jnp.concatenate(
                [carry["cum_attn"], jnp.zeros((B, K, C))], axis=2)[:, :, C:]
            dec_state = carry["dec_state"]
            if isinstance(dec_state, dict) and "attn" in dec_state:
                # location-attention history slides with the window
                dec_state = dict(dec_state)
                dec_state["attn"] = jnp.concatenate(
                    [dec_state["attn"], jnp.zeros((B * K, C))], axis=1
                )[:, C:]

            keys = model.decoder.precompute(enc_win)               # (B,W,..)
            keys_t = _tile_beam(keys, K)
            enc_t = _tile_beam(enc_win, K)
            mask_t = _tile_beam(win_valid, K)

            # ---- slide the windowed CTC log-probs with the frames
            lp_win = jnp.concatenate([carry["lp_win"], lp], axis=1)[:, C:]
            lpw_blank = lp_win[:, :, BLANK_ID]                     # (B,W)

            # ---- extend every carried hypothesis's lattice over the new
            # chunk (within-prefix recursion: stay in n by re-emitting
            # `last`, move n->b / stay in b on blank), chaining from the
            # window-end column; then slide the per-hyp lattice window.
            lp_lastk = jnp.take_along_axis(
                lp[:, None], carry["last"][:, :, None, None]
                .repeat(C, axis=2), axis=3
            )[..., 0]                                              # (B,K,C)
            lp_lastk = jnp.where(
                (carry["lengths"] > 0)[:, :, None], lp_lastk, NEG_INF)

            def lat_step(rc, inp):
                r_n, r_b = rc
                lp_l, lpb = inp                                    # (B,K),(B,)
                n_new = r_n + lp_l
                b_new = log_add(r_b, r_n) + lpb[:, None]
                return (n_new, b_new), jnp.stack([n_new, b_new], -1)

            (_, _), r_seq = jax.lax.scan(
                lat_step,
                (carry["r_win"][:, :, W - 1, 0],
                 carry["r_win"][:, :, W - 1, 1]),
                (lp_lastk.transpose(2, 0, 1), lp_blank.T),
            )
            r_new_frames = r_seq.transpose(1, 2, 0, 3)             # (B,K,C,2)
            # column that is about to shift out becomes the pre-window col
            r_prevcol0 = carry["r_win"][:, :, C - 1]
            r_win0 = jnp.concatenate(
                [carry["r_win"][:, :, C:], r_new_frames], axis=2)  # (B,K,W,2)

            def ctc_prefix_scores(last, r_win, r_prevcol, cand):
                """psi (B,K,Pk) for prefix+cand with emission anywhere in
                the current window, chained through the pre-window column;
                plus the new hypothesis lattice (B,K,Pk,W,2)."""
                lp_c = jnp.take_along_axis(
                    lp_win[:, None], cand[:, :, None, :], axis=3)  # (B,K,W,Pk)
                same = cand == last[:, :, None]                    # (B,K,Pk)
                r_prev = jnp.concatenate(
                    [r_prevcol[:, :, None], r_win[:, :, : W - 1]], axis=2
                )                                                  # (B,K,W,2)
                phi = jnp.where(
                    same[:, :, None, :],
                    r_prev[..., 1:2],
                    log_add(r_prev[..., 1:2], r_prev[..., 0:1]),
                )                                                  # (B,K,W,Pk)

                def step_t(sc, inp):
                    prev_n, prev_b, psi = sc
                    lp_ct, phi_t, lpb_t = inp
                    new_n = log_add(prev_n, phi_t) + lp_ct
                    new_b = log_add(prev_b, prev_n) + lpb_t[:, None, None]
                    psi = log_add(psi, phi_t + lp_ct)
                    return (new_n, new_b, psi), jnp.stack(
                        [new_n, new_b], axis=-1)

                init = tuple(jnp.full((B, K, Pk), NEG_INF)
                             for _ in range(3))
                (_, _, psi), r_new = jax.lax.scan(
                    step_t, init,
                    (lp_c.transpose(2, 0, 1, 3), phi.transpose(2, 0, 1, 3),
                     lpw_blank.T),
                )
                return psi, r_new.transpose(1, 2, 3, 0, 4)

            state0 = {
                "step": jnp.asarray(0),
                "tokens": carry["tokens"],
                "lengths": carry["lengths"],
                "last": carry["last"],
                "att_cum": carry["att_cum"],
                "lm_cum": carry["lm_cum"],
                "total": carry["total"],
                "finished": carry["finished"],
                "settled": jnp.zeros((B, K), bool),
                "coverage": carry["coverage"],
                "cum_attn": cum_attn,
                "r_win": r_win0,
                # lattice column BEFORE the window, per hyp ((-inf,-inf)
                # once a hyp is created mid-stream: no pre-window mass)
                "r_prevcol": r_prevcol0,
                "dec_state": dec_state,
                "lm_state": carry["lm_state"],
            }
            budget = jnp.where(is_final, U, self.S)
            margin = self.final_margin
            # end detection assumes extensions only ADD NEGATIVE log
            # terms; a positive length/coverage penalty lets a live hyp
            # gain score per token and overtake a finished leader, so the
            # early stop is disabled for those configs (static branch)
            end_detect = lp_pen <= 0.0 and cov_pen <= 0.0

            def cond(s):
                row_done = jnp.all(s["finished"] | s["settled"], axis=1)
                if end_detect:
                    # per row: a finished hyp leading every live hyp by
                    # `margin` cannot be overtaken at that gap
                    best_fin = jnp.max(
                        jnp.where(s["finished"], s["total"], NEG_INF),
                        axis=1)
                    best_live = jnp.max(
                        jnp.where(~s["finished"], s["total"], NEG_INF),
                        axis=1)
                    row_done = row_done | (
                        is_final & (best_fin > best_live + margin))
                return (s["step"] < budget) & ~jnp.all(row_done)

            def body(s):
                att_logp_flat, stepped_dec, attn_flat = model.decoder.step(
                    s["last"].reshape(B * K), s["dec_state"], keys_t,
                    enc_t, mask_t, **dec_kw)
                att_logp = att_logp_flat.reshape(B, K, V)
                if cov_pen != 0.0:
                    new_cum = s["cum_attn"] + attn_flat.reshape(B, K, W)
                    new_cov = jnp.sum(jnp.minimum(new_cum, cov_tau), -1)
                else:
                    new_cum = s["cum_attn"]
                    new_cov = s["coverage"]
                if lm is not None:
                    lm_logp_flat, stepped_lm = lm.step(
                        s["last"].reshape(B * K), s["lm_state"], **lm_kw)
                    lm_logp = lm_logp_flat.reshape(B, K, V)
                else:
                    lm_logp = jnp.zeros((B, K, V))
                    stepped_lm = None

                pre = (1.0 - ctc_w) * att_logp + lm_w * lm_logp
                pre = pre.at[:, :, BLANK_ID].set(NEG_INF)
                pre = pre.at[:, :, SOS_EOS_ID].set(NEG_INF)
                _, cand = jax.lax.top_k(pre, Pk)                   # (B,K,Pk)

                if ctc_w > 0:
                    psi, r_new = ctc_prefix_scores(
                        s["last"], s["r_win"], s["r_prevcol"], cand)
                else:
                    psi = jnp.zeros((B, K, Pk))
                    r_new = jnp.zeros((B, K, Pk, W, 2))

                att_c = jnp.take_along_axis(att_logp, cand, axis=2)
                lm_c = jnp.take_along_axis(lm_logp, cand, axis=2)
                new_att_cum = s["att_cum"][:, :, None] + att_c
                new_lm_cum = s["lm_cum"][:, :, None] + lm_c
                ext_total = (
                    (1.0 - ctc_w) * new_att_cum + ctc_w * psi
                    + lm_w * new_lm_cum
                    + lp_pen * (s["lengths"] + 1)[:, :, None]
                    + cov_pen * new_cov[:, :, None]
                )
                live = (~s["finished"] & ~s["settled"]
                        & (s["total"] > NEG_INF / 2)
                        & (s["lengths"] < U))
                ext_total = jnp.where(live[:, :, None], ext_total, NEG_INF)

                # ---- slot Pk: WAIT mid-stream, EOS on the final chunk.
                # ctc end mass = full-utterance lattice total at the last
                # valid frame (blank-certain pad rows preserve it).
                alive = ~s["finished"] & (s["total"] > NEG_INF / 2)
                ctc_eos = log_add(s["r_win"][:, :, W - 1, 0],
                                  s["r_win"][:, :, W - 1, 1]) \
                    if ctc_w > 0 else jnp.zeros((B, K))
                eos_total = (
                    (1.0 - ctc_w) * (s["att_cum"]
                                     + att_logp[:, :, SOS_EOS_ID])
                    + ctc_w * ctc_eos
                    + lm_w * (s["lm_cum"] + lm_logp[:, :, SOS_EOS_ID])
                    + lp_pen * s["lengths"] + cov_pen * new_cov
                )
                eos_ok = s["lengths"] >= min_tokens[:, None]
                eos_total = jnp.where(alive & eos_ok, eos_total, NEG_INF)
                keep_final = jnp.where(s["finished"], s["total"], eos_total)
                wait_true = jnp.where(alive, s["total"], NEG_INF)
                slot_true = jnp.where(is_final, keep_final, wait_true)
                # waiting is advertised tau below the true score so an
                # extension with real acoustic evidence in this chunk
                # outbids it; the STORED total of a selected wait is the
                # true, un-penalized one.
                slot_adv = jnp.where(is_final, slot_true, wait_true + tau)

                all_adv = jnp.concatenate(
                    [ext_total, slot_adv[:, :, None]], axis=2
                ).reshape(B, K * (Pk + 1))
                all_true = jnp.concatenate(
                    [ext_total, slot_true[:, :, None]], axis=2
                ).reshape(B, K * (Pk + 1))
                _, top_idx = jax.lax.top_k(all_adv, K)             # (B,K)
                new_total = jnp.take_along_axis(all_true, top_idx, axis=1)
                parent = top_idx // (Pk + 1)
                slot = top_idx % (Pk + 1)
                is_ext = slot < Pk
                slot_c = jnp.minimum(slot, Pk - 1)

                def g2(x):
                    return jnp.take_along_axis(
                        x, parent.reshape(
                            parent.shape + (1,) * (x.ndim - 2)), axis=1)

                tok_ext = jnp.take_along_axis(
                    g2(cand), slot_c[:, :, None], axis=2)[:, :, 0]
                p_tokens = g2(s["tokens"])
                p_lengths = g2(s["lengths"])
                new_tokens = jnp.where(
                    is_ext[:, :, None]
                    & (jnp.arange(U)[None, None, :]
                       == p_lengths[:, :, None]),
                    tok_ext[:, :, None], p_tokens)
                new_lengths = p_lengths + is_ext.astype(jnp.int32)
                r_sel = jnp.take_along_axis(
                    g2(r_new), slot_c[:, :, None, None, None], axis=2
                )[:, :, 0]
                att_sel = jnp.take_along_axis(
                    g2(new_att_cum), slot_c[:, :, None], axis=2)[:, :, 0]
                lm_sel = jnp.take_along_axis(
                    g2(new_lm_cum), slot_c[:, :, None], axis=2)[:, :, 0]
                was_finished = g2(s["finished"])
                was_settled = g2(s["settled"])

                flat_parent = (
                    jnp.arange(B)[:, None] * K + parent).reshape(B * K)
                is_ext_flat = is_ext.reshape(B * K)

                def sel_state(stepped, old):
                    def pick(n, o):
                        m = is_ext_flat.reshape(
                            (B * K,) + (1,) * (n.ndim - 1))
                        return jnp.where(m, jnp.take(n, flat_parent, 0),
                                         jnp.take(o, flat_parent, 0))
                    return jax.tree_util.tree_map(pick, stepped, old)

                neg2 = jnp.full((B, K, 2), NEG_INF)
                return {
                    "step": s["step"] + 1,
                    "tokens": new_tokens,
                    "lengths": new_lengths,
                    "last": jnp.where(is_ext, tok_ext, g2(s["last"])),
                    "att_cum": jnp.where(is_ext, att_sel, g2(s["att_cum"])),
                    "lm_cum": jnp.where(is_ext, lm_sel, g2(s["lm_cum"])),
                    "total": new_total,
                    "finished": was_finished | (~is_ext & is_final),
                    # a wait settles the hyp for the rest of the chunk
                    # (its scores cannot change until new frames arrive)
                    "settled": jnp.where(is_ext, False,
                                         was_settled | ~is_final),
                    "coverage": jnp.where(is_ext, g2(new_cov),
                                          g2(s["coverage"])),
                    "cum_attn": jnp.where(is_ext[:, :, None], g2(new_cum),
                                          g2(s["cum_attn"])),
                    "r_win": jnp.where(is_ext[:, :, None, None], r_sel,
                                       g2(s["r_win"])),
                    "r_prevcol": jnp.where(is_ext[:, :, None], neg2,
                                           g2(s["r_prevcol"])),
                    "dec_state": sel_state(stepped_dec, s["dec_state"]),
                    "lm_state": (sel_state(stepped_lm, s["lm_state"])
                                 if stepped_lm is not None else None),
                }

            out = jax.lax.while_loop(cond, body, state0)

            new_carry = {
                "enc_win": enc_win,
                "win_valid": win_valid,
                "tokens": out["tokens"],
                "lengths": out["lengths"],
                "last": out["last"],
                "att_cum": out["att_cum"],
                "lm_cum": out["lm_cum"],
                "total": out["total"],
                "finished": out["finished"],
                "coverage": out["coverage"],
                "cum_attn": out["cum_attn"],
                "r_win": out["r_win"],
                "r_prevcol": out["r_prevcol"],
                "lp_win": lp_win,
                "dec_state": out["dec_state"],
                "lm_state": out["lm_state"],
            }
            order = jnp.argsort(-out["total"], axis=1)
            beam = {
                "tokens": jnp.take_along_axis(
                    out["tokens"], order[:, :, None], axis=1),
                "lengths": jnp.take_along_axis(out["lengths"], order, 1),
                "scores": jnp.take_along_axis(out["total"], order, 1),
                "finished": jnp.take_along_axis(out["finished"], order, 1),
            }
            return new_carry, beam

        return jax.jit(feed)
