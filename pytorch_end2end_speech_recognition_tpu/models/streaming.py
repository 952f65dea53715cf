"""Streaming chunked encoding for unbounded audio (BASELINE.json:11
"streaming chunked encode", SURVEY.md §5.7 (a)).

Overlap-carry design: audio arrives in chunks; each encode window is
[left-context tail of already-processed audio | new audio], and outputs are
emitted only for the region past what was already emitted, holding back a
half-overlap margin whose receptive field extends beyond the window. This
is exact for finite-receptive-field stacks (convs) and an approximation for
unbounded ones (attention/BiLSTM) that converges as `overlap_s` grows — the
knob trades latency/compute for boundary fidelity. The reference genre has
no streaming at all; bucketing caps utterances at ~30 s (SURVEY.md §5.7).

All bookkeeping is in absolute sample positions, so emitted output steps
tile the stream exactly once regardless of chunk sizes. Windows are padded
to a fixed set of lengths to bound XLA recompiles.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class StreamState:
    carry: np.ndarray                  # unprocessed/context audio tail
    window_start: int = 0              # absolute sample index of carry[0]
    emitted_upto: int = 0              # absolute sample pos covered by output
    tokens: list = field(default_factory=list)
    last_token: int = 0


class StreamingEncoder:
    """Chunked encode with overlap-carry; one utterance per stream."""

    def __init__(self, model, chunk_s: float = 8.0, overlap_s: float = 2.0):
        self.model = model
        sr = model.cfg.frontend.sample_rate
        hop = model.cfg.frontend.hop_length
        self.sr = sr
        self.hop = hop
        self.chunk = max(int(chunk_s * sr) // hop * hop, 4 * hop)
        self.overlap = max(int(overlap_s * sr) // hop * hop, 2 * hop)
        self._encode = jax.jit(self._encode_impl)
        # samples consumed per encoder output step (probe once)
        probe_len = self.chunk + self.overlap
        flens = model.frontend.frame_lens(jnp.asarray([probe_len]))
        enc_lens = model.encoder(
            jnp.zeros((1, int(flens[0]), model.cfg.frontend.n_mels)), flens
        )[1]
        self.step_samples = hop * max(
            1, int(round(float(flens[0]) / max(int(enc_lens[0]), 1)))
        )

    def _encode_impl(self, audio, lens):
        enc, enc_lens = self.model.encode(audio, lens, train=False)
        logits = self.model.ctc_logits(enc)
        return enc, logits, enc_lens

    def init_stream(self) -> StreamState:
        return StreamState(carry=np.zeros((0,), np.float32))

    def _run_window(self, window: np.ndarray):
        """Encode one window, padding its length to a bucket size."""
        L = len(window)
        bucket = self.chunk + self.overlap
        pad_to = max(bucket, ((L + bucket - 1) // bucket) * bucket)
        a = np.zeros((1, pad_to), np.float32)
        a[0, :L] = window
        enc, logits, enc_lens = self._encode(
            jnp.asarray(a), jnp.asarray([L], jnp.int32)
        )
        n = int(enc_lens[0])
        return np.asarray(enc[0, :n]), np.asarray(logits[0, :n])

    def process(
        self, state: StreamState, chunk: np.ndarray, final: bool = False
    ) -> tuple[StreamState, np.ndarray, np.ndarray]:
        """Feed one audio chunk -> (state, new enc frames, new ctc logits)."""
        audio = np.concatenate([state.carry, np.asarray(chunk, np.float32)])
        window_len = self.chunk + self.overlap
        empty = (np.zeros((0, 1), np.float32), np.zeros((0, 1), np.float32))
        if not final and len(audio) < window_len:
            state.carry = audio
            return state, *empty

        outs_e, outs_l = [], []
        while len(audio) >= window_len or (final and len(audio) > 0):
            window = audio[:window_len] if not final else audio
            enc_np, log_np = self._run_window(window)
            n = len(enc_np)
            ss = self.step_samples
            # output step j covers absolute samples starting at
            # window_start + j*ss; emit steps past emitted_upto, holding
            # back the trailing half-overlap unless final
            first_j = max(
                0, -(-(state.emitted_upto - state.window_start) // ss)
            )
            if final and len(audio) <= window_len:
                last_j = n
                audio = np.zeros((0,), np.float32)
            else:
                hold = max(1, (self.overlap // 2) // ss)
                last_j = max(n - hold, first_j)
            if last_j > first_j:
                outs_e.append(enc_np[first_j:last_j])
                outs_l.append(log_np[first_j:last_j])
                state.emitted_upto = state.window_start + last_j * ss
            if len(audio) == 0:
                state.carry = audio
                break
            # slide: keep a half-overlap of context before emitted_upto
            keep_abs = max(state.window_start,
                           state.emitted_upto - self.overlap // 2)
            drop = keep_abs - state.window_start
            audio = audio[drop:]
            state.window_start = keep_abs
            state.carry = audio
            if not final and len(audio) < window_len:
                break
        if outs_e:
            return state, np.concatenate(outs_e), np.concatenate(outs_l)
        return state, *empty


class StreamingBeamTranscriber:
    """Streaming encode with greedy partials and a chunk-final joint
    CTC/attention beam over the accumulated encoder states.

    Rung 5 pairs "streaming chunked encode" with the flagship beam decoder
    (BASELINE.json:11; r3 VERDICT item 9 — StreamingTranscriber was
    greedy-only). Design: the encoder runs the same overlap-carry chunked
    schedule as StreamingTranscriber and every emitted step's encoder
    frame + CTC logits accumulate host-side; low-latency PARTIAL results
    come from online greedy collapse (`partial_text`), and the FINAL
    transcript re-scores the whole accumulated utterance with the on-device
    vectorized joint beam (decode/beam.BeamSearchDecoder) — CTC prefix
    scoring, attention decoder, optional LM fusion, N-best — exactly the
    full-pass decoder run over streamed states. With enough overlap the
    streamed encoder states match the full pass, so the final beam output
    equals full-pass beam decode (pinned by
    tests/test_streaming.py::test_streaming_beam_matches_full_pass).

    Accumulated states are padded to `t_bucket` multiples so the jitted
    beam compiles for a bounded set of shapes.
    """

    def __init__(self, model, tokenizer, decode_cfg=None, lm=None,
                 chunk_s: float = 8.0, overlap_s: float = 2.0,
                 t_bucket: int = 128):
        from pytorch_end2end_speech_recognition_tpu.decode.beam import (
            BeamSearchDecoder,
        )
        from pytorch_end2end_speech_recognition_tpu.utils.config import (
            DecodeConfig,
        )

        self.enc = StreamingEncoder(model, chunk_s, overlap_s)
        self.tokenizer = tokenizer
        self.cfg = decode_cfg or DecodeConfig(mode="beam")
        self.bsd = BeamSearchDecoder(model, self.cfg, lm=lm)
        self.t_bucket = t_bucket

    def init_stream(self):
        return (self.enc.init_stream(), [], [])

    def feed(self, stream, chunk, final: bool = False):
        st, encs, logs = stream
        st, e, logits = self.enc.process(st, chunk, final=final)
        if len(e):
            encs.append(e)
            logs.append(logits)
            path = np.argmax(logits, axis=-1)
            for t in path:  # online greedy partials
                if t != 0 and t != st.last_token:
                    st.tokens.append(int(t))
                st.last_token = int(t)
        return (st, encs, logs)

    def partial_text(self, stream) -> str:
        return self.tokenizer.decode(stream[0].tokens)

    def final_nbest(self, stream) -> list[dict]:
        """Joint-beam decode of the accumulated encoder states."""
        _, encs, logs = stream
        if not encs:
            return []
        enc = np.concatenate(encs)          # (T, D)
        logits = np.concatenate(logs)       # (T, V)
        T = len(enc)
        Tp = -(-T // self.t_bucket) * self.t_bucket
        encp = np.zeros((1, Tp, enc.shape[-1]), np.float32)
        encp[0, :T] = enc
        logp = np.zeros((1, Tp, logits.shape[-1]), np.float32)
        # pad rows are overwritten inside the search (blank-certain) from
        # enc_lens; only rows < T matter
        logp[0, :T] = np.asarray(
            jax.nn.log_softmax(jnp.asarray(logits, jnp.float32)))
        enc_lens = jnp.asarray([T], jnp.int32)
        max_len = max(4, int(self.cfg.max_decode_ratio * Tp))
        min_lens = (enc_lens * self.cfg.min_decode_ratio).astype(jnp.int32)
        out = self.bsd.search_arrays(
            jnp.asarray(encp), enc_lens, jnp.asarray(logp), max_len,
            min_lens)
        tokens = np.asarray(out["tokens"])[0]
        lengths = np.asarray(out["lengths"])[0]
        scores = np.asarray(out["scores"])[0]
        nbest = []
        for k in range(min(self.cfg.nbest, tokens.shape[0])):
            toks = tokens[k, : lengths[k]].tolist()
            nbest.append({"text": self.tokenizer.decode(toks),
                          "tokens": toks, "score": float(scores[k])})
        return nbest

    def transcribe_stream(self, chunks) -> str:
        stream = self.init_stream()
        chunks = list(chunks)
        for i, c in enumerate(chunks):
            stream = self.feed(stream, c, final=(i == len(chunks) - 1))
        nbest = self.final_nbest(stream)
        return nbest[0]["text"] if nbest else ""


class StreamingTranscriber:
    """Online greedy-CTC transcription over a StreamingEncoder."""

    def __init__(self, model, tokenizer, chunk_s: float = 8.0,
                 overlap_s: float = 2.0):
        self.enc = StreamingEncoder(model, chunk_s, overlap_s)
        self.tokenizer = tokenizer

    def feed(self, state: StreamState, chunk, final: bool = False):
        state, _, logits = self.enc.process(state, chunk, final=final)
        if len(logits):
            path = np.argmax(logits, axis=-1)
            for t in path:
                if t != 0 and t != state.last_token:
                    state.tokens.append(int(t))
                state.last_token = int(t)
        return state

    def transcribe_stream(self, chunks) -> str:
        """Consume an iterable of audio chunks; return the final text."""
        state = self.enc.init_stream()
        chunks = list(chunks)
        for i, c in enumerate(chunks):
            state = self.feed(state, c, final=(i == len(chunks) - 1))
        return self.tokenizer.decode(state.tokens)
