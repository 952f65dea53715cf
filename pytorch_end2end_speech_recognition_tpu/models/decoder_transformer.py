"""Transformer attention decoder (Speech-Transformer / ESPnet-style).

Capability parity: the reference genre pairs its Transformer/Conformer
encoders (configs 3-4, BASELINE.json:9-10) with a transformer decoder —
token embedding + sinusoidal PE, N blocks of (causal self-attention,
cross-attention over encoder frames, FFN) — as the alternative to the
LSTM location-aware decoder (SURVEY.md §2a "Attention decoder"; genre
anchors: kaituoxu/Speech-Transformer, ESPnet `decoder.py`). TPU-native
design:

- Teacher-forced training is ONE fully-parallel pass over all label
  positions — pure MXU batched matmuls, no scan. This is the decoder's
  structural advantage over the LSTM speller on TPU.
- It exposes the SAME `precompute` / `init_state` / `step` interface as
  `AttentionDecoder`, so the on-device joint beam search (decode/beam.py)
  drives both without branching: incremental decoding keeps per-layer
  self-attention K/V caches as fixed-shape arrays in the beam-state dict
  (beam-reorder friendly — gathered on axis 0), each step is one
  dynamic_update_slice + masked attention over the cache.
- Cross-attention K/V are precomputed once per utterance (`precompute`),
  mirroring `LocationAwareAttention.precompute`.
- The last block's head-averaged cross-attention weights are returned as
  the step's alignment row, so coverage penalty and attention heatmap
  logging work identically to the LSTM decoder.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.data.tokenizer import SOS_EOS_ID
from pytorch_end2end_speech_recognition_tpu.models.encoders import (
    dropout,
    sinusoidal_pe,
)
from pytorch_end2end_speech_recognition_tpu.utils.config import ModelConfig

NEG_INF = -1e30


def _dt(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


def mha(q, k, v, mask, heads):
    """Multi-head attention returning (out (B,Tq,D), weights (B,H,Tq,Tk)).

    All in float32 (softmax numerics); callers cast projections. `mask`
    broadcasts to (B, H, Tq, Tk). Weights are returned because the decode
    loop needs the alignment row (coverage penalty / heatmaps) — XLA DCEs
    them when unused.
    """
    B, Tq, D = q.shape
    Tk = k.shape[1]
    dh = D // heads
    qh = q.reshape(B, Tq, heads, dh).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Tk, heads, dh).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tk, heads, dh).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / np.sqrt(dh)
    s = jnp.where(mask, s, NEG_INF)
    w = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", w, vh,
                     preferred_element_type=jnp.float32)
    return out.transpose(0, 2, 1, 3).reshape(B, Tq, D), w


class TransformerDecoderBlock(nnx.Module):
    """Pre-LN block: causal self-attn -> cross-attn(enc) -> FFN.

    Split into `self_qkv` / `cross_kv` / `run` so the parallel
    (teacher-forced) and incremental (KV-cache) paths share every matmul
    and mask rule — the equivalence test pins them together.
    """

    def __init__(self, d_enc: int, cfg: ModelConfig, rngs: nnx.Rngs):
        D = cfg.decoder_dim
        F = cfg.decoder_ffn_dim if cfg.decoder_ffn_dim > 0 else 4 * D
        dt = _dt(cfg)
        self.heads = cfg.decoder_heads
        self.rate = cfg.decoder_dropout
        self.ln1 = nnx.LayerNorm(D, rngs=rngs)
        self.wq1 = nnx.Linear(D, D, dtype=dt, rngs=rngs)
        self.wk1 = nnx.Linear(D, D, dtype=dt, rngs=rngs)
        self.wv1 = nnx.Linear(D, D, dtype=dt, rngs=rngs)
        self.wo1 = nnx.Linear(D, D, dtype=dt, rngs=rngs)
        self.ln2 = nnx.LayerNorm(D, rngs=rngs)
        self.wq2 = nnx.Linear(D, D, dtype=dt, rngs=rngs)
        self.wk2 = nnx.Linear(d_enc, D, dtype=dt, rngs=rngs)
        self.wv2 = nnx.Linear(d_enc, D, dtype=dt, rngs=rngs)
        self.wo2 = nnx.Linear(D, D, dtype=dt, rngs=rngs)
        self.ln3 = nnx.LayerNorm(D, rngs=rngs)
        self.fc1 = nnx.Linear(D, F, dtype=dt, rngs=rngs)
        self.fc2 = nnx.Linear(F, D, dtype=dt, rngs=rngs)

    def self_qkv(self, x):
        """x (B,Tq,D) f32 -> q,k,v (B,Tq,D) f32 from the pre-LN input."""
        h = self.ln1(x)
        return (
            self.wq1(h).astype(jnp.float32),
            self.wk1(h).astype(jnp.float32),
            self.wv1(h).astype(jnp.float32),
        )

    def cross_kv(self, enc):
        """enc (B,T,d_enc) -> (k, v) each (B,T,D) f32; once per utterance."""
        return (
            self.wk2(enc).astype(jnp.float32),
            self.wv2(enc).astype(jnp.float32),
        )

    def run(self, x, q, k, v, self_mask, ck, cv, cross_mask,
            train=False, rng=None):
        """Residual body given attention inputs -> (x, cross_weights)."""
        y, _ = mha(q, k, v, self_mask, self.heads)
        x = x + dropout(self.wo1(y).astype(jnp.float32), self.rate, rng,
                        train, salt=0)
        q2 = self.wq2(self.ln2(x)).astype(jnp.float32)
        y2, w = mha(q2, ck, cv, cross_mask, self.heads)
        x = x + dropout(self.wo2(y2).astype(jnp.float32), self.rate, rng,
                        train, salt=1)
        f = self.fc2(jax.nn.relu(self.fc1(self.ln3(x)))).astype(jnp.float32)
        x = x + dropout(f, self.rate, rng, train, salt=2)
        return x, w


class TransformerDecoder(nnx.Module):
    """Transformer decoder with the AttentionDecoder-compatible interface."""

    def __init__(self, d_enc: int, cfg: ModelConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        V, D = cfg.vocab_size, cfg.decoder_dim
        self.embed = nnx.Embed(V, D, rngs=rngs)
        self.blocks = nnx.List(
            [TransformerDecoderBlock(d_enc, cfg, rngs)
             for _ in range(cfg.decoder_layers)]
        )
        self.ln_out = nnx.LayerNorm(D, rngs=rngs)
        self.proj = nnx.Linear(D, V, dtype=_dt(cfg), rngs=rngs)
        self.d_enc = d_enc

    def _embed_scaled(self, tokens):
        D = self.cfg.decoder_dim
        return self.embed(tokens).astype(jnp.float32) * np.sqrt(D)

    def _logits(self, x):
        return self.proj(self.ln_out(x)).astype(jnp.float32)

    # ---- beam-search interface (decode/beam.py) --------------------------
    def precompute(self, enc: jnp.ndarray) -> jnp.ndarray:
        """(B,T,d_enc) -> packed per-layer cross K/V (B,T,L,2,D)."""
        kvs = [jnp.stack(blk.cross_kv(enc), axis=2) for blk in self.blocks]
        return jnp.stack(kvs, axis=2)

    def init_state(self, B: int, T: int, max_len: int | None = None):
        """Fixed-shape incremental state. `max_len` sizes the K/V caches
        (the beam's decode-step budget); required for this decoder."""
        if max_len is None:
            raise ValueError("TransformerDecoder.init_state needs max_len")
        L, D = len(self.blocks), self.cfg.decoder_dim
        return {
            "k_cache": jnp.zeros((B, max_len, L, D), jnp.float32),
            "v_cache": jnp.zeros((B, max_len, L, D), jnp.float32),
            "pos": jnp.zeros((B,), jnp.int32),
        }

    def step(self, token, state, keys, values, mask, per_row_pos=False):
        """One decode step -> (log_probs (B,V), new_state, attn (B,T)).

        `keys` is the packed cross K/V from `precompute`; `values` (raw
        encoder output) is unused — kept for LSTM-decoder signature parity.

        `per_row_pos=False` (the full-pass beam): every row is at the same
        position, so the K/V cache write is one dynamic-update-slice.
        `per_row_pos=True` (the chunk-synchronized streaming beam, where
        hypotheses may WAIT a chunk and fall out of lockstep): positions,
        PE rows, cache writes and the causal mask are all per-row.
        """
        del values
        B = token.shape[0]
        U = state["k_cache"].shape[1]
        D = self.cfg.decoder_dim
        pe = jnp.asarray(sinusoidal_pe(U, D))
        kc, vc = state["k_cache"], state["v_cache"]
        if per_row_pos:
            pos_v = state["pos"]                               # (B,)
            x = (self._embed_scaled(token) + pe[pos_v])[:, None, :]
            self_mask = (jnp.arange(U)[None, :]
                         <= pos_v[:, None])[:, None, None, :]
            rows = jnp.arange(B)
        else:
            pos = state["pos"][0]  # beams step in lockstep
            x = (self._embed_scaled(token) + pe[pos])[:, None, :]  # (B,1,D)
            self_mask = (jnp.arange(U) <= pos)[None, None, None, :]
        cross_mask = mask[:, None, None, :]
        attn = None
        for li, blk in enumerate(self.blocks):
            q, k_new, v_new = blk.self_qkv(x)
            if per_row_pos:
                kc = kc.at[rows, pos_v, li].set(k_new[:, 0])
                vc = vc.at[rows, pos_v, li].set(v_new[:, 0])
            else:
                kc = kc.at[:, pos, li].set(k_new[:, 0])
                vc = vc.at[:, pos, li].set(v_new[:, 0])
            x, w = blk.run(
                x, q, kc[:, :, li], vc[:, :, li], self_mask,
                keys[:, :, li, 0], keys[:, :, li, 1], cross_mask,
            )
            attn = w.mean(axis=1)[:, 0]  # (B, T) — last block wins
        logp = jax.nn.log_softmax(self._logits(x)[:, 0], axis=-1)
        new_state = {
            "k_cache": kc,
            "v_cache": vc,
            "pos": state["pos"] + 1,
        }
        return logp, new_state, attn

    # ---- teacher-forced training forward ---------------------------------
    def __call__(
        self,
        enc: jnp.ndarray,          # (B, T, d_enc)
        enc_lens: jnp.ndarray,     # (B,)
        tokens: jnp.ndarray,       # (B, U) gold labels, 0-padded
        token_lens: jnp.ndarray,   # (B,)
        train: bool = False,
        scheduled_sampling: float = 0.0,  # accepted, N/A (parallel decoder)
        rng: jax.Array | None = None,
        return_attn: bool = False,
    ):
        """Log-probs (B, U+1, V) for targets [tokens, eos], one parallel
        pass (inputs [sos, tokens], causal self-attention). Scheduled
        sampling is an RNN-speller technique and is a no-op here — the
        genre trains transformer decoders with plain teacher forcing."""
        del token_lens, scheduled_sampling
        B, T, _ = enc.shape
        U1 = tokens.shape[1] + 1
        sos = jnp.full((B, 1), SOS_EOS_ID, jnp.int32)
        inputs = jnp.concatenate([sos, tokens], axis=1)        # (B, U+1)
        D = self.cfg.decoder_dim
        x = self._embed_scaled(inputs) + jnp.asarray(sinusoidal_pe(U1, D))
        x = dropout(x, self.cfg.decoder_dropout, rng, train, salt=777)
        self_mask = jnp.tril(jnp.ones((U1, U1), bool))[None, None]
        cross_mask = (
            jnp.arange(T)[None, :] < enc_lens[:, None]
        )[:, None, None, :]
        w = None
        for li, blk in enumerate(self.blocks):
            k = jax.random.fold_in(rng, li) if rng is not None else None
            q, sk, sv = blk.self_qkv(x)
            ck, cv = blk.cross_kv(enc)
            x, w = blk.run(x, q, sk, sv, self_mask, ck, cv, cross_mask,
                           train, k)
        logps = jax.nn.log_softmax(self._logits(x), axis=-1)   # (B,U+1,V)
        if return_attn:
            return logps, w.mean(axis=1)                       # (B,U+1,T)
        return logps
