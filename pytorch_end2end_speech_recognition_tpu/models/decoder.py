"""Attention decoder: LSTM + location-aware attention (Chorowski-style).

Capability parity: the reference genre's `Speller`/`Decoder` with
`LocationAwareAttention` and teacher forcing w/ scheduled sampling
(SURVEY.md §2a "Attention decoder", BASELINE.json:8). TPU-native design:

- Teacher-forced training runs as ONE `lax.scan` over label steps with the
  (h, c, attention-weights, context) carry — no per-step Python.
- The same `step()` function drives on-device beam search (decode/beam.py):
  state is a flat dict of arrays so beams reorder with one gather.
- Location convolution over previous attention weights is a 1-D conv
  (VPU work), the score projection matmuls are MXU work in cfg.dtype.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.data.tokenizer import SOS_EOS_ID
from pytorch_end2end_speech_recognition_tpu.ops.rnn import lstm_cell
from pytorch_end2end_speech_recognition_tpu.utils.config import ModelConfig

NEG_INF = -1e30


def _dt(cfg: ModelConfig):
    return jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32


class LocationAwareAttention(nnx.Module):
    """score = v^T tanh(W_q q + W_k k + W_f conv1d(prev_attn)), masked softmax.

    Keys are pre-projected once per utterance (`precompute`), so each decode
    step does only a (B, A) query projection + (B, T) conv/score.
    """

    def __init__(self, d_enc: int, d_dec: int, cfg: ModelConfig, rngs: nnx.Rngs):
        A = cfg.attention_dim
        dt = _dt(cfg)
        self.wq = nnx.Linear(d_dec, A, use_bias=False, dtype=dt, rngs=rngs)
        self.wk = nnx.Linear(d_enc, A, use_bias=False, dtype=dt, rngs=rngs)
        self.wf = nnx.Linear(cfg.location_filters, A, use_bias=False, dtype=dt,
                             rngs=rngs)
        self.conv = nnx.Conv(
            1, cfg.location_filters, (cfg.location_kernel,), padding="SAME",
            use_bias=False, dtype=dt, rngs=rngs,
        )
        self.v = nnx.Linear(A, 1, use_bias=False, dtype=dt, rngs=rngs)
        self.bias = nnx.Param(jnp.zeros((A,)))

    def precompute(self, enc: jnp.ndarray) -> jnp.ndarray:
        """(B, T, d_enc) -> projected keys (B, T, A); do once per utterance.
        Kept in the compute dtype: the keys tensor is re-read at EVERY decode
        step, so bf16 halves the dominant per-step HBM traffic; the energy
        sum/tanh below still runs f32."""
        return self.wk(enc)

    def _loc_features(self, prev_attn: jnp.ndarray) -> jnp.ndarray:
        """conv1d(prev_attn) as unfold + matmul. The single-input-channel
        conv_general_dilated picks a T(1,128) layout whose backward costs
        ~2 ms/step inside the scan's while loop; K static shifted slices +
        one (B·T, K)@(K, F) dot keep both directions on friendly layouts."""
        w = self.conv.kernel[...]                      # (K, 1, F)
        K = w.shape[0]
        B, T = prev_attn.shape
        ap = jnp.pad(prev_attn, ((0, 0), ((K - 1) // 2, K // 2)))
        shifts = jnp.stack([ap[:, k: k + T] for k in range(K)], axis=-1)
        return jnp.einsum("btk,kof->btf", shifts, w.astype(prev_attn.dtype))

    def __call__(
        self,
        query: jnp.ndarray,      # (B, d_dec)
        keys: jnp.ndarray,       # (B, T, A) — precomputed
        values: jnp.ndarray,     # (B, T, d_enc)
        prev_attn: jnp.ndarray,  # (B, T)
        mask: jnp.ndarray,       # (B, T) bool
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        dt = self.v.kernel[...].dtype
        loc = self._loc_features(prev_attn.astype(dt))             # (B, T, F)
        s = jnp.tanh(
            keys.astype(jnp.float32)
            + self.wq(query).astype(jnp.float32)[:, None, :]
            + self.wf(loc).astype(jnp.float32)
            + self.bias[...]
        )
        e = self.v(s.astype(dt)).astype(jnp.float32)[..., 0]
        e = jnp.where(mask, e, NEG_INF)
        attn = jax.nn.softmax(e, axis=-1)
        context = jnp.einsum(
            "bt,btd->bd", attn, values, preferred_element_type=jnp.float32
        )
        return context, attn


class AttentionDecoder(nnx.Module):
    """LSTM decoder over label steps with location-aware attention."""

    def __init__(self, d_enc: int, cfg: ModelConfig, rngs: nnx.Rngs):
        self.cfg = cfg
        V, E, H = cfg.vocab_size, cfg.embed_dim, cfg.decoder_dim
        dt = _dt(cfg)
        self.embed = nnx.Embed(V, E, rngs=rngs)
        self.att = LocationAwareAttention(d_enc, H, cfg, rngs)
        self.cells = nnx.List([])
        d_in = E + d_enc
        for _ in range(cfg.decoder_layers):
            self.cells.append(
                nnx.Linear(d_in + H, 4 * H, dtype=dt, rngs=rngs)
            )
            d_in = H
        self.proj = nnx.Linear(H + d_enc, V, dtype=dt, rngs=rngs)
        self.d_enc = d_enc

    # ---- state management (flat dict of arrays: beam-reorder friendly) ----
    def precompute(self, enc: jnp.ndarray) -> jnp.ndarray:
        """Per-utterance key projection (shared beam-search interface with
        TransformerDecoder.precompute)."""
        return self.att.precompute(enc)

    def init_state(
        self, B: int, T: int, max_len: int | None = None
    ) -> dict[str, jnp.ndarray]:
        del max_len  # recurrent state is O(1) in decode length
        H = self.cfg.decoder_dim
        L = len(self.cells)
        return {
            "h": jnp.zeros((B, L, H), jnp.float32),
            "c": jnp.zeros((B, L, H), jnp.float32),
            "attn": jnp.zeros((B, T), jnp.float32),
            "context": jnp.zeros((B, self.d_enc), jnp.float32),
        }

    def step(
        self,
        token: jnp.ndarray,        # (B,) int32 — previous output token
        state: dict[str, jnp.ndarray],
        keys: jnp.ndarray,         # (B, T, A)
        values: jnp.ndarray,       # (B, T, d_enc)
        mask: jnp.ndarray,         # (B, T)
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray], jnp.ndarray]:
        """One decode step -> (log_probs (B, V), new_state, attn (B, T))."""
        emb = self.embed(token).astype(jnp.float32)             # (B, E)
        context, attn = self.att(
            state["h"][:, -1], keys, values, state["attn"], mask
        )
        x = jnp.concatenate([emb, context], axis=-1)
        hs, cs = [], []
        for li, cell in enumerate(self.cells):
            gates = cell(
                jnp.concatenate([x, state["h"][:, li]], axis=-1)
            ).astype(jnp.float32)
            h_new, c_new = lstm_cell(gates, state["c"][:, li])
            hs.append(h_new)
            cs.append(c_new)
            x = h_new
        out = jnp.concatenate([x, context], axis=-1)
        logits = self.proj(out).astype(jnp.float32)
        new_state = {
            "h": jnp.stack(hs, axis=1),
            "c": jnp.stack(cs, axis=1),
            "attn": attn,
            "context": context,
        }
        return jax.nn.log_softmax(logits, axis=-1), new_state, attn

    def __call__(
        self,
        enc: jnp.ndarray,          # (B, T, d_enc)
        enc_lens: jnp.ndarray,     # (B,)
        tokens: jnp.ndarray,       # (B, U) — gold labels, 0-padded
        token_lens: jnp.ndarray,   # (B,)
        train: bool = False,
        scheduled_sampling: float = 0.0,
        rng: jax.Array | None = None,
        return_attn: bool = False,
    ):
        """Teacher-forced forward: log-probs (B, U+1, V) for targets
        [tokens, eos]. Decoder inputs are [sos, tokens]. With
        `return_attn`, also returns attention maps (B, U+1, T) for the
        genre's attention heatmap logging (SURVEY.md §5.5)."""
        B, T, _ = enc.shape
        U = tokens.shape[1]
        keys = self.att.precompute(enc)
        mask = jnp.arange(T)[None, :] < enc_lens[:, None]
        state = self.init_state(B, T)
        sos = jnp.full((B,), SOS_EOS_ID, jnp.int32)
        inputs = jnp.concatenate([sos[:, None], tokens], axis=1)  # (B, U+1)

        use_ss = train and scheduled_sampling > 0.0 and rng is not None
        ss_keys = (
            jax.random.split(rng, U + 1) if use_ss
            else jnp.zeros((U + 1, 2), jnp.uint32)
        )

        # Remat the step body when training: without it the scan stacks the
        # (B, T, A)-sized tanh/score intermediates for the backward —
        # ~30 MB/step, ~2 GB of HBM traffic per train step at the flagship
        # shape. Recomputing them from the (small) carry is far cheaper.
        step_fn = jax.checkpoint(self.step) if train else self.step

        def scan_step(carry, inp):
            state, prev_pred = carry
            tok_in, ss_key = inp
            if use_ss:
                coin = jax.random.uniform(ss_key, (B,)) < scheduled_sampling
                tok_in = jnp.where(coin, prev_pred, tok_in)
            logp, state, attn = step_fn(tok_in, state, keys, enc, mask)
            pred = jnp.argmax(logp, axis=-1).astype(jnp.int32)
            return (state, pred), (logp, attn)

        (_, _), (logps, attns) = jax.lax.scan(
            scan_step,
            (state, jnp.zeros((B,), jnp.int32)),
            (inputs.swapaxes(0, 1), ss_keys),
            unroll=2,  # halves while-loop trips; body is many small ops
        )
        logps = logps.swapaxes(0, 1)  # (B, U+1, V)
        if return_attn:
            return logps, attns.swapaxes(0, 1)  # (B, U+1, T)
        return logps
