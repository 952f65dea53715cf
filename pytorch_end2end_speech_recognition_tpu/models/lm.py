"""Language models for shallow fusion and LM training.

Capability parity: the reference genre's `RNNLM` + `train_lm` loop
(SURVEY.md §2a "RNN-LM", §3.4) plus the ESPnet-genre transformer LM
alternative. Both share the id conventions (sos/eos = 1) and the same
`init_state`/`step` interface as the attention decoders, so beam search
reorders LM state with one gather regardless of LM kind.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.data.tokenizer import SOS_EOS_ID
from pytorch_end2end_speech_recognition_tpu.ops.rnn import lstm_cell, lstm_scan
from pytorch_end2end_speech_recognition_tpu.utils.config import ModelConfig


class RnnLm(nnx.Module):
    def __init__(self, cfg: ModelConfig, rngs: nnx.Rngs):
        V, E, H = cfg.vocab_size, cfg.lm_embed_dim, cfg.lm_dim
        self.cfg = cfg
        self.embed = nnx.Embed(V, E, rngs=rngs)
        self.cells = nnx.List([])
        d = E
        for _ in range(cfg.lm_layers):
            self.cells.append(nnx.Linear(d + H, 4 * H, rngs=rngs))
            d = H
        self.proj = nnx.Linear(H, V, rngs=rngs)

    def init_state(self, B: int, max_len: int | None = None):
        del max_len  # recurrent state is O(1) in decode length
        H = self.cfg.lm_dim
        L = len(self.cells)
        return {
            "h": jnp.zeros((B, L, H), jnp.float32),
            "c": jnp.zeros((B, L, H), jnp.float32),
        }

    def step(
        self, token: jnp.ndarray, state: dict[str, jnp.ndarray]
    ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
        """(B,), state -> (log_probs (B, V), new_state)."""
        x = self.embed(token).astype(jnp.float32)
        hs, cs = [], []
        for li, cell in enumerate(self.cells):
            gates = cell(
                jnp.concatenate([x, state["h"][:, li]], axis=-1)
            ).astype(jnp.float32)
            h, c = lstm_cell(gates, state["c"][:, li])
            hs.append(h)
            cs.append(c)
            x = h
        logits = self.proj(x).astype(jnp.float32)
        return (
            jax.nn.log_softmax(logits, axis=-1),
            {"h": jnp.stack(hs, axis=1), "c": jnp.stack(cs, axis=1)},
        )

    def __call__(
        self, tokens: jnp.ndarray, token_lens: jnp.ndarray
    ) -> jnp.ndarray:
        """Teacher-forced LM forward: (B, U) -> log-probs (B, U+1, V) for
        targets [tokens, eos]; inputs are [sos, tokens]."""
        B, U = tokens.shape
        sos = jnp.full((B, 1), SOS_EOS_ID, tokens.dtype)
        inputs = jnp.concatenate([sos, tokens], axis=1)
        state = self.init_state(B)

        def scan_step(state, tok):
            logp, state = self.step(tok, state)
            return state, logp

        _, logps = jax.lax.scan(scan_step, state, inputs.swapaxes(0, 1))
        return logps.swapaxes(0, 1)


class TransformerLmBlock(nnx.Module):
    """Pre-LN causal self-attention + FFN (no cross-attention)."""

    def __init__(self, cfg: ModelConfig, rngs: nnx.Rngs):
        D = cfg.lm_dim
        F = cfg.lm_ffn_dim if cfg.lm_ffn_dim > 0 else 4 * D
        self.heads = cfg.lm_heads
        self.ln1 = nnx.LayerNorm(D, rngs=rngs)
        self.wq = nnx.Linear(D, D, rngs=rngs)
        self.wk = nnx.Linear(D, D, rngs=rngs)
        self.wv = nnx.Linear(D, D, rngs=rngs)
        self.wo = nnx.Linear(D, D, rngs=rngs)
        self.ln2 = nnx.LayerNorm(D, rngs=rngs)
        self.fc1 = nnx.Linear(D, F, rngs=rngs)
        self.fc2 = nnx.Linear(F, D, rngs=rngs)

    def qkv(self, x):
        h = self.ln1(x)
        return self.wq(h), self.wk(h), self.wv(h)

    def run(self, x, q, k, v, mask):
        from pytorch_end2end_speech_recognition_tpu.models.decoder_transformer import (  # noqa: E501
            mha,
        )

        y, _ = mha(q, k, v, mask, self.heads)
        x = x + self.wo(y)
        return x + self.fc2(jax.nn.relu(self.fc1(self.ln2(x))))


class TransformerLm(nnx.Module):
    """Causal transformer LM with the RnnLm fusion interface
    (KV-cache incremental `step`, parallel teacher-forced `__call__`)."""

    def __init__(self, cfg: ModelConfig, rngs: nnx.Rngs):
        V, D = cfg.vocab_size, cfg.lm_dim
        self.cfg = cfg
        self.embed = nnx.Embed(V, D, rngs=rngs)
        self.blocks = nnx.List(
            [TransformerLmBlock(cfg, rngs) for _ in range(cfg.lm_layers)]
        )
        self.ln_out = nnx.LayerNorm(D, rngs=rngs)
        self.proj = nnx.Linear(D, V, rngs=rngs)

    def _pe(self, T: int):
        from pytorch_end2end_speech_recognition_tpu.models.encoders import (
            sinusoidal_pe,
        )

        return jnp.asarray(sinusoidal_pe(T, self.cfg.lm_dim))

    def init_state(self, B: int, max_len: int | None = None):
        if max_len is None:
            raise ValueError("TransformerLm.init_state needs max_len")
        L, D = len(self.blocks), self.cfg.lm_dim
        return {
            "k_cache": jnp.zeros((B, max_len, L, D), jnp.float32),
            "v_cache": jnp.zeros((B, max_len, L, D), jnp.float32),
            "pos": jnp.zeros((B,), jnp.int32),
        }

    def step(self, token, state, per_row_pos=False):
        B = token.shape[0]
        U = state["k_cache"].shape[1]
        D = self.cfg.lm_dim
        kc, vc = state["k_cache"], state["v_cache"]
        if per_row_pos:  # streaming chunk beam: rows fall out of lockstep
            pos_v = state["pos"]
            x = (self.embed(token) * np.sqrt(D)
                 + self._pe(U)[pos_v])[:, None, :]
            self_mask = (jnp.arange(U)[None, :]
                         <= pos_v[:, None])[:, None, None, :]
            rows = jnp.arange(B)
        else:
            pos = state["pos"][0]
            x = (self.embed(token) * np.sqrt(D)
                 + self._pe(U)[pos])[:, None, :]
            self_mask = (jnp.arange(U) <= pos)[None, None, None, :]
        for li, blk in enumerate(self.blocks):
            q, k_new, v_new = blk.qkv(x)
            if per_row_pos:
                kc = kc.at[rows, pos_v, li].set(k_new[:, 0])
                vc = vc.at[rows, pos_v, li].set(v_new[:, 0])
            else:
                kc = kc.at[:, pos, li].set(k_new[:, 0])
                vc = vc.at[:, pos, li].set(v_new[:, 0])
            x = blk.run(x, q, kc[:, :, li], vc[:, :, li], self_mask)
        logits = self.proj(self.ln_out(x))[:, 0]
        return (
            jax.nn.log_softmax(logits, axis=-1),
            {"k_cache": kc, "v_cache": vc, "pos": state["pos"] + 1},
        )

    def __call__(self, tokens, token_lens):
        """Teacher-forced LM forward: (B, U) -> log-probs (B, U+1, V)."""
        B, U = tokens.shape
        U1 = U + 1
        sos = jnp.full((B, 1), SOS_EOS_ID, tokens.dtype)
        inputs = jnp.concatenate([sos, tokens], axis=1)
        D = self.cfg.lm_dim
        x = self.embed(inputs) * np.sqrt(D) + self._pe(U1)
        mask = jnp.tril(jnp.ones((U1, U1), bool))[None, None]
        for blk in self.blocks:
            q, k, v = blk.qkv(x)
            x = blk.run(x, q, k, v, mask)
        return jax.nn.log_softmax(self.proj(self.ln_out(x)), axis=-1)


def build_lm(cfg: ModelConfig, rngs: nnx.Rngs):
    if cfg.lm_type == "transformer":
        return TransformerLm(cfg, rngs)
    if cfg.lm_type == "lstm":
        return RnnLm(cfg, rngs)
    raise ValueError(f"unknown lm kind {cfg.lm_type}")


def lm_loss(
    lm: RnnLm, tokens: jnp.ndarray, token_lens: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean NLL per valid target + token count (for perplexity)."""
    logps = lm(tokens, token_lens)                     # (B, U+1, V)
    B, U1, V = logps.shape
    eos = jnp.full((B, 1), SOS_EOS_ID, tokens.dtype)
    targets = jnp.concatenate([tokens, jnp.zeros_like(eos)], axis=1)
    targets = targets.at[jnp.arange(B), token_lens].set(SOS_EOS_ID)
    mask = jnp.arange(U1)[None, :] <= token_lens[:, None]
    nll = -jnp.take_along_axis(logps, targets[..., None], axis=-1)[..., 0]
    total = jnp.sum(jnp.where(mask, nll, 0.0))
    count = jnp.sum(mask)
    return total / jnp.maximum(count, 1), count
