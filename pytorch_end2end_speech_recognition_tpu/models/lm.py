"""RNN language model for shallow fusion and LM training.

Capability parity: the reference genre's `RNNLM` + `train_lm` loop
(SURVEY.md §2a "RNN-LM", §3.4). LSTM LM over token sequences with the shared
id conventions (sos/eos = 1). `step()` mirrors the decoder's flat-state
interface so beam search reorders LM state with the same gather.
"""

from __future__ import annotations

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

    def init_state(self, B: int) -> dict[str, jnp.ndarray]:
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
