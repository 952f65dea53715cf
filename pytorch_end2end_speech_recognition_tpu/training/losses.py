"""Training losses: CTC, label-smoothed CE, hybrid lambda-combination.

Capability parity: the reference genre's `L = l*CTC + (1-l)*CE(attn)` with
label smoothing (SURVEY.md §2a "Hybrid loss", §3.1 hot loop).
"""

from __future__ import annotations

import jax.numpy as jnp

from pytorch_end2end_speech_recognition_tpu.data.tokenizer import SOS_EOS_ID
from pytorch_end2end_speech_recognition_tpu.ops.ctc import ctc_loss


def attention_ce_loss(
    logps: jnp.ndarray,       # (B, U+1, V) decoder log-probs
    tokens: jnp.ndarray,      # (B, U) gold labels
    token_lens: jnp.ndarray,  # (B,)
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Per-utterance mean CE over [tokens, eos] targets; 0 for pad rows."""
    B, U1, V = logps.shape
    # targets: tokens with eos appended at position token_lens
    targets = jnp.concatenate(
        [tokens, jnp.zeros((B, 1), tokens.dtype)], axis=1
    )
    targets = targets.at[jnp.arange(B), token_lens].set(SOS_EOS_ID)
    mask = jnp.arange(U1)[None, :] <= token_lens[:, None]   # (B, U+1)
    nll = -jnp.take_along_axis(logps, targets[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        uniform = -jnp.mean(logps, axis=-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * uniform
    pad_row = token_lens == 0
    n = jnp.maximum(token_lens + 1, 1).astype(logps.dtype)
    per_utt = jnp.sum(jnp.where(mask, nll, 0.0), axis=1) / n
    return jnp.where(pad_row, 0.0, per_utt)


def hybrid_loss(
    ctc_logits: jnp.ndarray,
    enc_lens: jnp.ndarray,
    att_logps: jnp.ndarray | None,
    tokens: jnp.ndarray,
    token_lens: jnp.ndarray,
    ctc_weight: float,
    label_smoothing: float = 0.0,
    ctc_impl: str = "xla",
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Batch-mean hybrid loss + metric components, masking pad rows."""
    n_valid = jnp.maximum(jnp.sum(token_lens > 0), 1).astype(jnp.float32)
    metrics = {}
    total = 0.0
    if ctc_weight > 0.0:
        ctc_per_utt = ctc_loss(ctc_logits, enc_lens, tokens, token_lens,
                               impl=ctc_impl)
        # normalize per label length (genre norm: per-target-frame mean)
        ctc_norm = ctc_per_utt / jnp.maximum(token_lens, 1)
        ctc_mean = jnp.sum(ctc_norm) / n_valid
        metrics["ctc_loss"] = ctc_mean
        total = total + ctc_weight * ctc_mean
    if att_logps is not None and ctc_weight < 1.0:
        ce_per_utt = attention_ce_loss(
            att_logps, tokens, token_lens, label_smoothing
        )
        ce_mean = jnp.sum(ce_per_utt) / n_valid
        metrics["att_loss"] = ce_mean
        total = total + (1.0 - ctc_weight) * ce_mean
    metrics["loss"] = total
    return total, metrics
