"""CTC loss and greedy decode.

Capability parity: the reference genre's warp-ctc / `torch.nn.CTCLoss`
C++/CUDA lattice kernels (SURVEY.md §2b). Two implementations:

- `impl='xla'`: forward-backward in pure XLA (`lax.scan` over the label
  lattice) — the portable path, also the differentiable default via JAX AD.
- `impl='pallas'`: custom Pallas scan kernel over batched label lattices with
  a custom VJP (BASELINE.json:5) — see `ops/ctc_pallas.py`.
- `optax.ctc_loss` is the numerical oracle in tests (SURVEY.md §4).

Conventions: blank id 0; `labels` contain no blanks; log domain throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ctc_lattice(labels: jnp.ndarray) -> jnp.ndarray:
    """Extended label sequence with interleaved blanks: (B, U) -> (B, 2U+1)."""
    B, U = labels.shape
    ext = jnp.zeros((B, 2 * U + 1), labels.dtype)
    return ext.at[:, 1::2].set(labels)


def _lattice_logprobs(log_probs: jnp.ndarray, ext: jnp.ndarray) -> jnp.ndarray:
    """Gather per-frame log-probs of lattice states: (B,T,V),(B,S)->(B,T,S)."""
    return jnp.take_along_axis(
        log_probs, ext[:, None, :].astype(jnp.int32), axis=2
    )


def ctc_loss_xla(
    logits: jnp.ndarray,       # (B, T, V)
    logit_lens: jnp.ndarray,   # (B,)
    labels: jnp.ndarray,       # (B, U) — 0-padded, no blanks among valid
    label_lens: jnp.ndarray,   # (B,)
) -> jnp.ndarray:
    """Per-sequence CTC negative log-likelihood via the alpha recursion.

    Rows with label_len == 0 or logit_len == 0 contribute 0 loss (treated as
    padding rows of a bucketed batch).
    """
    B, T, V = logits.shape
    U = labels.shape[1]
    S = 2 * U + 1
    log_probs = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ext = ctc_lattice(labels)                        # (B, S)
    lp = _lattice_logprobs(log_probs, ext)           # (B, T, S)

    # skip-transition allowed into odd states s when label != label at s-2
    s_idx = jnp.arange(S)[None, :]
    prev2 = jnp.where(s_idx >= 2, ext[:, jnp.maximum(s_idx - 2, 0)[0]], -1)
    can_skip = (s_idx % 2 == 1) & (s_idx >= 2) & (ext != prev2)

    # init: alpha_0 = lp[0] at s=0,1
    alpha0 = jnp.where(s_idx < 2, lp[:, 0, :], NEG_INF)
    # clamp states beyond 2*label_len+1
    smax = 2 * label_lens[:, None] + 1
    state_ok = s_idx < smax
    alpha0 = jnp.where(state_ok, alpha0, NEG_INF)

    def step(alpha, inp):
        lpt, t = inp                                  # (B, S), scalar
        a_prev1 = jnp.pad(alpha, ((0, 0), (1, 0)), constant_values=NEG_INF)[:, :S]
        a_prev2 = jnp.pad(alpha, ((0, 0), (2, 0)), constant_values=NEG_INF)[:, :S]
        stay = alpha
        diag = a_prev1
        skip = jnp.where(can_skip, a_prev2, NEG_INF)
        m = jnp.maximum(jnp.maximum(stay, diag), skip)
        new = m + jnp.log(
            jnp.exp(stay - m) + jnp.exp(diag - m) + jnp.exp(skip - m)
        )
        new = jnp.where(state_ok, new + lpt, NEG_INF)
        # frames beyond logit_len: carry alpha unchanged
        valid_t = (t < logit_lens)[:, None]
        new = jnp.where(valid_t, new, alpha)
        return new, None

    alpha, _ = jax.lax.scan(
        step, alpha0, (lp.swapaxes(0, 1)[1:], jnp.arange(1, T))
    )
    # total prob: alpha at states 2*label_len and 2*label_len - 1
    last = 2 * label_lens[:, None]
    aT1 = jnp.take_along_axis(alpha, last, axis=1)[:, 0]
    aT2 = jnp.where(
        label_lens > 0,
        jnp.take_along_axis(alpha, jnp.maximum(last - 1, 0), axis=1)[:, 0],
        NEG_INF,
    )
    m = jnp.maximum(aT1, aT2)
    ll = m + jnp.log(jnp.exp(aT1 - m) + jnp.exp(aT2 - m))
    loss = -ll
    pad_row = (label_lens == 0) | (logit_lens == 0)
    return jnp.where(pad_row, 0.0, loss)


def ctc_loss(
    logits, logit_lens, labels, label_lens, impl: str = "xla"
) -> jnp.ndarray:
    if impl == "pallas":
        from pytorch_end2end_speech_recognition_tpu.ops.ctc_pallas import (
            ctc_loss_pallas,
        )

        return ctc_loss_pallas(logits, logit_lens, labels, label_lens)
    if impl == "optax":
        import optax

        T = logits.shape[1]
        U = labels.shape[1]
        logit_pad = (jnp.arange(T)[None, :] >= logit_lens[:, None]).astype(
            jnp.float32
        )
        label_pad = (jnp.arange(U)[None, :] >= label_lens[:, None]).astype(
            jnp.float32
        )
        per_seq = optax.ctc_loss(logits, logit_pad, labels, label_pad)
        pad_row = (label_lens == 0) | (logit_lens == 0)
        return jnp.where(pad_row, 0.0, per_seq)
    return ctc_loss_xla(logits, logit_lens, labels, label_lens)


def ctc_greedy_decode(
    logits: jnp.ndarray, logit_lens: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Best-path decode: argmax -> collapse repeats -> drop blanks.

    Returns (tokens (B, T) right-padded with 0, out_lens (B,)). Fully
    on-device; host only detokenizes (SURVEY.md §2a "Greedy CTC decode").
    """
    B, T, V = logits.shape
    path = jnp.argmax(logits, axis=-1)                         # (B, T)
    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < logit_lens[:, None]
    prev = jnp.pad(path, ((0, 0), (1, 0)))[:, :T]
    keep = valid & (path != 0) & ((path != prev) | (t_idx == 0))
    # stable compaction: position of each kept token
    pos = jnp.cumsum(keep, axis=1) - 1
    out = jnp.zeros((B, T), path.dtype)
    scatter_idx = jnp.where(keep, pos, T - 1)
    dummy = jnp.zeros((B, T), path.dtype)
    out = dummy.at[jnp.arange(B)[:, None], scatter_idx].max(
        jnp.where(keep, path, 0)
    )
    out_lens = keep.sum(axis=1)
    # zero anything at/after out_lens (the dummy slot may hold a value)
    out = jnp.where(t_idx < out_lens[:, None], out, 0)
    return out, out_lens
