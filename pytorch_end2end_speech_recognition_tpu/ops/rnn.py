"""LSTM primitives: time-scan cells for encoder/decoder/LM.

Capability parity: the reference genre's cuDNN LSTM kernels (SURVEY.md §2b
"cuDNN LSTM"). TPU-native design:

- The input projection `x @ W_ih` for ALL timesteps is hoisted into one big
  (B*T, 4H) matmul — MXU-friendly — so the sequential `lax.scan` carries only
  the (B, 4H) recurrent matmul per step.
- Variable lengths: outputs past a row's length are zeroed; carries freeze at
  the last valid step so final states are exact. Backward direction flips the
  valid prefix per row (no host-side packing).
- `ops/rnn_pallas.py` provides a fused per-step Pallas cell (weights pinned in
  VMEM across steps) selected via `impl='pallas'`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flip_sequences(x: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """Reverse each row's valid prefix [0, len); padding stays in place."""
    T = x.shape[1]
    t = jnp.arange(T)[None, :]
    idx = lens[:, None] - 1 - t
    idx = jnp.where(idx >= 0, idx, t)
    return jnp.take_along_axis(x, idx.reshape(idx.shape + (1,) * (x.ndim - 2)), axis=1)


def lstm_cell(gates: jnp.ndarray, c: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Apply LSTM nonlinearity to pre-activations (.., 4H) with cell state c."""
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def lstm_scan(
    x: jnp.ndarray,            # (B, T, D)
    lens: jnp.ndarray,         # (B,)
    w_ih: jnp.ndarray,         # (D, 4H)
    w_hh: jnp.ndarray,         # (H, 4H)
    bias: jnp.ndarray,         # (4H,)
    reverse: bool = False,
    h0: jnp.ndarray | None = None,
    c0: jnp.ndarray | None = None,
    dtype=jnp.float32,
    unroll: int = 8,
) -> tuple[jnp.ndarray, tuple[jnp.ndarray, jnp.ndarray]]:
    """Run one LSTM direction. Returns (outputs (B,T,H), (h_T, c_T)).

    Outputs at padded steps are zero; (h_T, c_T) are the states at step
    len-1 of each row (initial state for len==0 rows).
    """
    B, T, _ = x.shape
    H = w_hh.shape[0]
    if reverse:
        x = flip_sequences(x, lens)
    xg = (x.astype(dtype) @ w_ih.astype(dtype)).astype(jnp.float32) + bias
    h = jnp.zeros((B, H), jnp.float32) if h0 is None else h0
    c = jnp.zeros((B, H), jnp.float32) if c0 is None else c0

    def step(carry, inp):
        h, c = carry
        xt, t = inp
        gates = xt + (h.astype(dtype) @ w_hh.astype(dtype)).astype(jnp.float32)
        h_new, c_new = lstm_cell(gates, c)
        valid = (t < lens)[:, None]
        h_out = jnp.where(valid, h_new, 0.0)
        h_new = jnp.where(valid, h_new, h)
        c_new = jnp.where(valid, c_new, c)
        return (h_new, c_new), h_out

    (h, c), ys = jax.lax.scan(
        step, (h, c), (xg.swapaxes(0, 1), jnp.arange(T)), unroll=unroll
    )
    ys = ys.swapaxes(0, 1)  # (B, T, H)
    if reverse:
        ys = flip_sequences(ys, lens)
    return ys, (h, c)


def bilstm_layer(
    x: jnp.ndarray,
    lens: jnp.ndarray,
    params_fwd: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    params_bwd: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray],
    dtype=jnp.float32,
    impl: str = "xla",
) -> jnp.ndarray:
    """Bidirectional layer: concat of forward and backward outputs (B,T,2H)."""
    if impl == "pallas":
        from pytorch_end2end_speech_recognition_tpu.ops.rnn_pallas import (
            lstm_scan_pallas,
        )

        yf = lstm_scan_pallas(x, lens, *params_fwd, reverse=False, dtype=dtype)
        yb = lstm_scan_pallas(x, lens, *params_bwd, reverse=True, dtype=dtype)
    else:
        yf, _ = lstm_scan(x, lens, *params_fwd, reverse=False, dtype=dtype)
        yb, _ = lstm_scan(x, lens, *params_bwd, reverse=True, dtype=dtype)
    return jnp.concatenate([yf, yb], axis=-1)
