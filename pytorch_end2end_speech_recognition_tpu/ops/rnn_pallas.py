"""Fused Pallas TPU LSTM-cell kernel with custom VJP.

Replaces cuDNN LSTM (SURVEY.md §2b "cuDNN LSTM"). The input projection
x @ W_ih stays a single big XLA matmul (ops/rnn.py); this kernel runs the
sequential part — per-step h @ W_hh + gate nonlinearities — with W_hh and
the (h, c) carry pinned in VMEM across ALL timesteps. A lax.scan re-fetches
W_hh from HBM every step (e.g. 320x1280 f32 = 1.6 MB x T=3000 steps =
~5 GB of HBM traffic per layer-direction); here it is loaded once.

Layout: grid over time tiles (TPU grid steps run sequentially, so VMEM
scratch carries (h, c) across tiles); xg blocks (B, T_TILE, 4H) stream in,
(h, c) blocks stream out. Variable lengths freeze the carry and zero the
outputs past each row's length (same contract as ops.rnn.lstm_scan).

Backward recomputes gate activations from saved (xg, h, c) — one extra
matmul per step instead of storing 4H activations — and accumulates dW_hh
in a VMEM scratch, writing it once at the end.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T_TILE = 128
_VMEM_BUDGET = 6 * 1024 * 1024  # bytes for double-buffered streamed blocks


def _round_up(x, m):
    return ((x + m - 1) // m) * m


def _pick_tile(B: int, H: int, T: int, streams: int) -> int:
    """Largest multiple-of-8 time tile whose double-buffered streamed blocks
    ((4H in/out) + `streams` extra H-wide streams, f32) fit the VMEM budget."""
    per_step = B * 4 * (4 * H + streams * H) * 2  # bytes, x2 double buffer
    t = max(8, min(T_TILE, _VMEM_BUDGET // max(per_step, 1)))
    return max(8, (t // 8) * 8)


def _gates_fwd(xg_t, h, c, whh):
    gates = xg_t + jnp.dot(h, whh, preferred_element_type=jnp.float32)
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new, (i, f, g, o)


def _fwd_kernel(xg_ref, whh_ref, lens_ref, h_out_ref, c_out_ref,
                h_scr, c_scr, *, t_tile, H):
    @pl.when(pl.program_id(0) == 0)
    def _():
        h_scr[...] = jnp.zeros_like(h_scr)
        c_scr[...] = jnp.zeros_like(c_scr)

    whh = whh_ref[...]
    lens = lens_ref[...]                                    # (B, 1)
    t_base = pl.program_id(0) * t_tile

    def body(i, _):
        h, c = h_scr[...], c_scr[...]
        h_new, c_new, _ = _gates_fwd(xg_ref[:, i], h, c, whh)
        valid = (t_base + i) < lens                         # (B, 1)
        h_scr[...] = jnp.where(valid, h_new, h)
        c_scr[...] = jnp.where(valid, c_new, c)
        h_out_ref[:, i] = jnp.where(valid, h_new, 0.0)
        c_out_ref[:, i] = jnp.where(valid, c_new, c)
        return 0

    jax.lax.fori_loop(0, t_tile, body, 0)


def _bwd_kernel(xg_ref, whh_ref, lens_ref, h_all_ref, c_all_ref, g_ref,
                dxg_ref, dwhh_ref, dh_scr, dc_scr, dwhh_scr, *,
                t_tile, n_tiles, H):
    """Reverse-time tile: grid index i processes tile (n_tiles-1-i)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        dh_scr[...] = jnp.zeros_like(dh_scr)
        dc_scr[...] = jnp.zeros_like(dc_scr)
        dwhh_scr[...] = jnp.zeros_like(dwhh_scr)

    whh = whh_ref[...]
    lens = lens_ref[...]
    tile = pl.program_id(0)                 # reversed via index_map
    t_base = (n_tiles - 1 - tile) * t_tile

    def body2(k, _):
        i = t_tile - 1 - k
        t = t_base + i
        valid = t < lens
        xg_t = xg_ref[:, i]
        # h_all/c_all inputs are the PRE-SHIFTED prev-state sequences:
        # index t holds the state at t-1 (zeros at t=0)
        h_prev = h_all_ref[:, i]
        c_prev = c_all_ref[:, i]
        _, c_new, (ig, fg, gg, og) = _gates_fwd(xg_t, h_prev, c_prev, whh)
        tanh_c = jnp.tanh(c_new)
        dh = dh_scr[...] + g_ref[:, i]
        dc = dc_scr[...] + dh * og * (1.0 - tanh_c * tanh_c)
        d_o = dh * tanh_c
        d_i = dc * gg
        d_g = dc * ig
        d_f = dc * c_prev
        # pre-activation grads
        pi = d_i * ig * (1.0 - ig)
        pf = d_f * fg * (1.0 - fg)
        pg = d_g * (1.0 - gg * gg)
        po = d_o * og * (1.0 - og)
        dgates = jnp.concatenate([pi, pf, pg, po], axis=1)   # (B, 4H)
        dgates = jnp.where(valid, dgates, 0.0)
        dxg_ref[:, i] = dgates
        dh_prev = jnp.dot(dgates, whh.T, preferred_element_type=jnp.float32)
        dwhh_scr[...] += jnp.dot(
            h_prev.T, dgates, preferred_element_type=jnp.float32
        )
        dh_scr[...] = jnp.where(valid, dh_prev, dh_scr[...])
        dc_scr[...] = jnp.where(valid, dc * fg, dc_scr[...])
        return 0

    jax.lax.fori_loop(0, t_tile, body2, 0)

    @pl.when(pl.program_id(0) == n_tiles - 1)
    def _():
        dwhh_ref[...] = dwhh_scr[...]


def _fwd_call(xg, whh, lens):
    B, T, H4 = xg.shape
    H = H4 // 4
    t_tile = min(_pick_tile(B, H, T, streams=2), _round_up(T, 8))
    n_tiles = -(-T // t_tile)
    T_pad = n_tiles * t_tile
    if T_pad != T:
        xg = jnp.pad(xg, ((0, 0), (0, T_pad - T), (0, 0)))
    h_all, c_all = pl.pallas_call(
        functools.partial(_fwd_kernel, t_tile=t_tile, H=H),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, t_tile, H4), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, t_tile, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, t_tile, H), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_pad, H), jnp.float32),
            jax.ShapeDtypeStruct((B, T_pad, H), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * T_pad * H * H4,
            bytes_accessed=4 * (B * T_pad * H4 + 2 * B * T_pad * H + H * H4),
            transcendentals=4 * B * T_pad * H,
        ),
    )(xg, whh, lens.astype(jnp.int32)[:, None])
    return h_all[:, :T], c_all[:, :T]


@jax.custom_vjp
def lstm_seq_pallas(xg, whh, lens):
    """Sequential LSTM over precomputed input gates.

    xg: (B, T, 4H) = x @ W_ih + b; whh: (H, 4H); lens: (B,).
    Returns h_all (B, T, H) with zeros past each row's length.
    """
    h_all, _ = _fwd_call(xg, whh, lens)
    return h_all


def _vjp_fwd(xg, whh, lens):
    h_all, c_all = _fwd_call(xg, whh, lens)
    return h_all, (xg, whh, lens, h_all, c_all)


def _vjp_bwd(res, g):
    xg, whh, lens, h_all, c_all = res
    B, T, H4 = xg.shape
    H = H4 // 4
    t_tile = min(_pick_tile(B, H, T, streams=3 + 4), _round_up(T, 8))
    n_tiles = -(-T // t_tile)
    T_pad = n_tiles * t_tile

    # prev-state sequences: index t holds state at t-1 (zeros at t=0).
    # c_out stores frozen values past len, matching what fwd used.
    h_prev = jnp.pad(h_all, ((0, 0), (1, 0), (0, 0)))[:, :T]
    c_prev = jnp.pad(c_all, ((0, 0), (1, 0), (0, 0)))[:, :T]
    if T_pad != T:
        pad = ((0, 0), (0, T_pad - T), (0, 0))
        xg = jnp.pad(xg, pad)
        h_prev = jnp.pad(h_prev, pad)
        c_prev = jnp.pad(c_prev, pad)
        g = jnp.pad(g, pad)

    rev = lambda i: (0, n_tiles - 1 - i, 0)  # noqa: E731 — reversed tiles
    dxg, dwhh = pl.pallas_call(
        functools.partial(_bwd_kernel, t_tile=t_tile, n_tiles=n_tiles, H=H),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((B, t_tile, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((B, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((B, t_tile, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, t_tile, H), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((B, t_tile, H), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((B, t_tile, H4), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, T_pad, H4), jnp.float32),
            jax.ShapeDtypeStruct((H, H4), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((B, H), jnp.float32),
            pltpu.VMEM((H, H4), jnp.float32),
        ],
    )(xg, whh, lens.astype(jnp.int32)[:, None], h_prev, c_prev, g)
    return dxg[:, :T], dwhh, None


lstm_seq_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def lstm_scan_pallas(x, lens, w_ih, w_hh, bias, reverse=False,
                     dtype=jnp.float32):
    """Drop-in replacement for ops.rnn.lstm_scan (outputs only)."""
    from pytorch_end2end_speech_recognition_tpu.ops.rnn import flip_sequences

    if reverse:
        x = flip_sequences(x, lens)
    xg = (x.astype(dtype) @ w_ih.astype(dtype)).astype(jnp.float32) + bias
    ys = lstm_seq_pallas(xg, w_hh, lens)
    if reverse:
        ys = flip_sequences(ys, lens)
    return ys
