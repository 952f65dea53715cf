"""Fused Pallas TPU kernel for the log-mel front-end.

Replaces torchaudio's C++ fbank kernels with a single on-chip kernel
(BASELINE.json:5 "the feature front-end becomes a Pallas kernel"):

    framing -> windowed real DFT -> power -> mel projection -> log

TPU mapping:
- Overlapping frames never materialize in HBM. A frame of `win` samples
  starting every `hop` samples is decomposed into `n_sub = ceil(win/hop)`
  consecutive hop-wide sub-blocks of the audio row viewed as (n_rows, hop);
  the kernel re-assembles each tile's (t_tile, n_sub*hop) frame matrix with
  a cheap VMEM lane-concat, so HBM streams ~n_sub x audio, not win/hop x.
- The windowed DFT is ONE matmul per tile: (t_tile, win_pad) @
  (win_pad, 2*f_pad) against the lane-concatenated [cos | sin] basis.
  A single K=win_pad, N=2*f_pad MXU op replaces the previous
  2*n_sub small (t_tile, hop) @ (hop, f_pad) sub-block matmuls, whose
  K=hop=160 contraction left most MXU rows idle (the kernel measured
  ~9% MFU standalone, ~26% of the whole encode bench step).
- Bases are zero-padded: rows win -> n_sub*hop (extra taps multiply zero
  weight) and bins 257 -> 384 (lane-aligned; extra bins carry zero mel
  weight), so results are bit-identical to the unpadded math.
- Grid: (B, frame tiles). Each program computes T_TILE frames:
  concat + DFT matmul + square-add + (T_TILE, 384) @ (384, n_mels) mel
  matmul + log, all in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_EPS = 1e-10
T_TILE = 256
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(x_ref, basis_ref, mel_ref, out_ref, *, hop, n_sub, t_tile):
    """One (batch row, frame tile) program. x_ref holds the n_sub shifted
    hop-block views (n_sub, 1, t_tile, hop) for this tile — pre-shifted in
    XLA so every VMEM load is sublane-aligned. basis_ref is the
    lane-concatenated [cos | sin] windowed-DFT basis (win_pad, 2*f_pad)."""
    f_pad = basis_ref.shape[1] // 2
    # (t_tile, win_pad) frame matrix: window offsets [j*hop, (j+1)*hop) of
    # frame t live in x_ref[j, 0][t], so a lane-concat re-assembles frames.
    frames = jnp.concatenate([x_ref[j, 0] for j in range(n_sub)], axis=1)
    reim = jnp.dot(frames, basis_ref[...], preferred_element_type=jnp.float32)
    re = reim[:, :f_pad]
    im = reim[:, f_pad:]
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(mel + LOG_EPS)


@functools.partial(jax.jit, static_argnames=("hop", "n_frames"))
def logmel_pallas(
    x: jnp.ndarray,        # (B, Ts) preemphasized audio
    cos_b: jnp.ndarray,    # (win, F) windowed DFT cos basis
    sin_b: jnp.ndarray,    # (win, F)
    mel_b: jnp.ndarray,    # (F, M)
    hop: int,
    n_frames: int,
) -> jnp.ndarray:
    """(B, Ts) -> (B, n_frames, M) log-mel, fused on-chip."""
    B, Ts = x.shape
    win, F = cos_b.shape
    M = mel_b.shape[1]
    n_sub = -(-win // hop)
    win_pad = n_sub * hop
    f_pad = _round_up(F, LANE)

    t_tile = min(T_TILE, _round_up(n_frames, 8))
    n_tiles = -(-n_frames // t_tile)
    t_total = n_tiles * t_tile
    # samples needed: (t_total + n_sub) * hop
    n_rows = t_total + n_sub
    need = n_rows * hop
    if Ts < need:
        x = jnp.pad(x, ((0, 0), (0, need - Ts)))
    xr = x[:, :need].reshape(B, n_rows, hop)
    # n_sub shifted views (n_sub, B, t_total, hop): frame t's j-th sub-block
    xs = jnp.stack([xr[:, j : j + t_total] for j in range(n_sub)], axis=0)

    # pad bases: rows win -> win_pad (zeros), bins F -> f_pad (zeros);
    # lane-concat cos|sin into one (win_pad, 2*f_pad) matmul operand
    def prep(b):
        return jnp.pad(b, ((0, win_pad - win), (0, f_pad - F)))

    basis = jnp.concatenate([prep(cos_b), prep(sin_b)], axis=1)
    melp = jnp.pad(mel_b, ((0, f_pad - F), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop, n_sub=n_sub, t_tile=t_tile),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((n_sub, 1, t_tile, hop), lambda b, t: (0, b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, M), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_total, M), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_total * (2 * win_pad + M) * f_pad,
            bytes_accessed=B * need * 4 + B * t_total * M * 4,
            transcendentals=B * t_total * M,
        ),
    )(xs, basis, melp)
    return out[:, :n_frames]
