"""Fused Pallas TPU kernel for the log-mel front-end.

Replaces torchaudio's C++ fbank kernels with a single on-chip kernel
(BASELINE.json:5 "the feature front-end becomes a Pallas kernel"):

    preemphasis -> framing -> windowed real DFT -> power -> mel -> log
    -> pad-frame masking

The kernel consumes RAW padded audio and emits masked log-mel. The r3
version ran a separate preemphasis pass, an f32 overlapped-view stack
(~90 MB HBM materialization at the B=32 x 30 s bench shape) and the
pad-frame mask as XLA passes around the kernel (~4.3 ms of a ~4.4 ms
frontend region, PERF_r3.md §6); v4 folds preemphasis into the basis,
halves the view stack (bf16, one fused slice+cast+stack) and masks in
the kernel epilogue.

TPU mapping:
- **Preemphasis is folded into the DFT basis.** y[n] = x[n] - a*x[n-1]
  is linear, so the windowed DFT of y is a matmul of the RAW samples
  against a modified basis: coeff(x[n]) = w[n]e[n,k] - a*w[n+1]e[n+1,k],
  with one extra raw sample *before* the window (n = -1 carries
  -a*w[0]e[0,k]). No separate preemphasis pass, no (B, Ts) rewrite, and
  bit-equivalent to preemphasizing then framing (`preemph_dft_bases`).
- A frame of n_sub*hop raw samples starting every `hop` samples is
  decomposed into consecutive hop-wide sub-blocks of the back-padded
  audio viewed as (n_rows, hop); XLA pre-shifts the n_sub views (ONE
  fused slice+cast+stack, bf16) and the kernel re-assembles each tile's
  (t_tile, n_sub*hop) frame matrix with a VMEM lane-concat. The
  preemphasis term that references the sample *before* each frame is NOT
  an extra view: it rides along as a (t_tile, 1) predecessor column and
  is applied in-kernel as a rank-1 update against `basis_prev` (v5 —
  the v4 extra hop-block view whose basis rows were zero except one lane
  cost ~25% more K and stack traffic). Fully in-kernel frame assembly
  was probed on hardware and does not lower: tpu.concatenate rejects
  vregs at differing sublane offsets and tpu.dynamic_rotate miscompiles
  the shift>8 rolls that would re-home them, so the pre-shift stays in
  XLA.
- The windowed DFT is ONE matmul per tile: (t_tile, L) @ (L, 2*f_pad)
  against the lane-concatenated [cos | sin] preemph basis (L=n_sub*hop
  rows, zero rows where no raw sample contributes; bins 257 -> 384
  lane-aligned with zero mel weight) — results identical to the unpadded
  math. bf16 operands halve the MXU cost; accumulation stays f32.
- Pad-frame masking runs in the kernel epilogue against per-row frame
  lengths in SMEM, so downstream masking/CMVN sees exact zeros without
  another (B, T, M) pass.
- Grid: (B, frame tiles); everything per program stays in VMEM (~1.5 MB).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG_EPS = 1e-10
T_TILE = 512
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def preemph_dft_bases(
    cos_b: np.ndarray,    # (win, F) windowed DFT cos basis (Hann folded in)
    sin_b: np.ndarray,    # (win, F)
    hop: int,
    alpha: float,
) -> tuple[np.ndarray, np.ndarray]:
    """Fold preemphasis y[n] = x[n] - alpha*x[n-1] into the windowed-DFT
    basis, re-indexed onto raw-audio lane positions.

    Returns (basis, basis_prev):
    - basis: lane-concatenated [cos | sin] operand (L, 2*f_pad),
      L = n_sub*hop, lane m = raw sample (frame_start + m). Row m carries
      w[m]e[m,k] - alpha*w[m+1]e[m+1,k] for the window proper — every
      in-window preemphasis term EXCEPT the one referencing the sample
      before the frame.
    - basis_prev: (1, 2*f_pad) row -alpha*w[0]e[0,k] — the coefficient of
      that predecessor sample x[frame_start - 1], applied in-kernel as a
      rank-1 update (streaming a whole extra hop-block view for one
      meaningful lane cost ~25% of the kernel's flops and stack traffic).
    Together the result is bit-identical to preemphasize-then-frame."""
    win, F = cos_b.shape
    n_sub = -(-win // hop)
    L = n_sub * hop
    f_pad = _round_up(F, LANE)

    def ext(b):
        e = np.zeros((L, f_pad), np.float32)
        e[:win, :F] += b
        e[: win - 1, :F] -= alpha * b[1:]
        return e

    def prev(b):
        e = np.zeros((1, f_pad), np.float32)
        e[0, :F] = -alpha * b[0]
        return e

    return (np.concatenate([ext(cos_b), ext(sin_b)], axis=1),
            np.concatenate([prev(cos_b), prev(sin_b)], axis=1))


def _kernel(flens_ref, x_ref, prev_ref, basis_ref, bprev_ref, mel_ref,
            out_ref, *, n_sub, t_tile):
    """One (batch row, frame tile) program. x_ref holds the n_sub
    row-shifted hop-block views (n_sub, 1, t_tile, hop) of the audio for
    this tile — frame i spans rows [i, i+n_sub), view j supplies window
    offsets [j*hop, (j+1)*hop). The views are pre-shifted in XLA: every
    in-kernel load is then sublane-offset-0, which the lane-concat below
    requires (Mosaic rejects concat of offset-j vregs, and
    tpu.dynamic_rotate miscompiles the shift>8 rolls that would re-home
    them — both probed on hardware). prev_ref (1, t_tile, 1) holds each
    frame's preemphasis predecessor sample, applied as a rank-1 update
    against bprev_ref; basis_ref = the preemph-folded [cos | sin]
    operand; flens_ref = valid frame counts (SMEM)."""
    f_pad = basis_ref.shape[1] // 2
    frames = jnp.concatenate([x_ref[j, 0] for j in range(n_sub)], axis=1)
    reim = jnp.dot(frames, basis_ref[...], preferred_element_type=jnp.float32)
    reim = reim + (prev_ref[0].astype(jnp.float32) * bprev_ref[...])
    re = reim[:, :f_pad]
    im = reim[:, f_pad:]
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[...], preferred_element_type=jnp.float32)
    logmel = jnp.log(mel + LOG_EPS)
    # pad-frame mask: frames at/after this row's length are exact zeros
    t0 = pl.program_id(1) * t_tile
    valid = (t0 + jax.lax.broadcasted_iota(jnp.int32, (t_tile, 1), 0)
             < flens_ref[pl.program_id(0), 0])
    out_ref[0] = jnp.where(valid, logmel, 0.0)


@functools.partial(jax.jit, static_argnames=("hop", "n_frames"))
def logmel_pallas(
    x: jnp.ndarray,        # (B, Ts) RAW padded audio (no preemphasis)
    basis: jnp.ndarray,    # (L, 2*f_pad) preemph_dft_bases main operand;
    #                        its dtype (f32/bf16) selects the MXU dtype
    basis_prev: jnp.ndarray,  # (1, 2*f_pad) predecessor-sample row (f32)
    mel_b: jnp.ndarray,    # (F, M) mel filterbank
    hop: int,
    n_frames: int,
    frame_lens: jnp.ndarray,  # (B,) valid frame counts
) -> jnp.ndarray:
    """(B, Ts) raw audio -> (B, n_frames, M) masked log-mel, fused on-chip."""
    B, Ts = x.shape
    L = basis.shape[0]
    n_sub = L // hop
    assert n_sub >= 1, f"window {L} shorter than hop {hop}"
    F, M = mel_b.shape
    f_pad = _round_up(F, LANE)

    t_tile = min(T_TILE, _round_up(n_frames, 8))
    n_tiles = -(-n_frames // t_tile)
    t_total = n_tiles * t_tile
    # back-pad so view n_sub-1 of the last tile stays in bounds
    n_rows = t_total + n_sub
    need = n_rows * hop
    keep = min(Ts, need)
    z = jnp.pad(x[:, :keep], ((0, 0), (0, need - keep)))
    zr = z.reshape(B, n_rows, hop)
    # n_sub shifted views (n_sub, B, t_total, hop), cast to the basis
    # dtype (bf16 on TPU halves this HBM temp — the kernel's dominant
    # traffic); one fused XLA slice+cast+stack. The per-frame preemphasis
    # predecessor sample (the last lane of the PREVIOUS row; zero for
    # frame 0) rides along as a (B, t_total, 1) column extracted by the
    # same fusion.
    xs = jnp.stack([zr[:, j : j + t_total] for j in range(n_sub)],
                   axis=0).astype(basis.dtype)
    prev = jnp.pad(zr[:, : t_total - 1, hop - 1], ((0, 0), (1, 0)))
    prev = prev[..., None].astype(basis.dtype)

    melp = jnp.pad(mel_b, ((0, f_pad - F), (0, 0)))
    flens = frame_lens.astype(jnp.int32).reshape(B, 1)

    out = pl.pallas_call(
        functools.partial(_kernel, n_sub=n_sub, t_tile=t_tile),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # flens: whole (B,1)
            pl.BlockSpec((n_sub, 1, t_tile, hop),
                         lambda b, t: (0, b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_tile, 1), lambda b, t: (b, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_tile, M), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, t_total, M), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_total * (2 * L + M) * f_pad,
            bytes_accessed=B * need * 4 + B * t_total * M * 4,
            transcendentals=B * t_total * M,
        ),
    )(flens, xs, prev, basis, basis_prev, melp)
    return out[:, :n_frames]
