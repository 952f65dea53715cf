"""Fused Pallas FFN block: LayerNorm -> fc1 -> SiLU -> dropout -> fc2 ->
residual, forward AND backward, with all intermediates resident in VMEM.

Why (r3 VERDICT weak item 3 / next-round task 6): the flagship train step
spends ~11 ms in HBM-bound LN/GLU/SiLU/dropout elementwise chains. XLA
fuses the elementwise ops *within* a pass, but each FfnBlock still runs as
LN stats pass + normalize pass + two matmuls whose (B*T, ffn_dim)
intermediates round-trip HBM in forward AND again as saved residuals in
backward. Per flagship FFN (B=32, T=750, D=256, F=1024) that is ~170 MB of
traffic against ~25 GFLOP of matmul — ~50% bandwidth-bound. This kernel
reads x once and writes out once; backward recomputes the normalized input
and activations from x (flash-attention-style recompute, same trade as
`ops/attention_pallas.py`) instead of storing them.

Semantics match models/encoders.FfnBlock exactly:
    out = x + scale * dropout(cast_rdt(W2 @ silu(W1 @ LN(x) + b1) + b2))
- LN statistics in f32 (eps matches nnx.LayerNorm), matmuls in the weight
  dtype (bf16 in production) with f32 accumulation.
- Dropout uses the TPU hardware PRNG (pltpu.prng_*), seeded per call from
  the training PRNG key + grid position; backward re-seeds identically and
  regenerates the mask instead of saving it.
- Weight grads (dW1/dW2/db/dgamma/dbeta) accumulate across row tiles in
  revisited f32 output blocks (sequential TPU grid).

Scope: weights and their f32 grad accumulators must fit VMEM — true for
the flagship (D=256, F=1024, ~4 MB); `fits_vmem()` gates larger rungs back
to the XLA path (an F-blocked 2D-grid variant is the follow-up for rung 4+).
Parallelism: the caller only routes here when the encoder is not
TP/SP-sharded (a pallas_call is opaque to GSPMD partitioning).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-6
R_TILE = 256


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def fits_vmem(D: int, F: int, budget_bytes: int = 9 * 2 ** 20) -> bool:
    """Weights (bf16) + grad accumulators (f32) + working tiles vs VMEM."""
    weights = 2 * D * F * 2
    accums = 2 * D * F * 4
    tiles = R_TILE * (2 * D + 3 * F) * 4
    return weights + accums + tiles <= budget_bytes


def _dropout_mask(shape, rate):
    """Keep-mask/(1-rate) from the hardware PRNG (caller seeded it)."""
    bits = pltpu.prng_random_bits(shape)
    # low 24 bits -> exact uniform in [0, 1) as f32; drop iff u < rate.
    # (Mosaic can't convert uint32->f32, so mask in signed space: the AND
    # keeps the value in [0, 2^24) where int32 == uint32.)
    bits = jax.lax.bitcast_convert_type(bits, jnp.int32)
    u24 = jnp.bitwise_and(bits, jnp.int32(0x00FFFFFF))
    u = u24.astype(jnp.float32) * (1.0 / (1 << 24))
    return (u >= rate).astype(jnp.float32) / (1.0 - rate)


def _ln_f32(x_f32, gamma_ref, beta_ref):
    mean = jnp.mean(x_f32, axis=1, keepdims=True)
    var = jnp.mean(jnp.square(x_f32 - mean), axis=1, keepdims=True)
    rstd = jax.lax.rsqrt(var + LN_EPS)
    xn = (x_f32 - mean) * rstd
    return xn * gamma_ref[...] + beta_ref[...], xn, mean, rstd


def _fwd_kernel(seed_ref, x_ref, gamma_ref, beta_ref, w1_ref, b1_ref,
                w2_ref, b2_ref, out_ref, *, rate, scale, rdt, wdt):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    x = x_ref[...]
    y, _, _, _ = _ln_f32(x.astype(jnp.float32), gamma_ref, beta_ref)
    h1 = jnp.dot(y.astype(wdt), w1_ref[...],
                 preferred_element_type=jnp.float32) + b1_ref[...]
    a = h1 * jax.nn.sigmoid(h1)  # silu in f32
    h2 = jnp.dot(a.astype(wdt), w2_ref[...],
                 preferred_element_type=jnp.float32) + b2_ref[...]
    h2 = h2.astype(rdt).astype(jnp.float32)  # match XLA's cast-then-drop
    if rate > 0.0:
        h2 = h2 * _dropout_mask(h2.shape, rate)
    out_ref[...] = (x.astype(jnp.float32) + scale * h2).astype(x.dtype)


def _bwd_kernel(seed_ref, x_ref, g_ref, gamma_ref, beta_ref, w1_ref, b1_ref,
                w2_ref, b2_ref,
                dx_ref, dgamma_ref, dbeta_ref, dw1_ref, db1_ref, dw2_ref,
                db2_ref, *, rate, scale, rdt, wdt):
    if rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dgamma_ref[...] = jnp.zeros_like(dgamma_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)

    x = x_ref[...]
    g = g_ref[...].astype(jnp.float32)
    # ---- recompute forward (flash-style; no saved intermediates)
    y, xn, _, rstd = _ln_f32(x.astype(jnp.float32), gamma_ref, beta_ref)
    h1 = jnp.dot(y.astype(wdt), w1_ref[...],
                 preferred_element_type=jnp.float32) + b1_ref[...]
    sig = jax.nn.sigmoid(h1)
    a = h1 * sig
    # ---- backward
    g2 = scale * g
    if rate > 0.0:
        # mask must replay in the same call order as forward's
        g2 = g2 * _dropout_mask(g2.shape, rate)
    g2w = g2.astype(wdt)
    dw2_ref[...] += jnp.dot(a.astype(wdt).T, g2w,
                            preferred_element_type=jnp.float32)
    db2_ref[...] += jnp.sum(g2, axis=0, keepdims=True)
    ga = jnp.dot(g2w, w2_ref[...].T, preferred_element_type=jnp.float32)
    gh1 = ga * (sig * (1.0 + h1 * (1.0 - sig)))  # silu'
    gh1w = gh1.astype(wdt)
    dw1_ref[...] += jnp.dot(y.astype(wdt).T, gh1w,
                            preferred_element_type=jnp.float32)
    db1_ref[...] += jnp.sum(gh1, axis=0, keepdims=True)
    gy = jnp.dot(gh1w, w1_ref[...].T, preferred_element_type=jnp.float32)
    dgamma_ref[...] += jnp.sum(gy * xn, axis=0, keepdims=True)
    dbeta_ref[...] += jnp.sum(gy, axis=0, keepdims=True)
    gxn = gy * gamma_ref[...]
    m1 = jnp.mean(gxn, axis=1, keepdims=True)
    m2 = jnp.mean(gxn * xn, axis=1, keepdims=True)
    dx_ln = rstd * (gxn - m1 - xn * m2)
    dx_ref[...] = (g + dx_ln).astype(x.dtype)


def _pad_rows(arr, R_pad):
    R = arr.shape[0]
    if R == R_pad:
        return arr
    return jnp.pad(arr, ((0, R_pad - R), (0, 0)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def ffn_fused(rate: float, scale: float, x, gamma, beta, w1, b1, w2, b2,
              seed):
    out, _ = _ffn_fwd(rate, scale, x, gamma, beta, w1, b1, w2, b2, seed)
    return out


def _common(x, w1):
    R, D = x.shape
    F = w1.shape[1]
    R_pad = _round_up(max(R, 8), R_TILE) if R > R_TILE else _round_up(
        max(R, 8), 8)
    r_tile = min(R_TILE, R_pad)
    n_tiles = R_pad // r_tile
    return R, D, F, R_pad, r_tile, n_tiles


def _ffn_fwd(rate, scale, x, gamma, beta, w1, b1, w2, b2, seed):
    R, D, F, R_pad, r_tile, n_tiles = _common(x, w1)
    wdt = w1.dtype
    rdt = x.dtype
    xp = _pad_rows(x, R_pad)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, rate=rate, scale=scale, rdt=rdt,
                          wdt=wdt),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # seed (1,)
            pl.BlockSpec((r_tile, D), lambda i: (i, 0)),  # x
            pl.BlockSpec(memory_space=pltpu.VMEM),        # gamma (1, D)
            pl.BlockSpec(memory_space=pltpu.VMEM),        # beta
            pl.BlockSpec(memory_space=pltpu.VMEM),        # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),        # b1 (1, F)
            pl.BlockSpec(memory_space=pltpu.VMEM),        # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),        # b2 (1, D)
        ],
        out_specs=pl.BlockSpec((r_tile, D), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((R_pad, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * R_pad * D * F,
            bytes_accessed=2 * R_pad * D * x.dtype.itemsize + 4 * D * F,
            transcendentals=R_pad * F,
        ),
    )(
        seed.reshape(1), xp, gamma.reshape(1, D).astype(jnp.float32),
        beta.reshape(1, D).astype(jnp.float32), w1,
        b1.reshape(1, F).astype(jnp.float32), w2,
        b2.reshape(1, D).astype(jnp.float32),
    )
    return out[:R], (x, gamma, beta, w1, b1, w2, b2, seed)


def _ffn_bwd(rate, scale, res, g):
    x, gamma, beta, w1, b1, w2, b2, seed = res
    R, D, F, R_pad, r_tile, n_tiles = _common(x, w1)
    wdt = w1.dtype
    rdt = x.dtype
    xp = _pad_rows(x, R_pad)
    gp = _pad_rows(g, R_pad)  # zero-pad: pad rows contribute 0 to dW
    dx, dgamma, dbeta, dw1, db1, dw2, db2 = pl.pallas_call(
        functools.partial(_bwd_kernel, rate=rate, scale=scale, rdt=rdt,
                          wdt=wdt),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),        # seed
            pl.BlockSpec((r_tile, D), lambda i: (i, 0)),  # x
            pl.BlockSpec((r_tile, D), lambda i: (i, 0)),  # g
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((r_tile, D), lambda i: (i, 0)),      # dx
            pl.BlockSpec((1, D), lambda i: (0, 0)),           # dgamma
            pl.BlockSpec((1, D), lambda i: (0, 0)),           # dbeta
            pl.BlockSpec((D, F), lambda i: (0, 0)),           # dw1
            pl.BlockSpec((1, F), lambda i: (0, 0)),           # db1
            pl.BlockSpec((F, D), lambda i: (0, 0)),           # dw2
            pl.BlockSpec((1, D), lambda i: (0, 0)),           # db2
        ],
        out_shape=[
            jax.ShapeDtypeStruct((R_pad, D), x.dtype),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
            jax.ShapeDtypeStruct((F, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=12 * R_pad * D * F,
            bytes_accessed=3 * R_pad * D * x.dtype.itemsize + 12 * D * F,
            transcendentals=2 * R_pad * F,
        ),
    )(
        seed.reshape(1), xp, gp, gamma.reshape(1, D).astype(jnp.float32),
        beta.reshape(1, D).astype(jnp.float32), w1,
        b1.reshape(1, F).astype(jnp.float32), w2,
        b2.reshape(1, D).astype(jnp.float32),
    )
    import numpy as np

    return (dx[:R], dgamma[0].astype(gamma.dtype),
            dbeta[0].astype(beta.dtype), dw1.astype(w1.dtype),
            db1[0].astype(b1.dtype), dw2.astype(w2.dtype),
            db2[0].astype(b2.dtype),
            np.zeros(seed.shape, dtype=jax.dtypes.float0))  # int arg


ffn_fused.defvjp(_ffn_fwd, _ffn_bwd)


def ffn_block_fused(x, gamma, beta, w1, b1, w2, b2, *, rate: float,
                    scale: float, rng=None):
    """(B, T, D) wrapper: flatten rows, derive the PRNG seed, run fused.

    rate is applied only when an rng key is given (train mode)."""
    B, T, D = x.shape
    use_rate = float(rate) if (rng is not None and rate > 0.0) else 0.0
    seed = (
        jax.random.randint(rng, (), 0, jnp.iinfo(jnp.int32).max,
                           dtype=jnp.int32)
        if use_rate > 0.0 else jnp.zeros((), jnp.int32)
    )
    out = ffn_fused(use_rate, float(scale), x.reshape(B * T, D), gamma,
                    beta, w1, b1, w2, b2, seed)
    return out.reshape(B, T, D)
