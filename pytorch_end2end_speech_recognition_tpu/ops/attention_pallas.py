"""Fused Pallas TPU self-attention for the encoder (bias + mask + softmax).

Replaces the genre's cuDNN/XLA attention on the encoder hot path
(SURVEY.md §2b; BASELINE.json:5 "encoder ... at speed-of-light per chip").

Why not streaming FlashAttention: after 4x conv subsampling, ASR encoder
sequence lengths are short (30 s of audio -> T~750). At that size one
(head, batch-row) attention instance — q/k/v rows AND the full (T, T)
score matrix — fits comfortably in VMEM, so the kernel computes

    scores = q k^T * sm_scale + rel_bias[h];  mask cols >= len;
    softmax;  out = probs @ v

entirely on-chip with ZERO HBM round-trips for the T^2 intermediates
(the XLA path writes+reads (B, H, T, T) several times — measured ~1.9 ms
per layer at B=32, T=768 vs ~0.1 ms fused). Long-audio configs beyond the
VMEM budget keep the XLA/CP paths (models/encoders.py cp_mode).

Design notes:
- q/k/v stay in the model's natural (B, T, D) layout; the per-(h, b) slice
  is carved by the BlockSpec index_map (no host-side transpose).
- grid = (H, B) with the rel-bias block index depending only on h, so
  Pallas re-uses the loaded bias block across the whole batch sweep (one
  (T, T) bias fetch per head per layer, not per batch row).
- lengths ride in SMEM; key masking is a broadcasted-iota compare in VMEM.
- backward = XLA recompute (custom VJP below): training already
  materializes T^2 in the backward today, so the bwd cost is unchanged
  while fwd (bench/decode/eval) takes the fused path. rel-bias grads flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(lens_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, sm_scale,
            has_bias, heads):
    """One batch row, all heads. Head slices are static cuts of the last
    (full-D) block dim — Mosaic requires the trailing block dim be 128-
    aligned or whole, and Dh=64 is neither."""
    Tp = q_ref.shape[1]
    Dh = q_ref.shape[2] // heads
    L = lens_ref[pl.program_id(0), 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    key_ok = col < L
    # scale q (Tp, Dh) instead of scores (Tp, Tp): one fewer big VPU pass
    qs = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    for h in range(heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            qs[:, sl], k_ref[0, :, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )                                         # (Tp, Tp) f32 in VMEM
        if has_bias:
            s = s + bias_ref[h].astype(jnp.float32)
        s = jnp.where(key_ok, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        # unnormalized probs; 1/den folds into the (Tp, Dh) OUTPUT instead
        # of a full (Tp, Tp) divide pass — the matmul saw bf16 p either way
        e = jnp.exp(s - m).astype(v_ref.dtype)    # all-masked rows -> e = 0
        den = jnp.maximum(
            jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32), 1e-30)
        o = jax.lax.dot_general(
            e, v_ref[0, :, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / den).astype(o_ref.dtype)


def _attention_fwd_pallas(q, k, v, bias, lens, heads: int):
    B, T, D = q.shape
    Dh = D // heads
    Tp = _round_up(T, LANE)
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, Tp - T), (0, Tp - T)))
    has_bias = bias is not None
    if not has_bias:  # dummy operand keeps one kernel signature
        bias = jnp.zeros((1, 8, LANE), q.dtype)

    qkv_spec = pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    # whole bias resident in VMEM; index_map constant -> fetched once for
    # the entire grid sweep
    bias_spec = pl.BlockSpec(bias.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, sm_scale=1.0 / (Dh ** 0.5),
                          has_bias=has_bias, heads=heads),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # lens (B,1), whole array
            qkv_spec, qkv_spec, qkv_spec, bias_spec,
        ],
        out_specs=pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * Tp * Tp * Dh,
            bytes_accessed=(3 * B * Tp * D + B * Tp * D) * q.dtype.itemsize
            + (heads * Tp * Tp * bias.dtype.itemsize if has_bias else 0),
            transcendentals=B * heads * Tp * Tp,
        ),
    )(lens.astype(jnp.int32).reshape(B, 1), q, k, v, bias)
    return out[:, :T]


def _bwd_kernel(lens_ref, q_ref, k_ref, v_ref, g_ref, bias_ref,
                dq_ref, dk_ref, dv_ref, dbias_ref, *,
                sm_scale, has_bias):
    """Backward for one (head, batch-row): recompute p, then
    dv = p^T g, dp = g v^T, ds = p*(dp - rowsum(dp*p)),
    dq = ds k * scale, dk = ds^T (q*scale), dbias_h = sum_b ds.

    Inputs arrive pre-split per head as (H, B, Tp, Dh) — Mosaic cannot
    prove a dynamic Dh-lane offset is 128-aligned, so the head split
    happens in XLA (cheap transposes) instead of dynamic ref slicing.
    grid = (H, B) with b innermost; dbias accumulates directly in its
    f32 output block, which stays resident for the whole batch sweep
    (its index depends only on h).
    """
    b = pl.program_id(1)
    Tp = q_ref.shape[2]
    L = lens_ref[b, 0]
    qs = (q_ref[0, 0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    kh = k_ref[0, 0]
    vh = v_ref[0, 0]
    gh = g_ref[0, 0]
    s = jax.lax.dot_general(
        qs, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if has_bias:
        s = s + bias_ref[0].astype(jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    s = jnp.where(col < L, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / den                                       # (Tp, Tp) f32
    pc = p.astype(vh.dtype)
    dv_ref[0, 0] = jax.lax.dot_general(
        pc, gh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dv_ref.dtype)
    dp = jax.lax.dot_general(
        gh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = ds.astype(q_ref.dtype)
    dq_ref[0, 0] = (jax.lax.dot_general(
        dsc, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        dsc, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(dk_ref.dtype)
    if has_bias:
        @pl.when(b == 0)
        def _():
            dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

        dbias_ref[0] += ds


def _attention_bwd_pallas(q, k, v, bias, lens, g, heads: int):
    B, T, D = q.shape
    Dh = D // heads
    Tp = _round_up(T, LANE)
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v, g = (jnp.pad(a, pad) for a in (q, k, v, g))
        if bias is not None:
            bias = jnp.pad(bias, ((0, 0), (0, Tp - T), (0, Tp - T)))
    has_bias = bias is not None
    bias_in = bias if has_bias else jnp.zeros((1, 8, LANE), q.dtype)

    def split(x):  # (B, Tp, D) -> (H, B, Tp, Dh)
        return x.reshape(B, Tp, heads, Dh).transpose(2, 0, 1, 3)

    head_in = pl.BlockSpec((1, 1, Tp, Dh), lambda h, b: (h, b, 0, 0),
                           memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(
        (1,) + bias_in.shape[1:],
        (lambda h, b: (h, 0, 0)) if has_bias else (lambda h, b: (0, 0, 0)),
        memory_space=pltpu.VMEM,
    )
    head_out = pl.BlockSpec((1, 1, Tp, Dh), lambda h, b: (h, b, 0, 0),
                            memory_space=pltpu.VMEM)
    dbias_shape = (heads, Tp, Tp) if has_bias else (1, 8, LANE)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=1.0 / (Dh ** 0.5),
                          has_bias=has_bias),
        grid=(heads, B),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            head_in, head_in, head_in, head_in, bias_spec,
        ],
        out_specs=(
            head_out, head_out, head_out,
            pl.BlockSpec((1, Tp, Tp), lambda h, b: (h, 0, 0),
                         memory_space=pltpu.VMEM)
            if has_bias else
            pl.BlockSpec(dbias_shape, lambda h, b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), k.dtype),
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), v.dtype),
            jax.ShapeDtypeStruct(dbias_shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * heads * Tp * Tp * Dh,
            bytes_accessed=8 * B * Tp * D * q.dtype.itemsize,
            transcendentals=B * heads * Tp * Tp,
        ),
    )(lens.astype(jnp.int32).reshape(B, 1), split(q), split(k), split(v),
      split(g), bias_in)

    def merge(x, ref):
        out = x.transpose(1, 2, 0, 3).reshape(B, Tp, D)[:, :T]
        return out.astype(ref.dtype)

    dbias_out = (
        dbias[:, :T, :T].astype(bias.dtype) if has_bias else None
    )
    return merge(dq, q), merge(dk, k), merge(dv, v), dbias_out


def _attention_xla(q, k, v, bias, lens, heads: int):
    """Reference math shared by the backward pass and the CPU/oracle path.
    Bit-compatible with the kernel up to reduction order."""
    B, T, D = q.shape
    Dh = D // heads
    qh = q.reshape(B, T, heads, Dh)
    kh = k.reshape(B, T, heads, Dh)
    vh = v.reshape(B, T, heads, Dh)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) / (Dh ** 0.5)
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    mask = jnp.arange(T)[None, None, None, :] < lens[:, None, None, None]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = (e / den).astype(v.dtype)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh,
                   preferred_element_type=jnp.float32)
    return o.reshape(B, T, D).astype(q.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_attention(q, k, v, bias, lens, heads: int):
    """Self-attention with additive per-head bias and length masking.

    q/k/v: (B, T, D) with D = heads * Dh; bias: (H, T, T) or None;
    lens: (B,) int32. Returns (B, T, D); keys at positions >= lens are
    never attended. Padded QUERY rows still produce (garbage) outputs —
    callers re-mask, exactly as with the XLA path. Forward runs the fused
    Pallas kernel on TPU; backward recomputes with XLA einsums (grads flow
    to q, k, v and bias).
    """
    T = q.shape[1]
    # beyond ~768 frames the resident (T, T) f32 scores + whole bias block
    # overflow the VMEM budget of this whole-row kernel (same limit as the
    # backward); long audio uses the XLA/CP paths
    if jax.default_backend() not in ("cpu",) and T <= 768:
        return _attention_fwd_pallas(q, k, v, bias, lens, heads)
    return _attention_xla(q, k, v, bias, lens, heads)


def sharded_fused_attention(mesh, q, k, v, bias, lens, heads: int):
    """fused_attention under a ('data','model') mesh via shard_map.

    Batch shards over 'data'; heads (and the per-head bias) shard over
    'model' when divisible — each device runs the single-chip kernel on its
    local (B/dp, T, H/tp·Dh) slice, which is exactly how Megatron-TP splits
    attention (heads are embarrassingly parallel given replicated
    activations-in/out projections handle the collectives). No collectives
    inside: q/k/v/bias/output grads stay shard-local.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pytorch_end2end_speech_recognition_tpu.parallel.mesh import (
        DATA_AXIS,
        MODEL_AXIS,
    )

    tp = mesh.shape[MODEL_AXIS]
    split_heads = heads % tp == 0 and (bias is None or bias.shape[0] == heads)
    h_axis = MODEL_AXIS if split_heads else None
    local_heads = heads // tp if split_heads else heads
    qkv_spec = P(DATA_AXIS, None, h_axis)
    in_specs = [qkv_spec, qkv_spec, qkv_spec]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(P(h_axis, None, None))
        args.append(bias)
    in_specs.append(P(DATA_AXIS))
    args.append(lens)

    if bias is not None:
        def local(q, k, v, b, lens):
            return fused_attention(q, k, v, b, lens, local_heads)
    else:
        def local(q, k, v, lens):
            return fused_attention(q, k, v, None, lens, local_heads)

    return shard_map(
        local, mesh=mesh, in_specs=tuple(in_specs), out_specs=qkv_spec,
        check_vma=False,
    )(*args)


def _fwd(q, k, v, bias, lens, heads):
    return fused_attention(q, k, v, bias, lens, heads), (q, k, v, bias, lens)


def _bwd(heads, res, g):
    q, k, v, bias, lens = res
    B, T, D = q.shape
    if jax.default_backend() not in ("cpu",) and T <= 768:
        dq, dk, dv, dbias = _attention_bwd_pallas(q, k, v, bias, lens, g,
                                                  heads)
        return dq, dk, dv, dbias, None
    Dh = D // heads
    qh = q.reshape(B, T, heads, Dh).astype(jnp.float32)
    kh = k.reshape(B, T, heads, Dh).astype(jnp.float32)
    vh = v.reshape(B, T, heads, Dh).astype(jnp.float32)
    gh = g.reshape(B, T, heads, Dh).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / (Dh ** 0.5)
    if bias is not None:
        s = s + bias[None].astype(jnp.float32)
    mask = jnp.arange(T)[None, None, None, :] < lens[:, None, None, None]
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / den                                        # (B,H,Tq,Tk) f32
    dp = jnp.einsum("bqhd,bkhd->bhqk", gh, vh)
    dv = jnp.einsum("bhqk,bqhd->bkhd", p, gh)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bkhd->bqhd", ds, kh) / (Dh ** 0.5)
    dk = jnp.einsum("bhqk,bqhd->bkhd", ds, qh) / (Dh ** 0.5)
    dbias = jnp.sum(ds, axis=0).astype(bias.dtype) if bias is not None else None
    return (
        dq.reshape(B, T, D).astype(q.dtype),
        dk.reshape(B, T, D).astype(k.dtype),
        dv.reshape(B, T, D).astype(v.dtype),
        dbias,
        None,
    )


fused_attention.defvjp(_fwd, _bwd)
