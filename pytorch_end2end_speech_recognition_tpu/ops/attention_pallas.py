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
        if bias is not None and bias.shape[-1] != Tp:
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
                sm_scale, has_bias, heads):
    """Backward for one batch row, all heads: recompute p, then
    dv = p^T g, dp = g v^T, ds = p*(dp - rowsum(dp*p)),
    dq = ds k * scale, dk = ds^T (q*scale), dbias_h = sum_b ds.

    r5 layout fix (r4 VERDICT next-round task 1b): the r4 version split
    heads in XLA to (H, B, Tp, Dh) operands/outputs, and the surrounding
    transposes cost ~3.6 ms/step of "data formatting" at the flagship
    shape. Like the forward `_kernel`, heads are now STATIC lane slices of
    the natural full-D (B, Tp, D) blocks — Mosaic only rejects *dynamic*
    non-128-aligned lane offsets — so q/k/v/g stream in and dq/dk/dv
    stream out in the model's layout with zero XLA transposes.
    grid = (B,); dbias accumulates in its whole-resident f32 block
    (constant index map), initialized at b == 0.
    """
    b = pl.program_id(0)
    Tp = q_ref.shape[1]
    Dh = q_ref.shape[2] // heads
    L = lens_ref[b, 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (Tp, Tp), 1)
    qs = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    if has_bias:
        @pl.when(b == 0)
        def _():
            dbias_ref[...] = jnp.zeros_like(dbias_ref)

    for h in range(heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        gh = g_ref[0, :, sl]
        s = jax.lax.dot_general(
            qs[:, sl], kh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        if has_bias:
            s = s + bias_ref[h].astype(jnp.float32)
        s = jnp.where(col < L, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        p = e / den                                   # (Tp, Tp) f32
        pc = p.astype(vh.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pc, gh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            gh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsc = ds.astype(q_ref.dtype)
        dq_ref[0, :, sl] = (jax.lax.dot_general(
            dsc, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32
        ) * sm_scale).astype(dq_ref.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            dsc, qs[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        if has_bias:
            dbias_ref[h] += ds


def _bwd_kernel_headsplit(lens_ref, q_ref, k_ref, v_ref, g_ref, bias_ref,
                          dq_ref, dk_ref, dv_ref, dbias_ref, *,
                          sm_scale, has_bias):
    """r4-style backward for one (head, batch-row) with XLA-side head
    split. Kept as the fallback for shapes whose whole-resident f32 dbias
    (heads * Tp^2 * 4 B) exceeds the ~16 MB scoped-VMEM budget of the
    layout-preserving kernel below (e.g. rung-4's H=8, Tp=768 -> 18.9 MB;
    the flagship H=4 -> 9.4 MB runs the fast path)."""
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
    p = e / den
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


def _attention_bwd_headsplit(q, k, v, bias, lens, g, heads, Tp, has_bias,
                             bias_in):
    B, _, D = q.shape
    Dh = D // heads

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
        functools.partial(_bwd_kernel_headsplit, sm_scale=1.0 / (Dh ** 0.5),
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
    )(lens.astype(jnp.int32).reshape(B, 1), split(q), split(k), split(v),
      split(g), bias_in)

    def merge(x):
        return x.transpose(1, 2, 0, 3).reshape(B, Tp, D)

    return merge(dq), merge(dk), merge(dv), dbias


def _attention_bwd_pallas(q, k, v, bias, lens, g, heads: int):
    B, T, D = q.shape
    Dh = D // heads
    Tp = _round_up(T, LANE)
    pre_padded = bias is not None and bias.shape[-1] == Tp != T
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v, g = (jnp.pad(a, pad) for a in (q, k, v, g))
        if bias is not None and not pre_padded:
            bias = jnp.pad(bias, ((0, 0), (0, Tp - T), (0, Tp - T)))
    has_bias = bias is not None
    bias_in = bias if has_bias else jnp.zeros((1, 8, LANE), q.dtype)
    if has_bias and heads * Tp * Tp * 4 > 12 * 2 ** 20:
        dq, dk, dv, dbias = _attention_bwd_headsplit(
            q, k, v, bias, lens, g, heads, Tp, has_bias, bias_in)

        def crop2(x, ref):
            return x[:, :T].astype(ref.dtype)

        if pre_padded:
            dbias_out = dbias.astype(bias.dtype)
        else:
            dbias_out = dbias[:, :T, :T].astype(bias.dtype)
        return crop2(dq, q), crop2(dk, k), crop2(dv, v), dbias_out

    qkv_spec = pl.BlockSpec((1, Tp, D), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec(bias_in.shape, lambda b: (0, 0, 0),
                             memory_space=pltpu.VMEM)
    dbias_shape = (heads, Tp, Tp) if has_bias else (1, 8, LANE)
    dq, dk, dv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, sm_scale=1.0 / (Dh ** 0.5),
                          has_bias=has_bias, heads=heads),
        grid=(B,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            qkv_spec, qkv_spec, qkv_spec, qkv_spec, bias_spec,
        ],
        out_specs=(
            qkv_spec, qkv_spec, qkv_spec,
            pl.BlockSpec(dbias_shape, lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, Tp, D), q.dtype),
            jax.ShapeDtypeStruct((B, Tp, D), k.dtype),
            jax.ShapeDtypeStruct((B, Tp, D), v.dtype),
            jax.ShapeDtypeStruct(dbias_shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=10 * B * heads * Tp * Tp * Dh,
            bytes_accessed=8 * B * Tp * D * q.dtype.itemsize,
            transcendentals=B * heads * Tp * Tp,
        ),
    )(lens.astype(jnp.int32).reshape(B, 1), q, k, v, g, bias_in)

    def crop(x, ref):
        return x[:, :T].astype(ref.dtype)

    if not has_bias:
        dbias_out = None
    elif pre_padded:  # cotangent must match the (H, Tp, Tp) bias shape
        dbias_out = dbias.astype(bias.dtype)
    else:
        dbias_out = dbias[:, :T, :T].astype(bias.dtype)
    return crop(dq, q), crop(dk, k), crop(dv, v), dbias_out


def toeplitz_expand(diag: jnp.ndarray, Tq: int, Tk: int, qoff=0, koff=0,
                    T: int | None = None) -> jnp.ndarray:
    """Expand relative-position diagonals (H, 2T-1) into a dense bias block
    (H, Tq, Tk) with block[h, i, j] = diag[h, (T-1) + (koff+j) - (qoff+i)].

    The expansion is the pad+tile+reshape relayout (no (T, T) gather, see
    RelPosBias.__call__); qoff/koff may be traced scalars — CP shards and
    q-block kernels carve their local block out of one shared diagonal
    vector instead of materializing (H, T, T) in HBM."""
    H, two_t1 = diag.shape
    T = (two_t1 + 1) // 2 if T is None else T
    start = (T - 1) - (Tq - 1) + koff - qoff
    w = jax.lax.dynamic_slice(diag, (0, start), (H, Tq + Tk - 1))
    wp = jnp.pad(w, ((0, 0), (0, 1)))                    # (H, Tq+Tk)
    flat = jnp.tile(wp, (1, Tq))[:, : Tq * (Tq + Tk - 1)]
    return flat.reshape(H, Tq, Tq + Tk - 1)[:, :, Tq - 1 : Tq - 1 + Tk]


def _toep_expand_kernel(diag_ref, out_ref):
    """(1, 2Tp) f32 diagonals -> (1, Tp, Tp) dense Toeplitz block.
    out[i, j] = diag[(Tp-1) + j - i], built with ONE hardware strided roll
    (row i shifts by i lanes) — the HLO pad+tile+odd-width-reshape version
    of this relayout costs ~6 ms/step at the flagship shape because the VPU
    hates the 2T-1 stride; this kernel streams at HBM speed."""
    Tp = out_ref.shape[1]
    W = diag_ref.shape[2]                                  # 2*Tp
    base = jnp.broadcast_to(diag_ref[0], (Tp, W))
    blk = pltpu.roll(base, W - (Tp - 1), 1, stride=1, stride_axis=0)
    out_ref[0] = blk[:, :Tp].astype(out_ref.dtype)


def _toep_reduce_kernel(g_ref, out_ref):
    """Transpose of _toep_expand_kernel. Input is the cotangent with rows
    PRE-REVERSED by the caller (grev[i'] = g[Tp-1-i']; lax.rev doesn't
    lower on Mosaic and strides >1 crash tpu.dynamic_rotate, so the flip
    rides the XLA side). The same stride-1 roll as the forward then aligns
    every diagonal into a column: rolled row i' holds g[i, (j + i) mod W]
    with i = Tp-1-i', so out[j] = sum_i g[i, i + j] (j mod 2Tp) — the
    per-diagonal sums, no scatter-add."""
    Tp = g_ref.shape[1]
    W = 2 * Tp
    gp = jnp.concatenate(
        [g_ref[0].astype(jnp.float32), jnp.zeros((Tp, Tp), jnp.float32)],
        axis=1)                                            # (Tp, 2Tp)
    rolled = pltpu.roll(gp, W - (Tp - 1), 1, stride=1, stride_axis=0)
    out_ref[0] = jnp.sum(rolled, axis=0, keepdims=True)


def _toeplitz_dense_hlo(diag, T: int, pad_to: int, dtype):
    N = diag.shape[0]
    out = toeplitz_expand(diag, T, T).astype(dtype)
    if pad_to != T:
        out = jnp.pad(out, ((0, 0), (0, pad_to - T), (0, pad_to - T)))
    return out


def _toeplitz_reduce_hlo(g, T: int):
    """HLO per-diagonal sums of g (N, T, T): dd[(T-1)+j-i] += g[i, j].
    Positive diagonals via the widening-reshape shift (row r moves LEFT by
    r), negative via the same on g^T; both are streaming relayouts."""
    N = g.shape[0]
    g = g.astype(jnp.float32)

    def diag_sums(x):  # (N, T, T) -> (N, T) with out[c] = sum_r x[r, r+c]
        xp = jnp.pad(x, ((0, 0), (0, 0), (0, T)))          # (N, T, 2T)
        flat = jnp.concatenate(
            [xp.reshape(N, -1), jnp.zeros((N, T), jnp.float32)], axis=1)
        return jnp.sum(flat.reshape(N, T, 2 * T + 1), axis=1)[:, :T]

    pos = diag_sums(g)                                     # j - i = c >= 0
    neg = diag_sums(g.swapaxes(1, 2))                      # i - j = c >= 0
    return jnp.concatenate([neg[:, 1:][:, ::-1], pos], axis=1)  # (N, 2T-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def toeplitz_dense(diag, T: int, pad_to: int, dtype):
    """Expand rel-position diagonals (N, 2T-1) into dense bias blocks
    (N, pad_to, pad_to) with out[n, i, j] = diag[n, (T-1) + j - i] for
    i, j < T and edge values in the pad band (masked away downstream).
    Forward AND backward are single-roll Pallas kernels on TPU (the HLO
    relayout pair was ~6 ms/step on the flagship train step); streaming
    HLO reshapes elsewhere. Grads flow to `diag`."""
    if jax.default_backend() in ("cpu",):
        return _toeplitz_dense_hlo(diag, T, pad_to, dtype)
    N = diag.shape[0]
    Tp = pad_to
    dpad = jnp.pad(diag.astype(jnp.float32),
                   ((0, 0), (Tp - T, Tp - T + 1)), mode="edge")  # (N, 2Tp)
    return pl.pallas_call(
        _toep_expand_kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, 1, 2 * Tp), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, Tp, Tp), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Tp, Tp), dtype),
        cost_estimate=pl.CostEstimate(
            flops=0,
            bytes_accessed=N * Tp * Tp * jnp.dtype(dtype).itemsize,
            transcendentals=0,
        ),
    )(dpad[:, None])


def _toeplitz_dense_fwd(diag, T, pad_to, dtype):
    # residual: a 0-size array carrying only diag's dtype for the cotangent
    return toeplitz_dense(diag, T, pad_to, dtype), jnp.zeros((0,), diag.dtype)


def _toeplitz_dense_bwd(T, pad_to, dtype, res, g):
    diag_dtype = res.dtype
    if jax.default_backend() in ("cpu",):
        dd = _toeplitz_reduce_hlo(g[:, :T, :T], T)
        return (dd.astype(diag_dtype),)
    N, Tp = g.shape[0], pad_to
    s = pl.pallas_call(
        _toep_reduce_kernel,
        grid=(N,),
        in_specs=[pl.BlockSpec((1, Tp, Tp), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, 2 * Tp), lambda n: (n, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 1, 2 * Tp), jnp.float32),
    )(g[:, ::-1])[:, 0]
    # s[n, c] = diagonal (j - i) = c of g[n] (c mod 2Tp); recenter at Tp-1
    # then cut the (2T-1) window that maps back onto the input diagonals.
    dd = jnp.roll(s, Tp - 1, axis=1)[:, Tp - T: Tp - T + 2 * T - 1]
    return (dd.astype(diag_dtype),)


toeplitz_dense.defvjp(_toeplitz_dense_fwd, _toeplitz_dense_bwd)


def _flash_kernel(lens_ref, q_ref, k_ref, v_ref, diag_ref, o_ref, *,
                  sm_scale, has_bias, heads, bq):
    """Long-T attention: one (batch row, query block), all heads, K/V rows
    whole in VMEM. Scores materialize as (bq, Tp) f32 blocks only — the
    VMEM budget is ~(2*Tp*D + bq*Tp*4) bytes, good to T≈4k at D=256 where
    the whole-row kernel (resident (Tp, Tp)) caps at 768. Single-pass
    softmax per row block (all keys visible), no online rescaling."""
    qi = pl.program_id(1)
    Tp = k_ref.shape[1]
    Dh = q_ref.shape[2] // heads
    W = bq + Tp  # lane-aligned diagonal window per q block
    L = lens_ref[pl.program_id(0), 0]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, Tp), 1)
    key_ok = col < L
    qs = (q_ref[0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    for h in range(heads):
        sl = slice(h * Dh, (h + 1) * Dh)
        s = jax.lax.dot_general(
            qs[:, sl], k_ref[0, :, sl],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )                                             # (bq, Tp) f32
        if has_bias:
            # Toeplitz expand on-chip: row i of this q block needs
            # diag[(Tp-1) + j - (qi*bq + i)] = w_win[(bq-1) - i + j] with
            # w_win = diag[h, start : start + W]. A single hardware
            # strided roll shifts row i left by (bq-1) - i — no gather,
            # no odd-width reshape (Mosaic supports neither).
            start = pl.multiple_of(Tp - bq * (qi + 1), bq)  # lane-aligned
            w_win = diag_ref[h, pl.ds(start, W)]      # (W,) f32
            base = jnp.broadcast_to(w_win[None, :], (bq, W))
            blk = pltpu.roll(base, W - (bq - 1), 1, stride=1, stride_axis=0)
            s = s + blk[:, :Tp]
        s = jnp.where(key_ok, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m).astype(v_ref.dtype)
        den = jnp.maximum(
            jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32), 1e-30)
        o = jax.lax.dot_general(
            e, v_ref[0, :, sl],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / den).astype(o_ref.dtype)


def _flash_fwd_pallas(q, k, v, diag, lens, heads: int, bq: int = 256):
    """q-block tiled forward for T beyond the whole-row kernel's reach.
    diag: (H, 2T-1) relative-position diagonals or None."""
    B, T, D = q.shape
    Dh = D // heads
    bq = min(bq, _round_up(T, LANE))
    Tp = _round_up(T, max(bq, LANE))
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    has_bias = diag is not None
    if has_bias:
        # (H, 2Tp): one extra right pad so every q block's (bq+Tp)-wide
        # lane-aligned window load stays in bounds (see _flash_kernel)
        diag = jnp.pad(diag.astype(jnp.float32),
                       ((0, 0), (Tp - T, Tp - T + 1)), mode="edge")
    else:
        diag = jnp.zeros((1, LANE), jnp.float32)
    nq = Tp // bq
    out = pl.pallas_call(
        functools.partial(_flash_kernel, sm_scale=1.0 / (Dh ** 0.5),
                          has_bias=has_bias, heads=heads, bq=bq),
        grid=(B, nq),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),    # lens (B, 1)
            pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0),
                         memory_space=pltpu.VMEM),
            # K/V rows whole; index constant in qi -> resident per b sweep
            pl.BlockSpec((1, Tp, D), lambda b, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, D), lambda b, qi: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(diag.shape, lambda b, qi: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, D), lambda b, qi: (b, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, D), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * heads * Tp * Tp * Dh,
            bytes_accessed=(2 * B * Tp * D * (Tp // bq) + 2 * B * Tp * D)
            * q.dtype.itemsize,
            transcendentals=B * heads * Tp * Tp,
        ),
    )(lens.astype(jnp.int32).reshape(B, 1), q, k, v, diag)
    return out[:, :T]


def _flash_bwd_kernel(lens_ref, q_ref, k_ref, v_ref, g_ref, diag_ref,
                      dq_ref, dk_ref, dv_ref, ddiag_ref, *,
                      sm_scale, has_bias, bq):
    """Backward for one (head, batch row, query block): recompute p exactly
    as _flash_kernel, then dv/dk accumulate across the q-block sweep in
    their resident f32 output blocks (index depends only on (h, b); qi is
    the innermost grid dim), dq writes its own block, and the Toeplitz
    rel-bias grad reduces on-chip.

    ddiag reduce without lax.rev / negative-stride rolls (Mosaic supports
    neither; strides>8 also miscompile tpu.dynamic_rotate — probed on TPU
    v5e): row-reverse ds with a one-hot anti-identity MATMUL (bq^2*Tp f32
    MACs, ~25% of the kernel's 5 attention matmuls at bq=128/Dh=64), then
    the same stride-1 roll as the forward expand aligns every bias diagonal
    into a column: rolled[i', c] = ds_rev[i', c - i'], so
    sum_rows[c] = sum_i ds[i, c - (bq-1) + i] — exactly the adjoint of
    blk[i, j] = w_win[(bq-1) - i + j]. Each q block accumulates its window
    into the per-(h, b) ddiag row at the same lane offset the forward
    window was sliced from."""
    qi = pl.program_id(2)
    Tp = k_ref.shape[2]
    W = bq + Tp
    L = lens_ref[pl.program_id(1), 0]
    qs = (q_ref[0, 0].astype(jnp.float32) * sm_scale).astype(q_ref.dtype)
    kh = k_ref[0, 0]
    vh = v_ref[0, 0]
    gh = g_ref[0, 0]
    s = jax.lax.dot_general(
        qs, kh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    start = pl.multiple_of(Tp - bq * (qi + 1), bq)
    if has_bias:
        w_win = diag_ref[0, 0, pl.ds(start, W)]
        base = jnp.broadcast_to(w_win[None, :], (bq, W))
        blk = pltpu.roll(base, W - (bq - 1), 1, stride=1, stride_axis=0)
        s = s + blk[:, :Tp]
    col = jax.lax.broadcasted_iota(jnp.int32, (bq, Tp), 1)
    s = jnp.where(col < L, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / den                                           # (bq, Tp) f32
    pc = p.astype(vh.dtype)
    dp = jax.lax.dot_general(
        gh, vh, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsc = ds.astype(q_ref.dtype)
    dq_ref[0, 0] = (jax.lax.dot_general(
        dsc, kh, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale).astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0, 0] = jnp.zeros_like(dk_ref[0, 0])
        dv_ref[0, 0] = jnp.zeros_like(dv_ref[0, 0])
        if has_bias:
            ddiag_ref[0, 0, 0] = jnp.zeros_like(ddiag_ref[0, 0, 0])

    dk_ref[0, 0] += jax.lax.dot_general(
        dsc, qs, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dv_ref[0, 0] += jax.lax.dot_general(
        pc, gh, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if has_bias:
        row = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 0)
        colr = jax.lax.broadcasted_iota(jnp.int32, (bq, bq), 1)
        revm = (row + colr == bq - 1).astype(jnp.float32)
        ds_rev = jax.lax.dot_general(
            revm, ds, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds_pad = jnp.concatenate(
            [ds_rev, jnp.zeros((bq, bq), jnp.float32)], axis=1)  # (bq, W)
        rolled = pltpu.roll(ds_pad, 0, 1, stride=1, stride_axis=0)
        dwin = jnp.sum(rolled, axis=0)                    # (W,)
        ddiag_ref[0, 0, 0, pl.ds(start, W)] += dwin


def _flash_bwd_pallas(q, k, v, diag, lens, g, heads: int, bq: int = 128):
    """q-block tiled Pallas backward for flash_attention (r2 VERDICT missing
    item 3): same VMEM scaling as the forward — K/V rows + (bq, Tp) score
    scratch — so long-audio TRAINING stops paying the chunked-XLA backward's
    T^2 HBM round-trips. Returns (dq, dk, dv, ddiag)."""
    B, T, D = q.shape
    Dh = D // heads
    bq = min(bq, _round_up(T, LANE))
    Tp = _round_up(T, max(bq, LANE))
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q, k, v, g = (jnp.pad(a, pad) for a in (q, k, v, g))
    has_bias = diag is not None
    if has_bias:
        # (H, 1, 2Tp): the middle singleton keeps the per-head block's last
        # two dims (1, 2Tp) legal under Mosaic's (8, 128)-divisible-or-whole
        # block rule
        diag_in = jnp.pad(diag.astype(jnp.float32),
                          ((0, 0), (Tp - T, Tp - T + 1)),
                          mode="edge")[:, None]
    else:
        diag_in = jnp.zeros((1, 1, 2 * Tp), jnp.float32)

    def split(x):  # (B, Tp, D) -> (H, B, Tp, Dh)
        return x.reshape(B, Tp, heads, Dh).transpose(2, 0, 1, 3)

    nq = Tp // bq
    blk_in = pl.BlockSpec((1, 1, bq, Dh), lambda h, b, qi: (h, b, qi, 0),
                          memory_space=pltpu.VMEM)
    row_in = pl.BlockSpec((1, 1, Tp, Dh), lambda h, b, qi: (h, b, 0, 0),
                          memory_space=pltpu.VMEM)
    diag_spec = pl.BlockSpec(
        (1, 1, diag_in.shape[2]),
        (lambda h, b, qi: (h, 0, 0)) if has_bias
        else (lambda h, b, qi: (0, 0, 0)),
        memory_space=pltpu.VMEM)
    # (H, B, 1, 2Tp): singleton third dim keeps the per-(h, b) block's
    # last two dims (1, 2Tp) legal under Mosaic's block rule
    ddiag_shape = ((heads, B, 1, 2 * Tp) if has_bias
                   else (1, 1, 1, 2 * Tp))
    ddiag_spec = pl.BlockSpec(
        (1, 1, 1, 2 * Tp),
        (lambda h, b, qi: (h, b, 0, 0)) if has_bias
        else (lambda h, b, qi: (0, 0, 0, 0)),
        memory_space=pltpu.VMEM)
    dq, dk, dv, ddiag = pl.pallas_call(
        functools.partial(_flash_bwd_kernel, sm_scale=1.0 / (Dh ** 0.5),
                          has_bias=has_bias, bq=bq),
        grid=(heads, B, nq),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  blk_in, row_in, row_in, blk_in, diag_spec],
        out_specs=(blk_in,
                   pl.BlockSpec((1, 1, Tp, Dh), lambda h, b, qi: (h, b, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 1, Tp, Dh), lambda h, b, qi: (h, b, 0, 0),
                                memory_space=pltpu.VMEM),
                   ddiag_spec),
        out_shape=(
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), q.dtype),
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), jnp.float32),
            jax.ShapeDtypeStruct((heads, B, Tp, Dh), jnp.float32),
            jax.ShapeDtypeStruct(ddiag_shape, jnp.float32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(10 + 2 * bq // Dh) * B * heads * Tp * Tp * Dh,
            bytes_accessed=8 * B * Tp * D * q.dtype.itemsize,
            transcendentals=B * heads * Tp * Tp,
        ),
    )(lens.astype(jnp.int32).reshape(B, 1), split(q), split(k), split(v),
      split(g), diag_in)

    def merge(x, ref):
        out = x.transpose(1, 2, 0, 3).reshape(B, Tp, D)[:, :T]
        return out.astype(ref.dtype)

    ddiag_out = None
    if has_bias:
        full = jnp.sum(ddiag[:, :, 0], axis=1)            # (H, 2Tp)
        off = Tp - T
        core = full[:, off: off + 2 * T - 1]
        if off:  # adjoint of the edge-mode pad: fold the bands onto edges
            core = core.at[:, 0].add(jnp.sum(full[:, :off], axis=1))
            core = core.at[:, -1].add(
                jnp.sum(full[:, off + 2 * T - 1:], axis=1))
        ddiag_out = core.astype(diag.dtype)
    return merge(dq, q), merge(dk, k), merge(dv, v), ddiag_out


def _attention_xla_chunked(q, k, v, diag, lens, heads: int, bq: int = 256,
                           g=None):
    """Long-T XLA path, lax.map over query chunks so peak memory is
    (B, H, bq, T) instead of (B, H, T, T). With g: returns grads
    (dq, dk, dv, ddiag) — the backward for the flash kernel."""
    B, T, D = q.shape
    Dh = D // heads
    Tp = _round_up(T, bq)
    if Tp != T:
        pad = ((0, 0), (0, Tp - T), (0, 0))
        q = jnp.pad(q, pad)
        if g is not None:
            g = jnp.pad(g, pad)
    kh = k.reshape(B, T, heads, Dh)
    vh = v.reshape(B, T, heads, Dh)
    key_ok = jnp.arange(T)[None, None, None, :] < lens[:, None, None, None]
    scale = 1.0 / (Dh ** 0.5)
    nq = Tp // bq
    if diag is not None and Tp != T:
        # recenter diagonals at Tp-1 so offset math matches the padded grid
        diag = jnp.pad(diag, ((0, 0), (Tp - T, Tp - T)), mode="edge")
    qc = q.reshape(B, nq, bq, D).transpose(1, 0, 2, 3)        # (nq,B,bq,D)
    gc = (g.reshape(B, nq, bq, D).transpose(1, 0, 2, 3)
          if g is not None else jnp.zeros((nq,), q.dtype))

    def chunk(args):
        qi, qblk, gblk = args
        qh = qblk.reshape(B, bq, heads, Dh)
        s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                       preferred_element_type=jnp.float32) * scale
        if diag is not None:
            s = s + toeplitz_expand(diag, bq, T, qoff=qi * bq, T=Tp)[None]
        s = jnp.where(key_ok, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        den = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
        p = e / den
        if g is None:
            o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), vh,
                           preferred_element_type=jnp.float32)
            return o.reshape(B, bq, D).astype(q.dtype)
        gh = gblk.reshape(B, bq, heads, Dh).astype(jnp.float32)
        dp = jnp.einsum("bqhd,bkhd->bhqk", gh, vh.astype(jnp.float32))
        dv = jnp.einsum("bhqk,bqhd->bkhd", p, gh)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dq = jnp.einsum("bhqk,bkhd->bqhd", ds,
                        kh.astype(jnp.float32)) * scale
        dk = jnp.einsum("bhqk,bqhd->bkhd", ds,
                        qh.astype(jnp.float32)) * scale
        # ddiag: scatter ds onto diagonals d = (T-1) + (koff+j) - (qoff+i)
        dsum = jnp.sum(ds, axis=(0,))                        # (H,bq,T)
        ddiag = jnp.zeros((heads, 2 * Tp - 1), jnp.float32)
        i_idx = jnp.arange(bq)[:, None]
        j_idx = jnp.arange(T)[None, :]
        dpos = (Tp - 1) + j_idx - (qi * bq + i_idx)          # (bq,T)
        ddiag = ddiag.at[:, dpos].add(dsum)
        return (dq.reshape(B, bq, D).astype(q.dtype), dk, dv, ddiag)

    idx = jnp.arange(nq)
    outs = jax.lax.map(chunk, (idx, qc, gc))
    if g is None:
        return outs.transpose(1, 0, 2, 3).reshape(B, Tp, D)[:, :T]
    dq, dk, dv, ddiag = outs
    dq = dq.transpose(1, 0, 2, 3).reshape(B, Tp, D)[:, :T]
    dk = jnp.sum(dk, axis=0).reshape(B, T, D).astype(k.dtype)
    dv = jnp.sum(dv, axis=0).reshape(B, T, D).astype(v.dtype)
    ddiag_out = None
    if diag is not None:
        full = jnp.sum(ddiag, axis=0)                        # (H, 2Tp-1)
        off = Tp - T
        ddiag_out = jax.lax.dynamic_slice(
            full, (0, off), (heads, 2 * T - 1)).astype(diag.dtype)
        if off:  # edge-padded positions folded onto the boundary diagonals
            edge_lo = jnp.sum(
                jax.lax.dynamic_slice(full, (0, 0), (heads, off)),
                axis=1) if off else 0.0
            edge_hi = jnp.sum(
                jax.lax.dynamic_slice(full, (0, Tp - 1 + T), (heads, off)),
                axis=1)
            ddiag_out = ddiag_out.at[:, 0].add(edge_lo.astype(diag.dtype))
            ddiag_out = ddiag_out.at[:, -1].add(edge_hi.astype(diag.dtype))
    return dq, dk, dv, ddiag_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def flash_attention(q, k, v, diag, lens, heads: int):
    """Length-masked self-attention for LONG sequences (T > 768) with an
    optional Toeplitz relative-position bias given as diagonals.

    q/k/v: (B, T, D); diag: (H, 2T-1) or None; lens: (B,) int32.
    Forward: q-block-tiled Pallas kernel on TPU (K/V rows resident in VMEM,
    scores never touch HBM); chunked XLA elsewhere. Backward: chunked XLA
    recompute with bounded (B, H, bq, T) memory; grads flow to q/k/v/diag.
    """
    if jax.default_backend() not in ("cpu",):
        return _flash_fwd_pallas(q, k, v, diag, lens, heads)
    return _attention_xla_chunked(q, k, v, diag, lens, heads)


def _flash_fwd_rule(q, k, v, diag, lens, heads):
    return flash_attention(q, k, v, diag, lens, heads), (q, k, v, diag, lens)


def _flash_bwd_rule(heads, res, g):
    q, k, v, diag, lens = res
    if jax.default_backend() not in ("cpu",):
        dq, dk, dv, ddiag = _flash_bwd_pallas(q, k, v, diag, lens, g, heads)
    else:
        dq, dk, dv, ddiag = _attention_xla_chunked(q, k, v, diag, lens,
                                                   heads, g=g)
    return dq, dk, dv, ddiag, None


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


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
