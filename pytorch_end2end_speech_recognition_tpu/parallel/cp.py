"""Context parallelism for long-audio self-attention (SURVEY.md §2c CP row,
§5.7): shard the encoder TIME axis across the mesh.

Two modes, selected per head-count vs mesh-size (SURVEY.md §2c):

- `ring_attention`: blockwise flash-style attention; each device holds a
  time shard of Q and rotates K/V shards around the ring with
  `lax.ppermute` (ICI neighbor exchange), accumulating the softmax online
  (running max + denominator). Works for any head count.
- `ulysses_attention`: `all_to_all` re-shard time<->heads, full attention
  locally over the whole sequence for heads/P heads, re-shard back.
  Requires heads % axis_size == 0.

Both are written against `shard_map` with a named mesh axis and verified
equal to single-device full attention in tests (8 fake CPU devices).
The reference genre has nothing comparable (NCCL DP only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

NEG_INF = -1e30


def _block_attend(q, k, v, mask_kv, bias=None):
    """One block pair: returns (unnormalized out, running max, denom).

    q: (B, Tq, H, D); k/v: (B, Tk, H, D); mask_kv: (B, Tk) validity of keys.
    """
    scale = q.shape[-1] ** -0.5
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if bias is not None:
        s = s + bias
    s = jnp.where(mask_kv[:, None, None, :], s, NEG_INF)
    m = jnp.max(s, axis=-1)                                   # (B,H,Tq)
    p = jnp.exp(s - m[..., None])
    p = jnp.where(mask_kv[:, None, None, :], p, 0.0)
    denom = jnp.sum(p, axis=-1)                               # (B,H,Tq)
    out = jnp.einsum("bhqk,bkhd->bqhd", p, v,
                     preferred_element_type=jnp.float32)
    return out, m, denom


def ring_attention(q, k, v, mask, axis_name: str, bias_diag=None):
    """Flash-style ring attention inside shard_map.

    All of q/k/v are the local time shard (B, T_loc, H, D); mask (B, T_loc)
    marks valid key positions of the local shard. Returns (B, T_loc, H, D).

    `bias_diag` (H, 2T-1, replicated) carries a Toeplitz relative-position
    bias: each ring step expands ONLY its local (T_loc, T_loc) block from
    the diagonals at the correct global (q, k) offsets — relative PE thus
    composes with CP without ever materializing (H, T, T)
    (VERDICT r1 item 7)."""
    n = jax.lax.psum(1, axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]
    me = jax.lax.axis_index(axis_name)
    T_loc = q.shape[1]

    def step(carry, s):
        (k_cur, v_cur, mask_cur, out, m_run, d_run) = carry
        bias = None
        if bias_diag is not None:
            from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (  # noqa: E501
                toeplitz_expand,
            )

            src = (me - s) % n  # ring rotates i -> i+1: current block origin
            bias = toeplitz_expand(
                bias_diag, T_loc, T_loc,
                qoff=me * T_loc, koff=src * T_loc,
            )[None].astype(jnp.float32)
        blk_out, blk_m, blk_d = _block_attend(q, k_cur, v_cur, mask_cur,
                                              bias=bias)
        m_new = jnp.maximum(m_run, blk_m)
        alpha = jnp.exp(m_run - m_new)          # rescale old accumulators
        beta = jnp.exp(blk_m - m_new)
        out = out * alpha[..., None].swapaxes(1, 2) + (
            blk_out * beta[..., None].swapaxes(1, 2)
        )
        d_new = d_run * alpha + blk_d * beta
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        mask_nxt = jax.lax.ppermute(mask_cur, axis_name, perm)
        return (k_nxt, v_nxt, mask_nxt, out, m_new, d_new), None

    B, Tq, H, D = q.shape
    init = (
        k, v, mask,
        jnp.zeros((B, Tq, H, D), jnp.float32),
        jnp.full((B, H, Tq), NEG_INF),
        jnp.zeros((B, H, Tq)),
    )
    (_, _, _, out, m_run, d_run), _ = jax.lax.scan(
        step, init, jnp.arange(n)
    )
    denom = d_run.swapaxes(1, 2)[..., None]                   # (B,Tq,H,1)
    return out / jnp.maximum(denom, 1e-30)


def ulysses_attention(q, k, v, mask, axis_name: str, bias_diag=None):
    """All-to-all head<->time re-shard attention inside shard_map.

    Local shapes (B, T_loc, H, D) with H divisible by the axis size.
    Tiled all_to_all: time gathers to full length while heads split P-way;
    attention runs unsharded over the sequence for H/P heads; inverse
    all_to_all restores the time sharding. With `bias_diag` (H, 2T-1),
    each device expands the dense bias only for ITS H/P local heads —
    Ulysses materializes full-T scores for those heads anyway."""
    def to_heads(x):  # (B, T_loc, H, D) -> (B, T, H/P, D)
        return jax.lax.all_to_all(x, axis_name, split_axis=2, concat_axis=1,
                                  tiled=True)

    qh, kh, vh = to_heads(q), to_heads(k), to_heads(v)
    mask_full = jax.lax.all_gather(mask, axis_name, axis=1, tiled=True)
    bias = None
    if bias_diag is not None:
        from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (  # noqa: E501
            toeplitz_expand,
        )

        me = jax.lax.axis_index(axis_name)
        h_loc = qh.shape[2]  # local heads after the all_to_all split
        T = qh.shape[1]
        dense = toeplitz_expand(bias_diag, T, T)          # (H, T, T)
        local = jax.lax.dynamic_slice(
            dense, (me * h_loc, 0, 0), (h_loc, T, T))
        bias = local[None].astype(jnp.float32)
    out, _, d = _block_attend(qh, kh, vh, mask_full, bias=bias)
    out = out / jnp.maximum(d.swapaxes(1, 2)[..., None], 1e-30)
    return jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=2,
                              tiled=True)


def sharded_self_attention(
    mesh, q, k, v, lens, mode: str = "ring", axis: str = "model",
    bias_diag=None,
):
    """Top-level: time-sharded self-attention over a mesh axis.

    q/k/v: (B, T, H, D) global arrays; lens (B,). T must divide by the axis
    size. `bias_diag` (H, 2T-1) optionally carries a Toeplitz relative-
    position bias (RelPosBias.diags) — replicated, tiny, expanded blockwise
    inside each shard. Returns (B, T, H, D) with pad positions zeroed.
    """
    from jax import shard_map

    n = mesh.shape[axis]
    T0 = q.shape[1]
    T = -(-T0 // n) * n
    if T != T0:  # pad time to the axis size; pad keys are masked invalid
        pad = ((0, 0), (0, T - T0), (0, 0), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
        if bias_diag is not None:
            # recenter the diagonals for the padded length; edge values only
            # ever meet masked pad keys / garbage pad-query rows
            bias_diag = jnp.pad(bias_diag, ((0, 0), (T - T0, T - T0)),
                                mode="edge")
    mask = jnp.arange(T)[None, :] < lens[:, None]
    fn = ring_attention if mode == "ring" else ulysses_attention

    in_specs = [P(None, axis, None, None)] * 3 + [P(None, axis)]
    args = [q, k, v, mask]
    if bias_diag is not None:
        in_specs.append(P())  # replicated diagonals
        args.append(bias_diag)

        def run_fn(q, k, v, mask, diag):
            return fn(q, k, v, mask, axis, bias_diag=diag)
    else:
        def run_fn(q, k, v, mask):
            return fn(q, k, v, mask, axis)

    run = shard_map(
        run_fn, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=P(None, axis, None, None), check_vma=False,
    )
    out = run(*args)
    out = jnp.where(mask[:, :, None, None], out, 0.0)
    return out[:, :T0]
