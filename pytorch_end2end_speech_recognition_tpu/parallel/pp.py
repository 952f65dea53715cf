"""Pipeline parallelism: GPipe-style microbatched stage pipeline over a mesh
axis (SURVEY.md §2c PP row — "stage encoder layers across mesh axis w/
microbatching").

Design (scaling-book recipe, SPMD form):
- The encoder's N identical blocks are split into S stages of N/S layers.
  Per-layer parameter states are stacked on a leading stage axis and sharded
  over the mesh axis, so each device holds only its stage's weights.
- Inside `shard_map`, every step each stage applies its layers to the
  activation in flight and `ppermute`s the result to the next stage; stage 0
  injects microbatch t, stage S-1 collects microbatch t-S+1. Total steps
  M + S - 1 (bubble fraction (S-1)/(M+S-1)).
- Everything is differentiable (ppermute has a transpose), so the same code
  trains.

`pipeline_blocks` works on any list of identically-structured nnx modules
whose __call__ is (x, mask, train, rng) -> x (TransformerBlock,
ConformerBlock).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import nnx
from jax.sharding import PartitionSpec as P


def stack_block_params(blocks):
    """[identical-structure modules] -> (graphdef, stacked state pytree)."""
    graphdef, state0 = nnx.split(blocks[0])
    states = [nnx.split(b)[1] for b in blocks]
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *states
    )
    return graphdef, stacked


def pipeline_apply(
    mesh, axis: str, fn, stage_params, x: jnp.ndarray, n_micro: int,
):
    """Run `fn(params_slice, x_micro) -> y_micro` as an S-stage pipeline.

    stage_params: pytree with leading stage axis of size S (== mesh axis
    size), sharded over `axis`. x: (B, ...) with B divisible by n_micro.
    """
    from jax import shard_map

    S = mesh.shape[axis]
    B = x.shape[0]
    assert B % n_micro == 0, (B, n_micro)
    xm = x.reshape((n_micro, B // n_micro) + x.shape[1:])
    M = n_micro
    perm = [(i, (i + 1) % S) for i in range(S)]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis),) + (P(),),
        out_specs=P(),
        check_vma=False,
    )
    def run(params_local, xm):
        params_local = jax.tree_util.tree_map(lambda p: p[0], params_local)
        sid = jax.lax.axis_index(axis)
        is_first = sid == 0
        is_last = sid == S - 1

        def step(carry, t):
            cur, out = carry
            inject = xm[jnp.clip(t, 0, M - 1)]
            x_in = jnp.where(is_first, inject, cur)
            y = fn(params_local, x_in)
            nxt = jax.lax.ppermute(y, axis, perm)
            out_t = t - (S - 1)
            write = is_last & (out_t >= 0) & (out_t < M)
            idx = jnp.clip(out_t, 0, M - 1)
            out = out.at[idx].set(
                jnp.where(write, y, out[idx])
            )
            return (nxt, out), None

        cur0 = jnp.zeros_like(xm[0])
        out0 = jnp.zeros_like(xm)
        (cur, out), _ = jax.lax.scan(
            step, (cur0, out0), jnp.arange(M + S - 1)
        )
        # result lives on the last stage; broadcast via masked psum
        out = jnp.where(is_last, out, 0.0)
        return jax.lax.psum(out, axis)

    ym = run(stage_params, xm)
    return ym.reshape(x.shape)


def pipeline_blocks(
    mesh, axis: str, blocks, x, mask, n_micro: int,
    train: bool = False, rng=None, biases=None,
):
    """Apply a list of blocks as a pipeline over `axis`.

    len(blocks) must divide by the axis size; each stage applies
    len(blocks)/S consecutive blocks. mask is replicated (closure).
    `biases` (optional): per-layer attention bias stack (N, 1, H, T, T)
    from the encoder's RelPosBias — threaded alongside the layer params so
    relative-PE blocks pipeline correctly.
    """
    S = mesh.shape[axis]
    N = len(blocks)
    assert N % S == 0, f"{N} blocks not divisible by {S} stages"
    per = N // S
    # group layers per stage: stage s applies blocks [s*per, (s+1)*per)
    graphdef, _ = nnx.split(blocks[0])
    # stack states twice: (S, per, ...)
    stage_states = []
    for s in range(S):
        states = [nnx.split(b)[1] for b in blocks[s * per : (s + 1) * per]]
        st = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs, axis=0), *states
        )
        bs = (biases[s * per : (s + 1) * per] if biases is not None
              else jnp.zeros((per, 1, 1, 1, 1), x.dtype))
        stage_states.append((st, bs))
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs, axis=0), *stage_states
    )

    # microbatch the mask alongside x via closure-split
    B = x.shape[0]
    mm = mask.reshape((n_micro, B // n_micro) + mask.shape[1:])

    def fn(params_per_layer, xi):
        # xi carries its microbatch index in channel? No — mask must align
        # with the microbatch. We fold the mask into the activation by
        # concatenating it as an extra feature plane.
        x_part = xi[..., :-1]
        m_part = xi[..., -1] > 0.5

        def apply_layer(h, layer_state):
            state, bias = layer_state
            block = nnx.merge(graphdef, state)
            bb = bias if biases is not None else None
            return block(h, m_part, train, bias=bb), None

        h, _ = jax.lax.scan(apply_layer, x_part, params_per_layer)
        return jnp.concatenate([h, xi[..., -1:]], axis=-1)

    x_aug = jnp.concatenate(
        [x, mask.astype(x.dtype)[..., None]], axis=-1
    )
    y_aug = pipeline_apply(mesh, axis, fn, stacked, x_aug, n_micro)
    return y_aug[..., :-1]
