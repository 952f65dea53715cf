"""Pipeline-parallel tests: staged block pipeline vs sequential reference
(SURVEY.md §2c PP row) on the 8 fake devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from pytorch_end2end_speech_recognition_tpu.models.encoders import (
    TransformerBlock,
)
from pytorch_end2end_speech_recognition_tpu.parallel.mesh import make_mesh
from pytorch_end2end_speech_recognition_tpu.parallel.pp import (
    pipeline_apply,
    pipeline_blocks,
)
from pytorch_end2end_speech_recognition_tpu.utils.config import ModelConfig


def test_pipeline_apply_matches_sequential(rng):
    """4-stage linear pipeline == sequential matmul chain, values + grads."""
    mesh = make_mesh(dp=2, tp=4)
    S, D, B = 4, 16, 8
    Ws = jnp.asarray(rng.standard_normal((S, D, D)).astype(np.float32) * 0.3)
    x = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))

    def fn(W, h):
        return jnp.tanh(h @ W)

    def seq(Ws, x):
        for s in range(S):
            x = fn(Ws[s], x)
        return x

    ref = seq(Ws, x)
    out = pipeline_apply(mesh, "model", fn, Ws, x, n_micro=4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5,
                               atol=1e-6)

    g_ref = jax.grad(lambda W: jnp.sum(seq(W, x) ** 2))(Ws)
    g_pp = jax.jit(jax.grad(lambda W: jnp.sum(
        pipeline_apply(mesh, "model", fn, W, x, n_micro=4) ** 2)))(Ws)
    np.testing.assert_allclose(np.asarray(g_pp), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("layers,stages,relative", [
    (4, 4, False), (8, 4, False), (4, 4, True)])
def test_pipeline_blocks_matches_sequential(layers, stages, relative, rng):
    cfg = ModelConfig(encoder_dim=32, encoder_ffn_dim=64, encoder_heads=4,
                      dtype="float32",
                      pos_encoding="relative" if relative else "absolute",
                      encoder_dropout=0.0)
    rngs = nnx.Rngs(0)
    blocks = [TransformerBlock(cfg, rngs, relative=relative)
              for _ in range(layers)]
    B, T, D = 8, 24, 32
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    mask = jnp.asarray(
        np.arange(T)[None, :] < np.asarray([24, 20, 24, 10, 24, 24, 5, 24])
        [:, None]
    )
    biases = None
    if relative:
        from pytorch_end2end_speech_recognition_tpu.models.encoders import (
            RelPosBias,
        )
        biases = RelPosBias(layers, cfg.encoder_heads, rngs)(T)
    ref = x
    for i, b in enumerate(blocks):
        ref = b(ref, mask, bias=biases[i] if relative else None)
    mesh = make_mesh(dp=2, tp=stages)
    out = pipeline_blocks(mesh, "model", blocks, x, mask, n_micro=4,
                          biases=biases)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4,
                               atol=2e-5)


@pytest.mark.slow
def test_encoder_pp_from_config_matches_plain(rng):
    """VERDICT r1 item 8: PP reachable from config alone — a conformer
    encoder with cfg.pp_stages=4 over the (data=2, model=4) mesh must equal
    the plain encoder (values AND grads)."""
    import jax

    from pytorch_end2end_speech_recognition_tpu.models.encoders import (
        build_encoder,
    )

    def cfg(pp):
        return ModelConfig(
            encoder="conformer", encoder_layers=4, encoder_dim=32,
            encoder_ffn_dim=64, encoder_heads=4, dtype="float32",
            pos_encoding="relative", encoder_dropout=0.0,
            pp_stages=pp, pp_microbatches=4,
        )

    mesh = make_mesh(dp=2, tp=4)
    x = jnp.asarray(rng.standard_normal((8, 180, 80)).astype(np.float32))
    lens = jnp.asarray([180, 100, 180, 60, 180, 180, 30, 180])

    plain = build_encoder(80, cfg(1), nnx.Rngs(0))
    pp = build_encoder(80, cfg(4), nnx.Rngs(0), mesh=mesh)
    y_ref, l_ref = plain(x, lens)
    y_pp, l_pp = jax.jit(lambda x, l: pp(x, l))(x, lens)
    assert (np.asarray(l_pp) == np.asarray(l_ref)).all()
    np.testing.assert_allclose(np.asarray(y_pp), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)

    # grads through the pipelined train path match the sequential path
    gd_ref, st_ref = nnx.split(plain)
    gd_pp, st_pp = nnx.split(pp)

    def loss(gd):
        def inner(state, model_x):
            m = nnx.merge(gd, state)
            y, _ = m(model_x, lens, train=True)
            return jnp.sum(y ** 2)
        return inner

    g_ref = jax.grad(loss(gd_ref))(st_ref, x)
    g_pp = jax.jit(jax.grad(loss(gd_pp)))(st_pp, x)
    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    pp_leaves = jax.tree_util.tree_leaves(g_pp)
    assert len(ref_leaves) == len(pp_leaves)
    for a, b in zip(ref_leaves, pp_leaves):
        # f32 reduction order differs between the microbatched pipeline and
        # the sequential pass, and ALSO with XLA:CPU's thread count (under
        # the default 2-worker xdist run each worker sees fewer threads,
        # shifting sums by ~1e-3 relative — observed flake at rtol=5e-4
        # that passes serially). Keep headroom above that noise floor.
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-3, atol=3e-4)


def test_encoder_pp_stage_mismatch_raises(rng):
    from pytorch_end2end_speech_recognition_tpu.models.encoders import (
        build_encoder,
    )

    cfg = ModelConfig(encoder="transformer", encoder_layers=4,
                      encoder_dim=32, encoder_ffn_dim=64, encoder_heads=4,
                      dtype="float32", pp_stages=2)
    enc = build_encoder(80, cfg, nnx.Rngs(0), mesh=make_mesh(dp=2, tp=4))
    x = jnp.zeros((4, 40, 80), jnp.float32)
    with pytest.raises(ValueError, match="pp_stages"):
        enc(x, jnp.asarray([40, 40, 40, 40]))
