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
