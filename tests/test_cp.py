"""Context-parallel attention tests: ring and Ulysses vs full attention
(SURVEY.md §4 'ring-attention vs full attention' on 8 fake devices)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_end2end_speech_recognition_tpu.parallel.cp import (
    _block_attend,
    sharded_self_attention,
)
from pytorch_end2end_speech_recognition_tpu.parallel.mesh import make_mesh


def _full_attention(q, k, v, lens):
    T = q.shape[1]
    mask = jnp.arange(T)[None, :] < lens[:, None]
    out, _, d = _block_attend(q, k, v, mask)
    out = out / jnp.maximum(d.swapaxes(1, 2)[..., None], 1e-30)
    return jnp.where(mask[:, :, None, None], out, 0.0)


@pytest.fixture(scope="module")
def qkv():
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 64, 8, 16
    mk = lambda: jnp.asarray(rng.standard_normal((B, T, H, D)).astype(
        np.float32))
    return mk(), mk(), mk(), jnp.asarray([64, 37])


@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_cp_matches_full_attention(mode, qkv):
    q, k, v, lens = qkv
    mesh = make_mesh(dp=1, tp=8)
    ref = _full_attention(q, k, v, lens)
    out = sharded_self_attention(mesh, q, k, v, lens, mode=mode, axis="model")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_cp_grads_match(mode, qkv):
    q, k, v, lens = qkv
    mesh = make_mesh(dp=1, tp=8)

    def loss_full(q):
        return jnp.sum(_full_attention(q, k, v, lens) ** 2)

    def loss_cp(q):
        return jnp.sum(
            sharded_self_attention(mesh, q, k, v, lens, mode=mode,
                                   axis="model") ** 2
        )

    g_ref = jax.grad(loss_full)(q)
    g_cp = jax.jit(jax.grad(loss_cp))(q)
    np.testing.assert_allclose(np.asarray(g_cp), np.asarray(g_ref),
                               rtol=5e-4, atol=5e-5)


def test_encoder_with_cp_matches_plain(rng):
    """Transformer encoder with cp_mode='ring' over an 8-way mesh must equal
    the plain encoder with identical params."""
    import jax.numpy as jnp
    from flax import nnx

    from pytorch_end2end_speech_recognition_tpu.models.encoders import (
        build_encoder,
    )
    from pytorch_end2end_speech_recognition_tpu.utils.config import ModelConfig

    def cfg(cp):
        return ModelConfig(
            encoder="transformer", encoder_layers=2, encoder_dim=32,
            encoder_ffn_dim=64, encoder_heads=8, dtype="float32",
            pos_encoding="absolute", cp_mode=cp,
        )

    mesh = make_mesh(dp=1, tp=8)
    x = jnp.asarray(rng.standard_normal((2, 130, 80)).astype(np.float32))
    lens = jnp.asarray([130, 77])
    plain = build_encoder(80, cfg(""), nnx.Rngs(0))
    y_ref, l_ref = plain(x, lens)
    for mode in ("ring", "ulysses"):
        enc = build_encoder(80, cfg(mode), nnx.Rngs(0), mesh=mesh)
        y, l = enc(x, lens)
        assert (np.asarray(l) == np.asarray(l_ref)).all()
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("mode", ["ring", "ulysses"])
def test_cp_with_toeplitz_bias_matches_full(mode, qkv):
    """CP attention with a relative-position bias given as diagonals must
    equal full attention with the densely-expanded bias (VERDICT r1 item 7:
    relative PE composes with CP)."""
    from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (
        toeplitz_expand,
    )

    q, k, v, lens = qkv
    B, T, H, D = q.shape
    rng = np.random.default_rng(5)
    diag = jnp.asarray(rng.standard_normal((H, 2 * T - 1)).astype(np.float32))
    mesh = make_mesh(dp=1, tp=8)

    dense = toeplitz_expand(diag, T, T)
    mask = jnp.arange(T)[None, :] < lens[:, None]
    ref, _, d = _block_attend(q, k, v, mask, bias=dense[None])
    ref = ref / jnp.maximum(d.swapaxes(1, 2)[..., None], 1e-30)
    ref = jnp.where(mask[:, :, None, None], ref, 0.0)

    out = sharded_self_attention(mesh, q, k, v, lens, mode=mode,
                                 axis="model", bias_diag=diag)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


def test_encoder_cp_with_relative_pe_matches_plain(rng):
    """cp_mode + pos_encoding='relative' (the round-1 guard is gone): the
    CP encoder must equal the plain relative-PE encoder with same params."""
    from flax import nnx

    from pytorch_end2end_speech_recognition_tpu.models.encoders import (
        build_encoder,
    )
    from pytorch_end2end_speech_recognition_tpu.utils.config import ModelConfig

    def cfg(cp):
        return ModelConfig(
            encoder="transformer", encoder_layers=2, encoder_dim=32,
            encoder_ffn_dim=64, encoder_heads=8, dtype="float32",
            pos_encoding="relative", cp_mode=cp,
        )

    mesh = make_mesh(dp=1, tp=8)
    x = jnp.asarray(rng.standard_normal((2, 130, 80)).astype(np.float32))
    lens = jnp.asarray([130, 77])
    plain = build_encoder(80, cfg(""), nnx.Rngs(0))
    y_ref, l_ref = plain(x, lens)
    for mode in ("ring", "ulysses"):
        enc = build_encoder(80, cfg(mode), nnx.Rngs(0), mesh=mesh)
        y, l = enc(x, lens)
        assert (np.asarray(l) == np.asarray(l_ref)).all()
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                                   rtol=2e-4, atol=3e-5)
