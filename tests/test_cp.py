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
