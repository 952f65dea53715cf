"""CTC tests: XLA forward-backward vs optax oracle, values + grads, edge
cases (repeated labels, blank-only, len-0 pad rows); greedy decode props.

SURVEY.md §4 "Kernel oracles".
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from pytorch_end2end_speech_recognition_tpu.ops.ctc import (
    ctc_greedy_decode,
    ctc_loss,
    ctc_loss_xla,
)


def _rand_case(rng, B=3, T=20, V=8, U=6):
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    logit_lens = jnp.asarray(rng.integers(U * 2 + 2, T + 1, B).astype(np.int32))
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    label_lens = jnp.asarray(rng.integers(1, U + 1, B).astype(np.int32))
    labels = labels * (jnp.arange(U)[None, :] < label_lens[:, None])
    return logits, logit_lens, labels, label_lens


def _optax_ref(logits, logit_lens, labels, label_lens):
    T, U = logits.shape[1], labels.shape[1]
    logit_pad = (jnp.arange(T)[None] >= logit_lens[:, None]).astype(jnp.float32)
    label_pad = (jnp.arange(U)[None] >= label_lens[:, None]).astype(jnp.float32)
    return optax.ctc_loss(logits, logit_pad, labels, label_pad)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ctc_xla_matches_optax_values(seed):
    rng = np.random.default_rng(seed)
    case = _rand_case(rng)
    ours = ctc_loss_xla(*case)
    ref = _optax_ref(*case)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4,
                               atol=2e-4)


def test_ctc_xla_matches_optax_grads():
    rng = np.random.default_rng(3)
    logits, logit_lens, labels, label_lens = _rand_case(rng)

    g_ours = jax.grad(lambda x: ctc_loss_xla(x, logit_lens, labels,
                                             label_lens).sum())(logits)
    g_ref = jax.grad(lambda x: _optax_ref(x, logit_lens, labels,
                                          label_lens).sum())(logits)
    np.testing.assert_allclose(np.asarray(g_ours), np.asarray(g_ref),
                               rtol=2e-3, atol=2e-3)


def test_ctc_repeated_labels():
    """Repeats force blank transitions — the can_skip mask matters."""
    rng = np.random.default_rng(4)
    B, T, V, U = 2, 15, 6, 4
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    labels = jnp.asarray([[2, 2, 2, 3], [1, 1, 4, 4]], dtype=jnp.int32)
    label_lens = jnp.asarray([4, 4])
    logit_lens = jnp.asarray([15, 12])
    ours = ctc_loss_xla(logits, logit_lens, labels, label_lens)
    ref = _optax_ref(logits, logit_lens, labels, label_lens)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=2e-4)


def test_ctc_pad_rows_zero_loss_and_grad():
    rng = np.random.default_rng(5)
    logits, logit_lens, labels, label_lens = _rand_case(rng)
    label_lens = label_lens.at[1].set(0)
    logit_lens = logit_lens.at[2].set(0)
    loss = ctc_loss_xla(logits, logit_lens, labels, label_lens)
    assert float(loss[1]) == 0.0
    assert float(loss[2]) == 0.0
    g = jax.grad(lambda x: ctc_loss_xla(x, logit_lens, labels,
                                        label_lens).sum())(logits)
    assert np.abs(np.asarray(g[1])).max() == 0.0
    assert np.abs(np.asarray(g[2])).max() == 0.0


def test_ctc_impossible_case_large_loss():
    """T < label_len -> no valid path; loss should be huge, not NaN."""
    logits = jnp.zeros((1, 3, 5))
    loss = ctc_loss_xla(logits, jnp.asarray([3]), jnp.asarray([[1, 2, 3, 4]]),
                        jnp.asarray([4]))
    assert np.isfinite(float(loss[0])) and float(loss[0]) > 100.0


def test_ctc_dispatch_optax_impl():
    rng = np.random.default_rng(6)
    case = _rand_case(rng)
    a = ctc_loss(*case, impl="xla")
    b = ctc_loss(*case, impl="optax")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4,
                               atol=2e-4)


def test_greedy_decode_collapse():
    # frames spell: a a blank a b b -> "a a b" -> tokens [1, 1, 2]
    V = 4
    path = [1, 1, 0, 1, 2, 2]
    logits = jnp.asarray(
        np.eye(V, dtype=np.float32)[path][None] * 10.0
    )  # (1, 6, V)
    toks, lens = ctc_greedy_decode(logits, jnp.asarray([6]))
    assert int(lens[0]) == 3
    assert np.asarray(toks[0, :3]).tolist() == [1, 1, 2]
    assert np.asarray(toks[0, 3:]).sum() == 0


def test_greedy_decode_respects_lens():
    V = 4
    path = [1, 2, 3, 3, 3, 3]
    logits = jnp.asarray(np.eye(V, dtype=np.float32)[path][None] * 10.0)
    toks, lens = ctc_greedy_decode(logits, jnp.asarray([2]))
    assert int(lens[0]) == 2
    assert np.asarray(toks[0, :2]).tolist() == [1, 2]
