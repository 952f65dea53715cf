"""Pallas kernel oracle tests, run in interpreter mode on CPU
(SURVEY.md §4 'Kernel oracles', §5.2 'Pallas interpreter mode as sanitizer').
The same kernels compile natively on TPU (exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pytorch_end2end_speech_recognition_tpu.ops.ctc import ctc_loss_xla
from pytorch_end2end_speech_recognition_tpu.ops.ctc_pallas import ctc_loss_pallas
from pytorch_end2end_speech_recognition_tpu.ops.frontend import (
    Frontend,
    logmel_np,
)
from pytorch_end2end_speech_recognition_tpu.ops.frontend_pallas import (
    logmel_pallas,
)
from pytorch_end2end_speech_recognition_tpu.utils.config import FrontendConfig


def test_logmel_pallas_matches_oracle(rng):
    """The kernel consumes RAW audio: preemphasis (folded into the DFT
    basis), framing, DFT, mel, log and pad masking all happen on-chip."""
    cfg = FrontendConfig(cmvn="none", spec_augment=False, impl="pallas")
    fe = Frontend(cfg)
    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    T = fe.n_frames(16000)
    flens = jnp.asarray([T, T], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = logmel_pallas(jnp.asarray(x), fe.basis_pre, fe.basis_prev, fe.mel_b,
                            fe.hop, T, flens)
    assert out.shape == (2, T, cfg.n_mels)
    for b in range(2):
        ref = logmel_np(x[b], cfg)  # oracle includes preemphasis
        np.testing.assert_allclose(
            np.asarray(out[b, : ref.shape[0]]), ref, rtol=1e-3, atol=1e-3
        )


def test_logmel_pallas_masks_pad_frames(rng):
    cfg = FrontendConfig(cmvn="none", spec_augment=False, impl="pallas")
    fe = Frontend(cfg)
    x = rng.standard_normal((2, 16000)).astype(np.float32) * 0.1
    x[1] = x[0]  # same audio, shorter declared length
    T = fe.n_frames(16000)
    flens = jnp.asarray([T, T // 3], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = logmel_pallas(jnp.asarray(x), fe.basis_pre, fe.basis_prev, fe.mel_b,
                            fe.hop, T, flens)
    out = np.asarray(out)
    assert np.all(out[1, T // 3 :] == 0.0)
    assert np.any(out[1, : T // 3] != 0.0)
    np.testing.assert_allclose(out[1, : T // 3], out[0, : T // 3],
                               rtol=1e-6, atol=1e-6)


def test_logmel_pallas_odd_sizes(rng):
    """Non-multiple-of-tile frame counts and short audio."""
    cfg = FrontendConfig(cmvn="none", spec_augment=False, impl="pallas")
    fe = Frontend(cfg)
    x = rng.standard_normal((1, 7 * 160 + 400)).astype(np.float32)
    T = fe.n_frames(x.shape[1])
    assert T == 8
    flens = jnp.asarray([T], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        out = logmel_pallas(jnp.asarray(x), fe.basis_pre, fe.basis_prev, fe.mel_b,
                            fe.hop, T, flens)
    assert out.shape == (1, 8, cfg.n_mels)
    ref = logmel_np(x[0], cfg)
    np.testing.assert_allclose(np.asarray(out[0]), ref, rtol=1e-3, atol=1e-3)


def _ctc_case(rng, B=5, T=20, V=8, U=6):
    logits = jnp.asarray(rng.standard_normal((B, T, V)).astype(np.float32))
    logit_lens = jnp.asarray([T, T - 5, T, T - 2, 0][:B], dtype=jnp.int32)
    labels = jnp.asarray(rng.integers(1, V, (B, U)).astype(np.int32))
    label_lens = jnp.asarray([U, 4, 1, U, 3][:B], dtype=jnp.int32)
    labels = labels * (jnp.arange(U)[None, :] < label_lens[:, None])
    labels = labels.at[0].set(
        jnp.asarray([2, 2, 3, 3, 2, 5][:U], dtype=jnp.int32))
    return logits, logit_lens, labels, label_lens


def test_ctc_pallas_matches_xla_values_and_grads(rng):
    case = _ctc_case(rng)
    with pltpu.force_tpu_interpret_mode():
        ours = ctc_loss_pallas(*case)
        ref = ctc_loss_xla(*case)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        logits, logit_lens, labels, label_lens = case
        g1 = jax.grad(lambda x: ctc_loss_pallas(
            x, logit_lens, labels, label_lens).sum())(logits)
        g2 = jax.grad(lambda x: ctc_loss_xla(
            x, logit_lens, labels, label_lens).sum())(logits)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-4, atol=1e-5)


def test_ctc_pallas_pad_rows(rng):
    case = _ctc_case(rng)
    logits, logit_lens, labels, label_lens = case
    with pltpu.force_tpu_interpret_mode():
        loss = ctc_loss_pallas(*case)
        assert float(loss[4]) == 0.0
        g = jax.grad(lambda x: ctc_loss_pallas(
            x, logit_lens, labels, label_lens).sum())(logits)
        assert np.abs(np.asarray(g[4])).max() == 0.0


def test_lstm_pallas_matches_scan(rng):
    from pytorch_end2end_speech_recognition_tpu.ops.rnn import lstm_scan
    from pytorch_end2end_speech_recognition_tpu.ops.rnn_pallas import (
        lstm_scan_pallas,
    )

    B, T, D, H = 4, 37, 12, 16
    x = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.asarray([37, 20, 5, 0], dtype=jnp.int32)
    wih = jnp.asarray(rng.standard_normal((D, 4 * H)).astype(np.float32) * 0.2)
    whh = jnp.asarray(rng.standard_normal((H, 4 * H)).astype(np.float32) * 0.2)
    b = jnp.asarray(rng.standard_normal((4 * H,)).astype(np.float32) * 0.1)

    with pltpu.force_tpu_interpret_mode():
        for reverse in (False, True):
            ref, _ = lstm_scan(x, lens, wih, whh, b, reverse=reverse)
            ours = lstm_scan_pallas(x, lens, wih, whh, b, reverse=reverse)
            np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                                       rtol=1e-5, atol=1e-5)

        def loss_p(args):
            wih, whh, b = args
            y = lstm_scan_pallas(x, lens, wih, whh, b)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

        def loss_r(args):
            wih, whh, b = args
            y, _ = lstm_scan(x, lens, wih, whh, b)
            return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

        g1 = jax.grad(loss_p)((wih, whh, b))
        g2 = jax.grad(loss_r)((wih, whh, b))
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- attention
def test_fused_attention_matches_oracle(rng):
    from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (
        _attention_fwd_pallas,
        _attention_xla,
    )

    B, T, H, Dh = 3, 70, 4, 16  # T not lane-aligned on purpose
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.asarray([70, 33, 1], jnp.int32)
    bias = jnp.asarray(rng.standard_normal((H, T, T)).astype(np.float32) * 0.3)
    for b in (bias, None):
        ref = _attention_xla(q, k, v, b, lens, H)
        with pltpu.force_tpu_interpret_mode():
            out = _attention_fwd_pallas(q, k, v, b, lens, H)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


def test_fused_attention_vjp_matches_autodiff(rng):
    """custom_vjp backward == autodiff through the reference math."""
    from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (
        _attention_xla,
        fused_attention,
    )

    B, T, H, Dh = 2, 24, 2, 8
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.asarray([24, 15], jnp.int32)
    bias = jnp.asarray(rng.standard_normal((H, T, T)).astype(np.float32) * 0.3)

    def loss_fused(q, k, v, bias):
        return jnp.sum(fused_attention(q, k, v, bias, lens, H) ** 2)

    def loss_ref(q, k, v, bias):
        return jnp.sum(_attention_xla(q, k, v, bias, lens, H) ** 2)

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_attention_bwd_kernel_matches_autodiff(rng):
    """Pallas backward kernel == autodiff through the reference math."""
    from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (
        _attention_bwd_pallas,
        _attention_xla,
    )

    B, T, H, Dh = 3, 40, 2, 8
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    lens = jnp.asarray([40, 17, 2], jnp.int32)
    for with_bias in (True, False):
        bias = (
            jnp.asarray(rng.standard_normal((H, T, T)).astype(np.float32)
                        * 0.3)
            if with_bias else None
        )
        g = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
        # upstream grads of padded query rows are zero in the real model
        g = jnp.where(jnp.arange(T)[None, :, None] < lens[:, None, None],
                      g, 0.0)
        with pltpu.force_tpu_interpret_mode():
            dq, dk, dv, dbias = _attention_bwd_pallas(q, k, v, bias, lens,
                                                      g, H)

        def loss(q, k, v, b):
            return jnp.sum(_attention_xla(q, k, v, b, lens, H) * g)

        if with_bias:
            rq, rk, rv, rb = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v,
                                                                  bias)
            np.testing.assert_allclose(np.asarray(dbias), np.asarray(rb),
                                       rtol=2e-4, atol=2e-4)
        else:
            rq, rk, rv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v, None)
            assert dbias is None
        for a, b in ((dq, rq), (dk, rk), (dv, rv)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4)


def test_fused_attention_bwd_headsplit_fallback_matches_autodiff(rng):
    """Shapes whose whole-resident f32 dbias exceeds the scoped-VMEM
    budget (heads*Tp^2*4 > 12 MiB, e.g. rung-4's H=8/Tp=768) route to the
    r4-style head-split backward — same grads as the fast path's oracle.
    Tp is forced to 768 via T; B is kept tiny for interpret-mode speed."""
    from pytorch_end2end_speech_recognition_tpu.ops.attention_pallas import (
        _attention_bwd_pallas,
        _attention_xla,
    )

    B, T, H, Dh = 1, 650, 8, 8          # Tp=768 -> dbias 18.9 MiB: fallback
    D = H * Dh
    q = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)) * 0.3
    k = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)) * 0.3
    v = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32)) * 0.3
    lens = jnp.asarray([590], jnp.int32)
    bias = jnp.asarray(
        rng.standard_normal((H, T, T)).astype(np.float32) * 0.1)
    g = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    g = jnp.where(jnp.arange(T)[None, :, None] < lens[:, None, None], g, 0.0)
    with pltpu.force_tpu_interpret_mode():
        dq, dk, dv, dbias = _attention_bwd_pallas(q, k, v, bias, lens, g, H)

    def loss(q, k, v, b):
        return jnp.sum(_attention_xla(q, k, v, b, lens, H) * g)

    rq, rk, rv, rb = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(dbias), np.asarray(rb),
                               rtol=5e-4, atol=5e-4)
    for a, b in ((dq, rq), (dk, rk), (dv, rv)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


# ---------------------------------------------------------------- fused FFN
def _ffn_ref(x, gamma, beta, w1, b1, w2, b2, scale):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    xn = (x - mu) * jax.lax.rsqrt(var + 1e-6) * gamma + beta
    a = jax.nn.silu(xn @ w1 + b1)
    return x + scale * (a @ w2 + b2)


def _ffn_args(rng, R=70, D=64, F=256):
    x = jnp.asarray(rng.standard_normal((R, D)).astype(np.float32))
    gamma = jnp.asarray(1.0 + 0.1 * rng.standard_normal(D).astype(np.float32))
    beta = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    w1 = jnp.asarray((rng.standard_normal((D, F)) / np.sqrt(D)).astype(np.float32))
    b1 = jnp.asarray(0.1 * rng.standard_normal(F).astype(np.float32))
    w2 = jnp.asarray((rng.standard_normal((F, D)) / np.sqrt(F)).astype(np.float32))
    b2 = jnp.asarray(0.1 * rng.standard_normal(D).astype(np.float32))
    return x, gamma, beta, w1, b1, w2, b2


def test_ffn_fused_matches_reference_values_and_grads(rng):
    from pytorch_end2end_speech_recognition_tpu.ops.ffn_pallas import (
        ffn_fused,
    )

    args = _ffn_args(rng)
    seed = jnp.zeros((), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((70, 64)).astype(np.float32))

    def loss_fused(*a):
        return jnp.sum(ffn_fused(0.0, 0.5, *a, seed) * cot)

    def loss_ref(*a):
        return jnp.sum(_ffn_ref(*a, 0.5) * cot)

    with pltpu.force_tpu_interpret_mode():
        v_fused = loss_fused(*args)
        g_fused = jax.grad(loss_fused, argnums=tuple(range(7)))(*args)
    v_ref = loss_ref(*args)
    g_ref = jax.grad(loss_ref, argnums=tuple(range(7)))(*args)
    np.testing.assert_allclose(float(v_fused), float(v_ref), rtol=2e-5)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_ffn_fused_multi_tile_grad_accumulation(rng):
    """R spanning several row tiles: dW accumulates over revisited blocks."""
    from pytorch_end2end_speech_recognition_tpu.ops.ffn_pallas import (
        ffn_fused,
    )

    args = _ffn_args(rng, R=520, D=64, F=256)
    seed = jnp.zeros((), jnp.int32)

    def loss_fused(*a):
        return jnp.sum(jnp.tanh(ffn_fused(0.0, 1.0, *a, seed)))

    def loss_ref(*a):
        return jnp.sum(jnp.tanh(_ffn_ref(*a, 1.0)))

    with pltpu.force_tpu_interpret_mode():
        g_fused = jax.grad(loss_fused, argnums=(0, 3, 5))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 3, 5))(*args)
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4)


def test_ffn_fused_dropout_noop_without_rate(rng):
    """rate=0 path has no PRNG dependence. Full dropout semantics (seed
    determinism, drop fraction, kept-scale, bwd mask replay) are validated
    on hardware by tools/probe_ffn_tpu.py — interpret mode's
    prng_random_bits returns zeros, so they cannot be CI-tested here."""
    from pytorch_end2end_speech_recognition_tpu.ops.ffn_pallas import (
        ffn_fused,
    )

    args = _ffn_args(rng, R=64, D=64, F=256)
    with pltpu.force_tpu_interpret_mode():
        o1 = ffn_fused(0.0, 1.0, *args, jnp.asarray(1, jnp.int32))
        o2 = ffn_fused(0.0, 1.0, *args, jnp.asarray(2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
