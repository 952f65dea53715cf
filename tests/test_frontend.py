"""Front-end tests: jnp log-mel vs numpy oracle; CMVN; SpecAugment props.

SURVEY.md §4 "Kernel oracles".
"""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_end2end_speech_recognition_tpu.ops.frontend import (
    Frontend,
    logmel_np,
    mel_filterbank,
)
from pytorch_end2end_speech_recognition_tpu.ops.specaugment import spec_augment
from pytorch_end2end_speech_recognition_tpu.utils.config import FrontendConfig


def _cfg(**kw):
    kw.setdefault("cmvn", "none")
    kw.setdefault("spec_augment", False)
    return FrontendConfig(**kw)


def test_mel_filterbank_shape_and_coverage():
    fb = mel_filterbank(80, 512, 16000)
    assert fb.shape == (257, 80)
    assert (fb >= 0).all()
    # every mel bin has some support
    assert (fb.sum(axis=0) > 0).all()


def test_logmel_matches_numpy_oracle(rng):
    cfg = _cfg()
    fe = Frontend(cfg)
    x = rng.standard_normal(16000).astype(np.float32) * 0.1
    ref = logmel_np(x, cfg)
    audio = jnp.asarray(x)[None, :]
    feats, flens = fe(audio, jnp.asarray([16000]))
    assert feats.shape[1:] == (fe.n_frames(16000), cfg.n_mels)
    assert int(flens[0]) == ref.shape[0]
    np.testing.assert_allclose(
        np.asarray(feats[0, : ref.shape[0]]), ref, rtol=1e-3, atol=1e-3
    )


def test_logmel_padding_invariance(rng):
    """Features of a padded batch row must not depend on pad length/content."""
    cfg = _cfg(cmvn="utt")
    fe = Frontend(cfg)
    x = rng.standard_normal(8000).astype(np.float32) * 0.1
    a1 = jnp.zeros((1, 16000)).at[0, :8000].set(x)
    a2 = jnp.full((1, 12800), 0.5).at[0, :8000].set(x)
    f1, l1 = fe(a1, jnp.asarray([8000]))
    f2, l2 = fe(a2, jnp.asarray([8000]))
    n = int(l1[0])
    assert int(l2[0]) == n
    np.testing.assert_allclose(
        np.asarray(f1[0, :n]), np.asarray(f2[0, :n]), rtol=1e-4, atol=1e-4
    )
    # frames past the valid length are exactly zero
    assert np.abs(np.asarray(f1[0, n:])).max() == 0.0


def test_cmvn_normalizes(rng):
    cfg = _cfg(cmvn="utt")
    fe = Frontend(cfg)
    x = (rng.standard_normal(16000) * 0.3 + 0.1).astype(np.float32)
    feats, flens = fe(jnp.asarray(x)[None], jnp.asarray([16000]))
    n = int(flens[0])
    valid = np.asarray(feats[0, :n])
    np.testing.assert_allclose(valid.mean(axis=0), 0.0, atol=1e-4)
    np.testing.assert_allclose(valid.std(axis=0), 1.0, atol=1e-2)


def test_spec_augment_properties(rng):
    cfg = FrontendConfig(n_freq_masks=2, n_time_masks=2, freq_mask_param=10,
                         time_mask_param=20)
    B, T, F = 3, 120, 80
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32)) + 5.0
    flens = jnp.asarray([120, 80, 40])
    out = spec_augment(jax.random.PRNGKey(0), feats, flens, cfg)
    assert out.shape == feats.shape
    # masked entries are 0, others untouched
    changed = np.asarray(out != feats)
    assert np.asarray(out)[changed].sum() == 0.0
    # masking is random but bounded: <= masks * max widths
    per_b_t = changed.any(axis=2).sum(axis=1)
    assert (per_b_t <= cfg.n_time_masks * cfg.time_mask_param + F).all()
    # different keys -> different masks
    out2 = spec_augment(jax.random.PRNGKey(1), feats, flens, cfg)
    assert np.any(np.asarray(out != out2))


def test_frontend_frame_lens_consistency():
    cfg = _cfg()
    fe = Frontend(cfg)
    for n in [400, 401, 560, 16000, 399]:
        expected = max(0, (n - fe.win) // fe.hop + 1)
        assert fe.n_frames(n) == expected


def test_time_warp_properties(rng):
    from pytorch_end2end_speech_recognition_tpu.ops.specaugment import (
        time_warp,
    )

    B, T, F = 3, 60, 8
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    flens = jnp.asarray([60, 40, 9], jnp.int32)  # 9 < 2W+2 -> identity
    out = time_warp(jax.random.PRNGKey(0), feats, flens, W=5)
    assert out.shape == feats.shape
    # too-short utterance passes through unchanged
    np.testing.assert_allclose(np.asarray(out[2]), np.asarray(feats[2]),
                               atol=1e-6)
    # padded frames untouched
    np.testing.assert_allclose(np.asarray(out[1, 40:]),
                               np.asarray(feats[1, 40:]), atol=1e-6)
    # warped region differs for long utterances
    assert float(jnp.abs(out[0] - feats[0]).max()) > 1e-4
    # deterministic in the key
    out2 = time_warp(jax.random.PRNGKey(0), feats, flens, W=5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # value range preserved (linear interpolation of existing frames)
    assert float(out.max()) <= float(feats.max()) + 1e-5
    assert float(out.min()) >= float(feats.min()) - 1e-5


def test_spec_augment_with_time_warp_in_policy(rng):
    cfg = _cfg(spec_augment=True)
    cfg.time_warp_param = 4
    B, T, F = 2, 50, cfg.n_mels
    feats = jnp.asarray(rng.standard_normal((B, T, F)).astype(np.float32))
    flens = jnp.asarray([50, 30], jnp.int32)
    out = spec_augment(jax.random.PRNGKey(0), feats, flens, cfg)
    assert out.shape == feats.shape
    assert np.isfinite(np.asarray(out)).all()
