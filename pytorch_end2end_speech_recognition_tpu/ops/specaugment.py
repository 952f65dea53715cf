"""SpecAugment: frequency and time masking, fully on-device.

Capability parity: the reference genre's `spec_augment(x)` applied on fbank
features in the loader (SURVEY.md §2a "SpecAugment"); here it runs inside the
jitted train step under `jax.random` keys (Park et al. 2019 policy: mF freq
masks of width <=F, mT time masks of width <=min(T*ratio, T_param)).
Time-warping is omitted, as in most of the genre.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_end2end_speech_recognition_tpu.utils.config import FrontendConfig


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,       # (B, T, F)
    frame_lens: jnp.ndarray,  # (B,)
    cfg: FrontendConfig,
) -> jnp.ndarray:
    B, T, F = feats.shape
    n_masks = cfg.n_freq_masks + cfg.n_time_masks
    keys = jax.random.split(key, 2 * n_masks)
    t_idx = jnp.arange(T)[None, :]          # (1, T)
    f_idx = jnp.arange(F)[None, :]          # (1, F)
    mask = jnp.ones((B, T, F), feats.dtype)
    ki = 0
    for _ in range(cfg.n_freq_masks):
        w = jax.random.randint(keys[ki], (B, 1), 0, cfg.freq_mask_param + 1)
        start = jax.random.randint(keys[ki + 1], (B, 1), 0, jnp.maximum(F - w, 1))
        m = (f_idx >= start) & (f_idx < start + w)       # (B, F)
        mask = mask * (1.0 - m[:, None, :].astype(feats.dtype))
        ki += 2
    max_t = jnp.minimum(
        cfg.time_mask_param,
        jnp.maximum((frame_lens * cfg.time_mask_ratio).astype(jnp.int32), 1),
    )[:, None]                                           # (B, 1)
    for _ in range(cfg.n_time_masks):
        w = jax.random.randint(keys[ki], (B, 1), 0, cfg.time_mask_param + 1)
        w = jnp.minimum(w, max_t)
        limit = jnp.maximum(frame_lens[:, None] - w, 1)
        start = jax.random.randint(keys[ki + 1], (B, 1), 0, T) % limit
        m = (t_idx >= start) & (t_idx < start + w)       # (B, T)
        mask = mask * (1.0 - m[:, :, None].astype(feats.dtype))
        ki += 2
    return feats * mask
