"""SpecAugment: time warp + frequency and time masking, fully on-device.

Capability parity: the reference genre's `spec_augment(x)` applied on fbank
features in the loader (SURVEY.md §2a "SpecAugment"); here it runs inside the
jitted train step under `jax.random` keys (Park et al. 2019 policy: time
warp W, mF freq masks of width <=F, mT time masks of width
<=min(T*ratio, T_param)). Time warp (off by default, like most of the
genre) is a piecewise-linear time remap with on-device linear-interpolation
gather — no sparse_image_warp dependency.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_end2end_speech_recognition_tpu.utils.config import FrontendConfig


def time_warp(
    key: jax.Array,
    feats: jnp.ndarray,       # (B, T, F)
    frame_lens: jnp.ndarray,  # (B,)
    W: int,
) -> jnp.ndarray:
    """SpecAugment time warp: a random anchor in [W, len-W) moves by
    w ~ U[-W, W]; both segments stretch linearly (Park et al. §2.1).
    Utterances shorter than 2W+2 frames pass through unchanged; padded
    frames are untouched."""
    B, T, F = feats.shape
    k1, k2 = jax.random.split(key)
    lens = frame_lens.astype(jnp.float32)[:, None]            # (B, 1)
    ok = (frame_lens >= 2 * W + 2)[:, None]                   # (B, 1)
    span = jnp.maximum(frame_lens - 2 * W, 1)
    center = (W + jax.random.randint(k1, (B, 1), 0, T) % span[:, None]
              ).astype(jnp.float32)
    w = jax.random.randint(k2, (B, 1), -W, W + 1).astype(jnp.float32)
    warped = center + w                                       # in [1, len-W]
    t = jnp.arange(T, dtype=jnp.float32)[None, :]             # (1, T)
    left = t * center / jnp.maximum(warped, 1.0)
    right = center + (t - warped) * (lens - 1 - center) / jnp.maximum(
        lens - 1 - warped, 1.0
    )
    src = jnp.where(t < warped, left, right)
    src = jnp.clip(src, 0.0, lens - 1)
    src = jnp.where(ok & (t < lens), src, t)                  # identity o.w.
    lo = jnp.floor(src).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    frac = (src - lo.astype(jnp.float32))[:, :, None].astype(feats.dtype)
    g_lo = jnp.take_along_axis(feats, lo[:, :, None], axis=1)
    g_hi = jnp.take_along_axis(feats, hi[:, :, None], axis=1)
    return g_lo * (1.0 - frac) + g_hi * frac


def spec_augment(
    key: jax.Array,
    feats: jnp.ndarray,       # (B, T, F)
    frame_lens: jnp.ndarray,  # (B,)
    cfg: FrontendConfig,
) -> jnp.ndarray:
    B, T, F = feats.shape
    if cfg.time_warp_param > 0:
        key, kw = jax.random.split(key)
        feats = time_warp(kw, feats, frame_lens, cfg.time_warp_param)
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
