"""Feature front-end: preemphasis -> framing -> DFT -> log-mel -> CMVN.

Capability parity: the reference genre's torchaudio/kaldi C++ fbank kernels
(SURVEY.md §2a "Feature front-end", §2b native list). TPU-native design
(BASELINE.json:5 "the feature front-end becomes a Pallas kernel"):

- The DFT is expressed as two real matmuls (frames @ cos/sin bases) instead of
  an FFT: for 400-sample windows this is a (T, 512) x (512, 257) matmul pair —
  MXU work at trivial cost, fusable with the mel projection, and identical
  numerics across CPU/TPU. The mel projection is another matmul.
- `logmel_jnp` is the pure-XLA path (works everywhere); `ops/frontend_pallas.py`
  provides the fused Pallas kernel; `logmel_np` is the numpy oracle for tests.
- Runs *inside* the jitted train step on padded audio; frame validity comes
  from `audio_lens` (SURVEY.md §3.5).

Mel filterbank uses the HTK mel scale (torchaudio default), triangular
filters, no normalization — parity with `torchaudio.transforms.MelSpectrogram`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_end2end_speech_recognition_tpu.utils.config import FrontendConfig

LOG_EPS = 1e-10


# ---------------------------------------------------------------- mel basis
def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz(m):
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


def mel_filterbank(
    n_mels: int, n_fft: int, sample_rate: int, fmin: float = 0.0,
    fmax: float | None = None,
) -> np.ndarray:
    """Triangular HTK mel filterbank, shape (n_fft//2 + 1, n_mels)."""
    fmax = fmax or sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_bins, n_mels), np.float64)
    for m in range(n_mels):
        lo, c, hi = hz_pts[m], hz_pts[m + 1], hz_pts[m + 2]
        up = (fft_freqs - lo) / max(c - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - c, 1e-10)
        fb[:, m] = np.maximum(0.0, np.minimum(up, down))
    return fb.astype(np.float32)


def dft_bases(n_fft: int, win_length: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT as matmul: (win_length, n_bins) cos and -sin bases with the
    Hann window folded in. frames @ cos_b, frames @ sin_b give Re/Im."""
    n_bins = n_fft // 2 + 1
    window = np.hanning(win_length + 1)[:-1].astype(np.float64)  # periodic Hann
    n = np.arange(win_length)[:, None]
    k = np.arange(n_bins)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    cos_b = (window[:, None] * np.cos(ang)).astype(np.float32)
    sin_b = (window[:, None] * np.sin(ang)).astype(np.float32)
    return cos_b, sin_b


def num_frames(n_samples, win_length: int, hop_length: int):
    """Frame count for center=False framing; works on ints or arrays."""
    return jnp.maximum(0, (n_samples - win_length) // hop_length + 1) if isinstance(
        n_samples, jnp.ndarray
    ) else max(0, (int(n_samples) - win_length) // hop_length + 1)


# ---------------------------------------------------------------- numpy oracle
def logmel_np(x: np.ndarray, cfg: FrontendConfig) -> np.ndarray:
    """Numpy reference: (T_samples,) -> (T_frames, n_mels). Test oracle."""
    win, hop = cfg.win_length, cfg.hop_length
    x = np.asarray(x, np.float32)
    x = np.concatenate([x[:1], x[1:] - cfg.preemphasis * x[:-1]])
    T = max(0, (len(x) - win) // hop + 1)
    frames = np.stack([x[t * hop : t * hop + win] for t in range(T)]) if T else (
        np.zeros((0, win), np.float32)
    )
    cos_b, sin_b = dft_bases(cfg.n_fft, win)
    re, im = frames @ cos_b, frames @ sin_b
    power = re * re + im * im
    mel = power @ mel_filterbank(
        cfg.n_mels, cfg.n_fft, cfg.sample_rate, cfg.fmin, cfg.fmax
    )
    return np.log(mel + LOG_EPS).astype(np.float32)


# ---------------------------------------------------------------- jnp on-device
class Frontend:
    """On-device log-mel front-end with static bases baked as constants."""

    def __init__(self, cfg: FrontendConfig):
        # resolve 'auto' impl/dtype here too: a FrontendConfig constructed
        # directly (not via AsrModel/Solver, which run resolve_platform
        # first) would otherwise silently take the jnp path and later
        # AttributeError on basis_pre if impl is resolved to 'pallas'
        # (r4 ADVICE; mapping single-sourced in utils.config, r5 review)
        from pytorch_end2end_speech_recognition_tpu.utils.config import (
            resolve_frontend,
        )

        resolve_frontend(cfg)
        self.cfg = cfg
        self.win = cfg.win_length
        self.hop = cfg.hop_length
        cos_b, sin_b = dft_bases(cfg.n_fft, self.win)
        self.cos_b = jnp.asarray(cos_b)
        self.sin_b = jnp.asarray(sin_b)
        self.mel_b = jnp.asarray(
            mel_filterbank(cfg.n_mels, cfg.n_fft, cfg.sample_rate, cfg.fmin, cfg.fmax)
        )
        if cfg.impl == "pallas":
            from pytorch_end2end_speech_recognition_tpu.ops.frontend_pallas import (
                preemph_dft_bases,
            )

            basis, basis_prev = preemph_dft_bases(cos_b, sin_b, self.hop,
                                                  cfg.preemphasis)
            if cfg.dft_dtype == "bfloat16":
                # halves the kernel's frame/basis MXU traffic; the DFT
                # matmul accumulates in f32 (preferred_element_type)
                basis = basis.astype(np.dtype("bfloat16"))
            self.basis_pre = jnp.asarray(basis)
            self.basis_prev = jnp.asarray(basis_prev)
        self.global_mean = self.global_std = None
        if cfg.cmvn == "global":
            import json
            from pathlib import Path

            if not cfg.cmvn_stats_path or not Path(cfg.cmvn_stats_path).exists():
                raise FileNotFoundError(
                    "cmvn='global' needs cmvn_stats_path (see "
                    "ops.frontend.compute_global_cmvn)"
                )
            d = json.loads(Path(cfg.cmvn_stats_path).read_text())
            self.global_mean = jnp.asarray(d["mean"], jnp.float32)
            self.global_std = jnp.asarray(d["std"], jnp.float32)

    def n_frames(self, n_samples: int) -> int:
        return max(0, (n_samples - self.win) // self.hop + 1)

    def frame_lens(self, audio_lens: jnp.ndarray) -> jnp.ndarray:
        return jnp.maximum(0, (audio_lens - self.win) // self.hop + 1)

    @partial(jax.jit, static_argnums=0)
    def __call__(
        self, audio: jnp.ndarray, audio_lens: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """(B, Ts), (B,) -> log-mel (B, T, n_mels) f32, frame_lens (B,).

        Padded frames (beyond each row's length) are zeroed so downstream
        masking is exact regardless of pad content.
        """
        B, Ts = audio.shape
        T = self.n_frames(Ts)
        flens = self.frame_lens(audio_lens)
        if self.cfg.impl == "pallas":
            from pytorch_end2end_speech_recognition_tpu.ops.frontend_pallas import (
                logmel_pallas,
            )

            # raw audio in: preemphasis is folded into basis_pre, the
            # overlapped framing happens in VMEM, and pad frames come back
            # already zeroed (kernel epilogue mask)
            feats = logmel_pallas(
                audio, self.basis_pre, self.basis_prev, self.mel_b,
                self.hop, T, flens
            )
        else:
            x = jnp.concatenate(
                [audio[:, :1],
                 audio[:, 1:] - self.cfg.preemphasis * audio[:, :-1]],
                axis=1,
            )
            # frames via gather: idx (T, win)
            idx = (
                jnp.arange(T)[:, None] * self.hop + jnp.arange(self.win)[None, :]
            )
            frames = x[:, idx]  # (B, T, win)
            # precision='highest': on TPU the default f32 dot runs at bf16
            # MXU precision, which is catastrophic for near-cancellation
            # DFT bins (measured 2.6 max log-mel error vs the numpy oracle
            # where the Pallas kernel shows 0.15); this is the reference /
            # fallback path, so accuracy wins over speed
            re = jnp.einsum(
                "btw,wf->btf", frames, self.cos_b,
                preferred_element_type=jnp.float32, precision="highest",
            )
            im = jnp.einsum(
                "btw,wf->btf", frames, self.sin_b,
                preferred_element_type=jnp.float32, precision="highest",
            )
            power = re * re + im * im
            mel = jnp.einsum(
                "btf,fm->btm", power, self.mel_b,
                preferred_element_type=jnp.float32, precision="highest",
            )
            feats = jnp.log(mel + LOG_EPS)
            mask = (jnp.arange(T)[None, :] < flens[:, None])[..., None]
            feats = jnp.where(mask, feats, 0.0)
        if self.cfg.cmvn == "utt":
            feats = cmvn_utt(feats, flens)
        elif self.cfg.cmvn == "global":
            mask = (jnp.arange(T)[None, :] < flens[:, None])[..., None]
            feats = (feats - self.global_mean) / self.global_std
            feats = jnp.where(mask, feats, 0.0)
        return feats, flens


def compute_global_cmvn(
    manifest_path: str, cfg: FrontendConfig, out_path: str,
    max_utts: int = 2000,
) -> dict:
    """Accumulate dataset log-mel mean/std (genre's global CMVN stats) and
    write them as JSON for `cmvn='global'`."""
    import json

    from pytorch_end2end_speech_recognition_tpu.data.audio import load_audio
    from pytorch_end2end_speech_recognition_tpu.data.manifest import (
        read_manifest,
    )

    s0, s1, s2 = 0, None, None
    for u in read_manifest(manifest_path)[:max_utts]:
        f = logmel_np(load_audio(u.audio, cfg.sample_rate), cfg)
        if s1 is None:
            s1 = f.sum(axis=0)
            s2 = (f ** 2).sum(axis=0)
        else:
            s1 += f.sum(axis=0)
            s2 += (f ** 2).sum(axis=0)
        s0 += f.shape[0]
    mean = s1 / max(s0, 1)
    std = np.sqrt(np.maximum(s2 / max(s0, 1) - mean ** 2, 1e-8))
    stats = {"mean": mean.tolist(), "std": std.tolist(), "frames": int(s0)}
    with open(out_path, "w") as f:
        json.dump(stats, f)
    return stats


def cmvn_utt(feats: jnp.ndarray, frame_lens: jnp.ndarray) -> jnp.ndarray:
    """Per-utterance mean/variance normalization over valid frames only.

    Single-traversal moments (sum and sum-of-squares together) instead of
    the textbook mean-then-centered-variance form: the op is HBM-bound and
    the two-pass variance cost an extra full read of the feature tensor
    (~0.4 ms/step at the B=32 x 30 s bench shape). The moments are taken of
    `feats - feats[:, 0]` (the first frame as a per-row shift — one extra
    frame read, not a pass): raw E[x^2]-E[x]^2 on log-mels with means ~ -23
    cancels to ~mean^2*eps ~ 6e-5, so rows whose true variance is below
    ~1e-4 (near-silent utterances) hit the 1e-8 floor and amplify rounding
    noise ~30x (r3 ADVICE); shifting makes E[d^2] the same order as the
    variance itself, restoring two-pass accuracy at one-pass cost.
    """
    T = feats.shape[1]
    mask = (jnp.arange(T)[None, :] < frame_lens[:, None])[..., None]
    n = jnp.maximum(frame_lens[:, None, None].astype(feats.dtype), 1.0)
    off = feats[:, :1, :]  # valid whenever frame_lens > 0
    d = jnp.where(mask, feats - off, 0.0)
    s1 = jnp.sum(d, axis=1, keepdims=True)
    s2 = jnp.sum(d * d, axis=1, keepdims=True)
    mean_c = s1 / n
    var = jnp.maximum(s2 / n - mean_c * mean_c, 0.0)
    out = (d - mean_c) * jax.lax.rsqrt(var + 1e-8)
    return jnp.where(mask, out, 0.0)
