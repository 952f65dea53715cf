"""Synthetic spoken-digits corpus for tests and the CPU-runnable AN4-rung recipe.

The image has zero network egress, so AN4/WSJ/LibriSpeech cannot be downloaded
here (their prep scripts in `prep/` gate on local data). This module generates
a learnable audio<->text mapping: each digit word is a fixed short melody of
tones (distinct frequency patterns), concatenated with silences and noise.
A real acoustic model must learn the same alignment machinery
(frames -> tokens, CTC blanks, attention) as on real speech, which makes the
overfit/E2E tests meaningful (SURVEY.md §4 "End-to-end smoke").
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from pytorch_end2end_speech_recognition_tpu.data.audio import write_wav
from pytorch_end2end_speech_recognition_tpu.data.manifest import (
    Utterance,
    write_manifest,
)

DIGITS = [
    "ZERO", "ONE", "TWO", "THREE", "FOUR",
    "FIVE", "SIX", "SEVEN", "EIGHT", "NINE",
]

# Each digit -> sequence of 3 tone frequencies (Hz). Distinct patterns.
_BASE = 300.0


def _digit_freqs(d: int) -> list[float]:
    return [
        _BASE * (1.3 ** ((d * 3 + k) % 10)) + 37.0 * ((d + k) % 4) for k in range(3)
    ]


def synth_digit_audio(
    digits: list[int],
    sr: int = 16000,
    tone_s: float = 0.09,
    gap_s: float = 0.06,
    noise: float = 0.01,
    rng: np.random.Generator | None = None,
    speaker_jitter: float = 0.0,
) -> np.ndarray:
    """With speaker_jitter > 0, a per-UTTERANCE 'speaker' is sampled: a
    global pitch scale, speaking rate, loudness, and noise floor (the
    digit's relative tone pattern stays intact). This is the train/dev
    distribution gap that makes dev WER a generalization measure instead
    of a memorization one (r1 VERDICT item 10)."""
    rng = rng or np.random.default_rng(0)
    j = speaker_jitter
    pitch = 1.0 + j * 0.2 * (rng.random() - 0.5) * 2    # ±20% * j
    rate = 1.0 + j * 0.3 * (rng.random() - 0.5) * 2     # ±30% * j
    loud = 0.3 * (1.0 + j * 0.5 * (rng.random() - 0.5) * 2)
    noise = noise * (1.0 + j * (rng.random() - 0.5) * 2)
    pieces = [np.zeros(int(sr * gap_s), np.float32)]
    for d in digits:
        for f in _digit_freqs(d):
            # jitter duration/freq slightly so the model must generalize
            dur = tone_s * rate * (1.0 + 0.15 * (rng.random() - 0.5))
            fj = f * pitch * (1.0 + 0.02 * (rng.random() - 0.5))
            t = np.arange(int(sr * dur)) / sr
            env = np.hanning(len(t)).astype(np.float32)
            pieces.append((loud * env * np.sin(2 * np.pi * fj * t)).astype(np.float32))
        pieces.append(np.zeros(int(sr * gap_s * rate * (1 + rng.random())),
                               np.float32))
    x = np.concatenate(pieces)
    x = x + noise * rng.standard_normal(len(x)).astype(np.float32)
    return x.astype(np.float32)


def make_digits_corpus(
    out_dir: str | Path,
    n_train: int = 200,
    n_dev: int = 20,
    n_test: int = 20,
    min_digits: int = 1,
    max_digits: int = 5,
    sr: int = 16000,
    seed: int = 0,
    speaker_jitter: float = 0.0,
) -> dict[str, Path]:
    """Generate WAVs + manifests. Returns {'train': path, 'dev': ..., 'test': ...}."""
    out_dir = Path(out_dir)
    (out_dir / "wav").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    manifests = {}
    counts = {"train": n_train, "dev": n_dev, "test": n_test}
    for split, n in counts.items():
        utts = []
        for i in range(n):
            k = int(rng.integers(min_digits, max_digits + 1))
            digits = rng.integers(0, 10, size=k).tolist()
            x = synth_digit_audio(digits, sr=sr, rng=rng,
                                  speaker_jitter=speaker_jitter)
            uid = f"{split}_{i:05d}"
            wav_path = out_dir / "wav" / f"{uid}.wav"
            write_wav(wav_path, x, sr)
            utts.append(
                Utterance(
                    id=uid,
                    audio=str(wav_path),
                    duration_s=len(x) / sr,
                    text=" ".join(DIGITS[d] for d in digits),
                )
            )
        mpath = out_dir / f"{split}.jsonl"
        write_manifest(mpath, utts)
        manifests[split] = mpath
    return manifests
