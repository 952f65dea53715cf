"""Bucketed batch loader: host does decode+pad only; features run on-device.

Capability parity: the reference genre's `SpeechDataset` + `BucketingSampler` +
`collate_fn` (SURVEY.md §2a "Dataset + bucketing loader", §3.1 data path).
TPU-first departures:

- Batches carry *raw padded audio*; STFT/mel/SpecAugment run inside the jitted
  train step (SURVEY.md §3.5 — inverts the genre's CPU-feature design).
- (T, U) shapes are quantized to a small fixed set of bucket shapes so XLA
  compiles one program per bucket, not per batch (SURVEY.md §7 hard part (c)).
- Each bucket has a FIXED batch size; ragged final batches are padded with
  zero-length rows (masked out by `audio_lens == 0`).
- Per-host sharding for multi-host data parallelism: `shard_index/num_shards`
  (the genre's DistributedSampler, SURVEY.md §3.3).
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass, field

import numpy as np

from pytorch_end2end_speech_recognition_tpu.data.audio import load_audio
from pytorch_end2end_speech_recognition_tpu.data.manifest import Utterance
from pytorch_end2end_speech_recognition_tpu.data.tokenizer import Tokenizer
from pytorch_end2end_speech_recognition_tpu.utils.config import DataConfig


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class Bucket:
    max_samples: int      # padded audio length (samples)
    max_label: int        # padded token length
    batch_size: int       # fixed utterances per batch
    utt_indices: list[int] = field(default_factory=list)


@dataclass
class Batch:
    """Host-side batch; arrays are numpy, ready for jax.device_put."""

    audio: np.ndarray        # (B, Ts) float32
    audio_lens: np.ndarray   # (B,) int32 — samples; 0 for pad rows
    tokens: np.ndarray       # (B, U) int32 — blank(0)-padded
    token_lens: np.ndarray   # (B,) int32
    ids: list[str]
    texts: list[str]

    @property
    def shape_key(self):
        return (self.audio.shape, self.tokens.shape)


class BucketedLoader:
    """Length-bucketed, shape-stable batch iterator over a manifest."""

    def __init__(
        self,
        utts: list[Utterance],
        tokenizer: Tokenizer,
        cfg: DataConfig,
        sample_rate: int = 16000,
        train: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
        audio_loader=None,
    ):
        self.tokenizer = tokenizer
        self.cfg = cfg
        self.sr = sample_rate
        self.train = train
        self.shard_index = shard_index
        self.num_shards = num_shards
        self._default_loader = audio_loader is None
        self._load = audio_loader or (lambda u: load_audio(u.audio, self.sr))

        kept = []
        for u in utts:
            if not (cfg.min_audio_s <= u.duration_s <= cfg.max_audio_s):
                continue
            toks = tokenizer.encode(u.text)
            if 0 < len(toks) <= cfg.max_label_len:
                kept.append((u, toks))
        if not kept:
            raise ValueError("no utterances survived filtering")
        self.utts = [u for u, _ in kept]
        self.token_ids = [t for _, t in kept]
        self.buckets = self._build_buckets()
        self._epoch = 0

    # ---- bucketing ----
    def _build_buckets(self) -> list[Bucket]:
        cfg = self.cfg
        lens = np.array([int(u.duration_s * self.sr) for u in self.utts])
        order = np.argsort(lens)
        n_buckets = min(cfg.n_length_buckets, len(self.utts))
        splits = np.array_split(order, n_buckets)
        buckets = []
        for idxs in splits:
            if len(idxs) == 0:
                continue
            max_s = _round_up(int(lens[idxs].max()), 1600)  # 100 ms granularity
            max_u = _round_up(max(len(self.token_ids[i]) for i in idxs), 8)
            bs = max(1, min(cfg.batch_size, cfg.batch_frames // max(max_s, 1)))
            buckets.append(
                Bucket(max_samples=max_s, max_label=max_u, batch_size=bs,
                       utt_indices=list(idxs))
            )
        # merge buckets with identical shapes
        merged: dict[tuple, Bucket] = {}
        for b in buckets:
            k = (b.max_samples, b.max_label, b.batch_size)
            if k in merged:
                merged[k].utt_indices.extend(b.utt_indices)
            else:
                merged[k] = b
        return list(merged.values())

    @property
    def shape_set(self) -> list[tuple[int, int, int]]:
        """All (batch, samples, label) padded shapes XLA will see."""
        return [(b.batch_size, b.max_samples, b.max_label) for b in self.buckets]

    def __len__(self):
        n = 0
        for b in self.buckets:
            sharded = len(b.utt_indices[self.shard_index :: self.num_shards])
            n += -(-sharded // b.batch_size)
        return n

    # ---- iteration ----
    def _make_batch(self, bucket: Bucket, idxs: list[int]) -> Batch:
        B, Ts, U = bucket.batch_size, bucket.max_samples, bucket.max_label
        audio = np.zeros((B, Ts), np.float32)
        alens = np.zeros((B,), np.int32)
        tokens = np.zeros((B, U), np.int32)
        tlens = np.zeros((B,), np.int32)
        ids, texts = [], []
        # fast path: multithreaded C++ decode straight into the padded
        # buffer (native/asrnative.cpp); rows it can't handle (non-wav,
        # resample needed, no toolchain) fall back to the Python loader
        native_done = np.zeros((len(idxs),), bool)
        if self._default_loader:
            try:
                from pytorch_end2end_speech_recognition_tpu.native import (
                    load_batch_native,
                )

                paths = [self.utts[i].audio for i in idxs]
                row_lens = alens[: len(idxs)]
                load_batch_native(paths, audio[: len(idxs)], row_lens,
                                  expect_sr=self.sr)
                native_done = row_lens > 0
            except Exception:
                pass
        for row, i in enumerate(idxs):
            if not native_done[row]:
                x = self._load(self.utts[i])[:Ts]
                audio[row, : len(x)] = x
                alens[row] = len(x)
            t = self.token_ids[i]
            tokens[row, : len(t)] = t
            tlens[row] = len(t)
            ids.append(self.utts[i].id)
            texts.append(self.utts[i].text)
        return Batch(audio, alens, tokens, tlens, ids, texts)

    def epoch(self, epoch: int | None = None, start_batch: int = 0):
        """One pass over this host's shard, in shuffled bucket order.
        `start_batch` skips the first N batches (checkpoint-resume cursor,
        SURVEY.md §5.4 'loader cursor'): epochs are deterministic in
        (cfg.seed, epoch), so (epoch, batch index) is an exact position."""
        ep = self._epoch if epoch is None else epoch
        rng = np.random.default_rng((self.cfg.seed, ep))
        jobs: list[tuple[Bucket, list[int]]] = []
        for b in self.buckets:
            idxs = np.array(b.utt_indices)
            if self.train and self.cfg.shuffle:
                rng.shuffle(idxs)
            idxs = idxs[self.shard_index :: self.num_shards]
            for s in range(0, len(idxs), b.batch_size):
                jobs.append((b, list(idxs[s : s + b.batch_size])))
        if self.num_shards > 1:
            # Hosts execute collectives in lockstep, so every shard must
            # yield the SAME number of batches per epoch. Each host can
            # compute all shards' counts locally (it holds the full index
            # lists + the shared shuffle seed); pad short shards with
            # empty batches (all rows masked by audio_lens == 0).
            max_jobs = max(
                sum(
                    -(-len(b.utt_indices[s :: self.num_shards])
                      // b.batch_size)
                    for b in self.buckets
                )
                for s in range(self.num_shards)
            )
            while len(jobs) < max_jobs:
                jobs.append((self.buckets[0], []))
        if self.train and self.cfg.shuffle:
            rng.shuffle(jobs)  # type: ignore[arg-type]
        jobs = jobs[start_batch:]
        for b, idxs in jobs:
            yield self._make_batch(b, idxs)
        self._epoch = ep + 1

    def __iter__(self):
        return self.epoch()

    def repeat(self, start_epoch: int = 0, start_batch: int = 0,
               with_cursor: bool = False):
        """Infinite step-based iteration (training), resumable from a
        (epoch, batch) cursor. With `with_cursor`, yields
        (epoch, batch_index, batch) so the trainer can persist its exact
        data position in checkpoints."""
        ep = start_epoch
        skip = start_batch
        while True:
            for i, batch in enumerate(self.epoch(ep, start_batch=skip)):
                if with_cursor:
                    yield ep, skip + i, batch
                else:
                    yield batch
            skip = 0
            ep += 1


def prefetch(it, depth: int = 2):
    """Background-thread prefetch so host prep overlaps device compute
    (TPU-native stand-in for the genre's DataLoader worker processes)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    _END = object()

    def worker():
        try:
            for item in it:
                q.put(item)
        finally:
            q.put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            break
        yield item
