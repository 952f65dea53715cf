"""Streaming transcription RTF on the real TPU (r4 VERDICT task 3).

Feeds long utterances through the chunk-synchronized StreamingBeamTranscriber
in real-time-sized chunks and reports, PER STREAM LENGTH (to demonstrate
O(1) behavior — the r4 design's final beam grew linearly with the stream):
per-feed compute latency (median/p95/max), total compute RTF, and the final
-chunk cost (which now includes EOS resolution, not a full-utterance beam).
Writes bench_results/r5_streaming.json.

Usage: python tools/bench_streaming.py [audio_seconds_csv] [feed_seconds]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pytorch_end2end_speech_recognition_tpu.utils.platform import (
    enable_compilation_cache,
)

enable_compilation_cache()
import json
import statistics
import time

import jax
import numpy as np
from flax import nnx

from __graft_entry__ import _flagship_cfg
from pytorch_end2end_speech_recognition_tpu.data.tokenizer import CharTokenizer
from pytorch_end2end_speech_recognition_tpu.models.asr import AsrModel
from pytorch_end2end_speech_recognition_tpu.models.streaming import (
    StreamingBeamTranscriber,
)


def run_stream(st, audio, feed):
    chunks = [audio[i : i + feed] for i in range(0, len(audio), feed)]
    stream = st.init_stream()
    lat = []
    t_all = time.perf_counter()
    for i, c in enumerate(chunks):
        t0 = time.perf_counter()
        stream = st.feed(stream, c, final=(i == len(chunks) - 1))
        lat.append(time.perf_counter() - t0)
    t_stream = time.perf_counter() - t_all
    nbest = st.final_nbest(stream)
    assert nbest is not None
    return lat, t_stream


def main():
    lengths = ([float(s) for s in sys.argv[1].split(",")]
               if len(sys.argv) > 1 else [30.0, 60.0, 120.0])
    feed_s = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    cfg = _flagship_cfg()
    cfg.model.decoder = "transformer"
    cfg.model.decoder_layers = 2
    cfg.model.decoder_dim = 256
    cfg.decode.beam_size = 8
    cfg.decode.pre_beam_k = 16
    tok = CharTokenizer(charset="ABCDEFGHIJKLMNOPQRSTUVWXYZ ")
    cfg.model.vocab_size = tok.vocab_size
    model = AsrModel(cfg, nnx.Rngs(0))
    st = StreamingBeamTranscriber(model, tok, cfg.decode,
                                  chunk_s=8.0, overlap_s=2.0,
                                  chunk_frames=64, window_frames=256,
                                  max_tokens=512, steps_per_chunk=16)

    sr = cfg.frontend.sample_rate
    rng = np.random.default_rng(0)
    feed = int(feed_s * sr)

    # warm-up compiles: encoder window buckets + the single chunk-beam
    # program (incl. its final-chunk branch)
    warm = (rng.standard_normal(int(12.0 * sr)) * 0.1).astype(np.float32)
    run_stream(st, warm, feed)

    per_len = {}
    for audio_s in lengths:
        audio = (rng.standard_normal(int(audio_s * sr)) * 0.1
                 ).astype(np.float32)
        lat, t_stream = run_stream(st, audio, feed)
        per_len[str(audio_s)] = {
            "stream_rtf": round(t_stream / audio_s, 5),
            "feed_latency_ms": {
                "median": round(1e3 * statistics.median(lat), 2),
                "p95": round(1e3 * sorted(lat)[int(0.95 * len(lat))], 2),
                "max": round(1e3 * max(lat), 2),
            },
            "final_feed_ms": round(1e3 * lat[-1], 2),
        }
        print(audio_s, per_len[str(audio_s)], flush=True)

    rec = {
        "model": "flagship 12L/d256 conformer + 2L transformer decoder, "
                 "bf16 + Pallas kernels",
        "decoder_design": "chunk-synchronized beam (decode/chunk_beam.py): "
                          "O(1) carried state, one compiled program",
        "feed_s": feed_s,
        "chunk_s": 8.0,
        "overlap_s": 2.0,
        "chunk_frames": 64,
        "window_frames": 256,
        "beam_size": cfg.decode.beam_size,
        "by_stream_length_s": per_len,
        "compiled_chunk_programs": st.cb._compiled.cache_info().currsize,
        "device": str(jax.devices()[0]),
    }
    out = (Path(__file__).resolve().parent.parent / "bench_results"
           / "r5_streaming.json")
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec, indent=2), flush=True)


if __name__ == "__main__":
    main()
