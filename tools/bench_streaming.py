"""Streaming transcription RTF on the real TPU (r3 VERDICT item 9).

Feeds a long utterance through StreamingBeamTranscriber in real-time-sized
chunks and reports: per-feed compute latency, total compute RTF for the
greedy-partial stream, and the chunk-final joint-beam rescoring cost.
Writes bench_results/r4_streaming.json.

Usage: python tools/bench_streaming.py [audio_seconds] [feed_seconds]
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


def main():
    audio_s = float(sys.argv[1]) if len(sys.argv) > 1 else 60.0
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
                                  chunk_s=8.0, overlap_s=2.0)

    sr = cfg.frontend.sample_rate
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(int(audio_s * sr)) * 0.1).astype(np.float32)
    feed = int(feed_s * sr)
    chunks = [audio[i : i + feed] for i in range(0, len(audio), feed)]

    # warm-up pass compiles all window buckets + the final beam shape
    stream = st.init_stream()
    for i, c in enumerate(chunks):
        stream = st.feed(stream, c, final=(i == len(chunks) - 1))
    st.final_nbest(stream)

    # timed pass
    lat = []
    stream = st.init_stream()
    t_all = time.perf_counter()
    for i, c in enumerate(chunks):
        t0 = time.perf_counter()
        stream = st.feed(stream, c, final=(i == len(chunks) - 1))
        lat.append(time.perf_counter() - t0)
    t_stream = time.perf_counter() - t_all
    t0 = time.perf_counter()
    nbest = st.final_nbest(stream)
    t_beam = time.perf_counter() - t0

    rec = {
        "model": "flagship 12L/d256 conformer + 2L transformer decoder, "
                 "bf16 + Pallas kernels",
        "audio_s": audio_s,
        "feed_s": feed_s,
        "chunk_s": 8.0,
        "overlap_s": 2.0,
        "stream_rtf": round(t_stream / audio_s, 5),
        "feed_latency_ms": {
            "median": round(1e3 * statistics.median(lat), 2),
            "p95": round(1e3 * sorted(lat)[int(0.95 * len(lat))], 2),
            "max": round(1e3 * max(lat), 2),
        },
        "final_beam_s": round(t_beam, 3),
        "total_rtf": round((t_stream + t_beam) / audio_s, 5),
        "beam_size": cfg.decode.beam_size,
        "device": str(jax.devices()[0]),
    }
    out = Path(__file__).resolve().parent.parent / "bench_results" / "r4_streaming.json"
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec, indent=2), flush=True)
    assert nbest is not None


if __name__ == "__main__":
    main()
