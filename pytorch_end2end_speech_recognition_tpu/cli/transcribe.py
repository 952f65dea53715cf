"""One-shot transcription of WAV files with a trained checkpoint.

Capability parity: the genre's `recognize.py` / `transcribe.py` convenience
entry (deepspeech.pytorch-style single-file inference) on top of the same
model/decoder stack as cli/decode.py. Usage:

    python -m pytorch_end2end_speech_recognition_tpu.cli.transcribe \
        --config cfg.json --checkpoint-tag best a.wav b.wav \
        [--mode beam --beam-size 10] [--streaming --chunk-s 8]

`--streaming` transcribes each file through the chunked overlap-carry
streaming encoder (models/streaming.py) instead of one batch encode —
the path for unbounded-length audio.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint-tag", default="best")
    ap.add_argument("--mode", default="greedy", choices=["greedy", "beam"])
    ap.add_argument("--beam-size", type=int, default=None)
    ap.add_argument("--lm-weight", type=float, default=None)
    ap.add_argument("--lm-checkpoint", default=None)
    ap.add_argument("--streaming", action="store_true",
                    help="chunked streaming encode; with --mode beam, "
                         "greedy partials + chunk-final joint beam")
    ap.add_argument("--chunk-s", type=float, default=8.0)
    ap.add_argument("--overlap-s", type=float, default=2.0)
    # chunk-synchronized beam knobs (decode/chunk_beam.py; --mode beam)
    ap.add_argument("--beam-chunk-frames", type=int, default=64,
                    help="encoder frames per beam advance")
    ap.add_argument("--beam-window-frames", type=int, default=256,
                    help="sliding attention/CTC window (fidelity knob)")
    ap.add_argument("--beam-max-tokens", type=int, default=256,
                    help="carried-hypothesis token budget (O(1) state)")
    ap.add_argument("--set", action="append", default=[], metavar="K=V")
    ap.add_argument("wavs", nargs="+", help="WAV files to transcribe")
    args = ap.parse_args(argv)

    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
        maybe_force_cpu,
    )

    maybe_force_cpu()
    enable_compilation_cache()

    import numpy as np

    from pytorch_end2end_speech_recognition_tpu.cli.train import load_config
    from pytorch_end2end_speech_recognition_tpu.data.audio import (
        read_wav,
        resample,
    )
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        load_for_config,
    )
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
    from pytorch_end2end_speech_recognition_tpu.utils.config import (
        parse_overrides,
    )

    cfg = parse_overrides(load_config(args.config), args.set)
    if args.beam_size is not None:
        cfg.decode.beam_size = args.beam_size
    if args.lm_weight is not None:
        cfg.decode.lm_weight = args.lm_weight
    tok = load_for_config(cfg)
    solver = Solver(cfg, tok)
    solver.load_checkpoint(args.checkpoint_tag)
    model = solver.merged_model()
    sr = cfg.frontend.sample_rate

    def load_audio(path):
        wav, wav_sr = read_wav(path)
        if wav_sr != sr:
            wav = resample(wav, wav_sr, sr)
        return np.asarray(wav, np.float32)

    if args.streaming:
        from pytorch_end2end_speech_recognition_tpu.models.streaming import (
            StreamingBeamTranscriber,
            StreamingTranscriber,
        )

        if args.mode == "beam":
            lm = None
            if args.lm_checkpoint and cfg.decode.lm_weight > 0:
                from pytorch_end2end_speech_recognition_tpu.cli.train_lm import (
                    load_lm,
                )

                lm = load_lm(args.lm_checkpoint, cfg, tok)
            st = StreamingBeamTranscriber(
                model, tok, cfg.decode, lm=lm,
                chunk_s=args.chunk_s, overlap_s=args.overlap_s,
                chunk_frames=args.beam_chunk_frames,
                window_frames=args.beam_window_frames,
                max_tokens=args.beam_max_tokens)
        else:
            st = StreamingTranscriber(model, tok, chunk_s=args.chunk_s,
                                      overlap_s=args.overlap_s)
        for path in args.wavs:
            audio = load_audio(path)
            step = int(args.chunk_s * sr)
            chunks = [audio[i : i + step] for i in range(0, len(audio), step)]
            text = st.transcribe_stream(chunks or [audio])
            print(json.dumps({"file": path, "text": text}))
        return

    beam = None
    if args.mode == "beam":
        from pytorch_end2end_speech_recognition_tpu.decode.beam import (
            BeamSearchDecoder,
        )

        lm = None
        if args.lm_checkpoint and cfg.decode.lm_weight > 0:
            from pytorch_end2end_speech_recognition_tpu.cli.train_lm import (
                load_lm,
            )

            lm = load_lm(args.lm_checkpoint, cfg, tok)
        beam = BeamSearchDecoder(model, cfg.decode, lm=lm)

    import jax
    import jax.numpy as jnp

    from pytorch_end2end_speech_recognition_tpu.ops.ctc import (
        ctc_greedy_decode,
    )

    for path in args.wavs:
        audio = load_audio(path)
        # pad to a coarse bucket to bound recompiles across files
        bucket = 1 << max(int(np.ceil(np.log2(max(len(audio), sr)))), 0)
        a = np.zeros((1, bucket), np.float32)
        a[0, : len(audio)] = audio
        lens = jnp.asarray([len(audio)], jnp.int32)
        if beam is not None:
            enc, enc_lens = model.encode(jnp.asarray(a), lens, train=False)
            logp = jax.nn.log_softmax(model.ctc_logits(enc), axis=-1)
            max_len = max(4, int(cfg.decode.max_decode_ratio * enc.shape[1]))
            out = beam.search_arrays(enc, enc_lens, logp, max_len)
            n = int(out["lengths"][0, 0])
            text = tok.decode(np.asarray(out["tokens"])[0, 0, :n].tolist())
        else:
            enc, enc_lens = model.encode(jnp.asarray(a), lens, train=False)
            hyp, hyp_lens = ctc_greedy_decode(model.ctc_logits(enc), enc_lens)
            text = tok.decode(np.asarray(hyp)[0, : int(hyp_lens[0])])
        print(json.dumps({"file": path, "text": text}))


if __name__ == "__main__":
    main()
