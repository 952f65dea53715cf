"""Decoding/scoring entry point: greedy CTC or joint beam search + WER/CER.

Capability parity: the reference genre's `main.py --test` / `decode.py`
(SURVEY.md §3.2, L6/L8). Usage:

    python -m pytorch_end2end_speech_recognition_tpu.cli.decode \
        --config cfg.json --checkpoint-tag best --manifest test.jsonl \
        [--mode beam --beam-size 10 --lm-weight 0.3 --lm-checkpoint lm_dir]
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint-tag", default="best")
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--mode", default=None,
                    choices=[None, "greedy", "beam", "attention"])
    ap.add_argument("--beam-size", type=int, default=None)
    ap.add_argument("--lm-weight", type=float, default=None)
    ap.add_argument("--lm-checkpoint", default=None)
    ap.add_argument("--nbest-out", default=None, help="write N-best JSONL here")
    ap.add_argument("--set", action="append", default=[], metavar="K=V")
    args = ap.parse_args(argv)
    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
        maybe_force_cpu,
    )

    maybe_force_cpu()
    enable_compilation_cache()

    from pytorch_end2end_speech_recognition_tpu.cli.train import load_config
    from pytorch_end2end_speech_recognition_tpu.data.dataset import BucketedLoader
    from pytorch_end2end_speech_recognition_tpu.data.manifest import read_manifest
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        load_for_config,
    )
    from pytorch_end2end_speech_recognition_tpu.metrics.wer import ErrorStats
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
    from pytorch_end2end_speech_recognition_tpu.utils.config import parse_overrides

    cfg = parse_overrides(load_config(args.config), args.set)
    if args.mode == "attention":      # attention-only beam (no CTC scorer)
        cfg.decode.mode = "beam"
        cfg.decode.ctc_weight = 0.0
    elif args.mode:
        cfg.decode.mode = args.mode
    if args.beam_size is not None:
        cfg.decode.beam_size = args.beam_size
    if args.lm_weight is not None:
        cfg.decode.lm_weight = args.lm_weight

    tok = load_for_config(cfg)
    solver = Solver(cfg, tok)
    solver.load_checkpoint(args.checkpoint_tag)

    utts = read_manifest(args.manifest)
    loader = BucketedLoader(utts, tok, cfg.data,
                            sample_rate=cfg.frontend.sample_rate, train=False)

    beam = None
    if cfg.decode.mode == "beam":
        from pytorch_end2end_speech_recognition_tpu.decode.beam import (
            BeamSearchDecoder,
        )

        lm = None
        if args.lm_checkpoint and cfg.decode.lm_weight > 0:
            from pytorch_end2end_speech_recognition_tpu.cli.train_lm import (
                load_lm,
            )

            lm = load_lm(args.lm_checkpoint, cfg, tok)
        # multi-device eval: DP/TP-shard decode over the training mesh so a
        # pod's chips don't idle during eval (single-process only; multi-host
        # decode already data-parallelizes via per-host loader shards)
        mesh = None
        import jax

        if (cfg.train.dp * cfg.train.tp > 1 and jax.process_count() == 1
                and len(jax.devices()) == cfg.train.dp * cfg.train.tp):
            from pytorch_end2end_speech_recognition_tpu.parallel.mesh import (
                make_mesh,
            )

            mesh = make_mesh(dp=cfg.train.dp, tp=cfg.train.tp)
            print(f"[decode] mesh dp={cfg.train.dp} tp={cfg.train.tp}",
                  file=sys.stderr)
        beam = BeamSearchDecoder(solver.merged_model(), cfg.decode, lm=lm,
                                 mesh=mesh)

    wer_stats, cer_stats = ErrorStats(), ErrorStats()
    nbest_f = open(args.nbest_out, "w") if args.nbest_out else None
    for batch in loader.epoch(0):
        if beam is not None:
            results = beam.decode_batch(batch, tok)
            hyps = [r[0]["text"] if r else "" for r in results]
            if nbest_f:
                for uid, r in zip(batch.ids, results):
                    nbest_f.write(json.dumps({"id": uid, "nbest": r}) + "\n")
        else:
            hyps = solver.decode_batch(batch)
        for i, (ref, hyp) in enumerate(zip(batch.texts, hyps)):
            if batch.audio_lens[i] == 0:
                continue
            wer_stats.update(ref.split(), hyp.split())
            cer_stats.update(list(ref.replace(" ", "")),
                             list(hyp.replace(" ", "")))
            print(json.dumps({"id": batch.ids[i], "ref": ref, "hyp": hyp}))
    if nbest_f:
        nbest_f.close()
    print(
        f"WER {wer_stats.rate:.4f} ({wer_stats.errors}/{wer_stats.tokens})  "
        f"CER {cer_stats.rate:.4f}  SER {wer_stats.ser:.4f}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
