"""Self-contained demo: synthesize a digits corpus, train, decode, report WER.

The canonical smoke for this framework on a machine with no speech data
(see .claude/skills/verify/SKILL.md). CPU-runnable in ~2 minutes.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--encoder", default="blstm",
                    choices=["blstm", "pblstm", "transformer", "conformer"])
    ap.add_argument("--ctc-weight", type=float, default=1.0)
    ap.add_argument("--decoder", default="lstm",
                    choices=["lstm", "transformer"])
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    args = ap.parse_args(argv)

    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
        maybe_force_cpu,
    )

    maybe_force_cpu(args.cpu)
    enable_compilation_cache()

    from pytorch_end2end_speech_recognition_tpu.data.dataset import BucketedLoader
    from pytorch_end2end_speech_recognition_tpu.data.manifest import read_manifest
    from pytorch_end2end_speech_recognition_tpu.data.synthetic import (
        make_digits_corpus,
    )
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import CharTokenizer
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
    from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig

    work = Path(args.workdir)
    work.mkdir(parents=True, exist_ok=True)
    manifests = make_digits_corpus(work / "corpus", n_train=48, n_dev=12,
                                   n_test=12, max_digits=3)
    utts = read_manifest(manifests["train"])
    tok = CharTokenizer([u.text for u in utts])
    tok.save(work / "tokenizer.json")

    cfg = AsrConfig(name="demo")
    cfg.data.tokenizer_path = str(work / "tokenizer.json")
    cfg.model.encoder = args.encoder
    cfg.model.encoder_layers = 2
    cfg.model.encoder_dim = 96
    cfg.model.ctc_weight = args.ctc_weight
    cfg.model.decoder = args.decoder
    if args.decoder == "transformer":
        cfg.model.decoder_layers = 2
        cfg.model.decoder_dim = 96
        cfg.model.decoder_heads = 4
    cfg.model.dtype = "float32"
    cfg.frontend.spec_augment = False
    cfg.data.batch_size = 8
    cfg.data.n_length_buckets = 2
    cfg.train.lr = 1e-3
    cfg.train.schedule = "constant"
    cfg.train.log_every = 50
    cfg.train.metrics_path = str(work / "metrics.jsonl")
    cfg.train.checkpoint_dir = str(work / "ckpt")

    loader = BucketedLoader(utts, tok, cfg.data)
    dev = BucketedLoader(read_manifest(manifests["dev"]), tok, cfg.data,
                         train=False)
    solver = Solver(cfg, tok)
    solver.fit(loader, steps=args.steps)
    solver.save_checkpoint("last")

    train_wer = solver.evaluate(loader)
    dev_wer = solver.evaluate(dev)
    b = next(iter(dev.epoch(0)))
    hyps = solver.decode_batch(b)
    for r, h in list(zip(b.texts, hyps))[:4]:
        print(f"  ref: {r}\n  hyp: {h}", file=sys.stderr)
    result = {"train_wer": train_wer, "dev_wer": dev_wer}
    if args.ctc_weight < 1.0:
        from pytorch_end2end_speech_recognition_tpu.decode.beam import (
            BeamSearchDecoder,
        )
        from pytorch_end2end_speech_recognition_tpu.metrics.wer import ErrorStats

        beam = BeamSearchDecoder(solver.merged_model(), cfg.decode)
        stats = ErrorStats()
        for batch in dev.epoch(0):
            for i, r in enumerate(beam.decode_batch(batch, tok)):
                if batch.audio_lens[i] == 0:
                    continue
                hyp = r[0]["text"] if r else ""
                stats.update(batch.texts[i].split(), hyp.split())
        result["beam_dev_wer"] = stats.rate
        print(f"beam dev WER {stats.rate:.3f}", file=sys.stderr)
    print(f"train WER {train_wer:.3f}  dev WER {dev_wer:.3f}", file=sys.stderr)
    print(result)
    return train_wer


if __name__ == "__main__":
    main()
