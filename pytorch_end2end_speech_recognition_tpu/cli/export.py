"""Export a trained checkpoint as an AOT serving bundle (StableHLO).

    python -m pytorch_end2end_speech_recognition_tpu.cli.export \
        --config cfg.json --checkpoint-tag best --out-dir bundle/ \
        [--mode greedy|beam] [--batch-sizes 1,8] [--seconds 10,30] \
        [--platforms tpu,cpu]

The bundle directory is self-contained: a serving host needs only
`serving.load_bundle(dir).transcribe(...)` (plus the tokenizer.json inside),
not the model code or checkpoint. See serving/export.py.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint-tag", default="best")
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--mode", default="greedy", choices=["greedy", "beam"])
    ap.add_argument("--batch-sizes", default="1,8")
    ap.add_argument("--seconds", default="10,30")
    ap.add_argument("--platforms", default="",
                    help="comma list (e.g. tpu,cpu); default: current")
    args = ap.parse_args(argv)

    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
        maybe_force_cpu,
    )

    maybe_force_cpu()
    enable_compilation_cache()

    from pytorch_end2end_speech_recognition_tpu.cli.train import load_config
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        load_for_config,
    )
    from pytorch_end2end_speech_recognition_tpu.serving.export import (
        export_bundle,
    )

    cfg = load_config(args.config)
    tok = load_for_config(cfg)
    out = export_bundle(
        cfg, tok, args.out_dir, checkpoint_tag=args.checkpoint_tag,
        mode=args.mode,
        batch_sizes=[int(x) for x in args.batch_sizes.split(",")],
        seconds=[float(x) if "." in x else int(x)
                 for x in args.seconds.split(",")],
        platforms=[p for p in args.platforms.split(",") if p] or None,
    )
    print(f"exported serving bundle -> {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
