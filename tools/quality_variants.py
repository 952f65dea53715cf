"""Variant quality runs on the commands corpus (r4 VERDICT tasks 5 & 7).

  rung3  — the libri100_transformer pairing (12L transformer encoder +
           6L transformer decoder, configs/presets.py:62-91) trained on
           the commands corpus: the last ladder rung without trained
           evidence.
  bpeN   — the conformer recipe with the from-scratch BPE tokenizer at
           vocab size N (e.g. bpe96, bpe160, bpe256): the r4 BPE result
           (test 0.0485 vs char 0.0077 on the tone corpus) needed a sweep
           or a diagnosis; the commands corpus has a real lexicon where
           subwords are meaningful.

Reuses an existing corpus dir (default /tmp/cmdq/corpus) so variants are
decode-comparable with the char-conformer run in r5_quality.json.
Writes bench_results/r5_quality_<variant>.json.

Usage: python tools/quality_variants.py <variant> [workdir] [steps] [k=v...]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
import json
import time

from quality_commands import decode_per_utt
from quality_digits import build_cfg


def main():
    variant = sys.argv[1]
    workdir = Path(sys.argv[2] if len(sys.argv) > 2
                   else f"/tmp/cmdq_{variant}")
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 4000
    corpus_dir = Path("/tmp/cmdq/corpus")
    overrides = []
    for kv in sys.argv[4:]:
        k, v = kv.split("=", 1)
        if k == "corpus":
            corpus_dir = Path(v)
        else:
            overrides.append(kv)
    workdir.mkdir(parents=True, exist_ok=True)
    t0 = time.time()
    if not (corpus_dir / "train.jsonl").exists():
        from pytorch_end2end_speech_recognition_tpu.data.synthetic import (
            make_commands_corpus,
        )

        # generate INTO the requested path so a corpus=... override is
        # never silently substituted (r5 review finding)
        make_commands_corpus(corpus_dir, n_train=4000,
                             n_dev=600, n_test=600, snr_db=8.0)

    cfg = build_cfg(workdir, corpus_dir, steps)
    cfg.name = f"commands_{variant}"
    if variant == "rung3":
        # the rung-3 pairing: transformer encoder + 6L transformer decoder
        cfg.model.encoder = "transformer"
        cfg.model.encoder_layers = 12
        cfg.model.decoder_layers = 6
        cfg.model.decoder_heads = 4
        cfg.model.decoder_ffn_dim = 1024
    elif variant.startswith("bpe"):
        cfg.data.tokenizer = "bpe"
        cfg.data.bpe_vocab_size = int(variant[3:])
    else:
        raise SystemExit(f"unknown variant {variant}")
    for kv in overrides:
        k, v = kv.split("=", 1)
        cfg.override(k, v)
    cfg_path = workdir / "config.json"
    cfg_path.write_text(cfg.to_json())

    from pytorch_end2end_speech_recognition_tpu.cli import train
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        load_for_config,
    )
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
    from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig

    if not (Path(cfg.train.checkpoint_dir) / "best").exists():
        train.main(["--config", str(cfg_path)])
        print(f"train done: {time.time()-t0:.0f}s", flush=True)
    cfg = AsrConfig.from_json(cfg_path.read_text())

    tok = load_for_config(cfg)
    solver = Solver(cfg, tok)
    solver.load_checkpoint("best")
    decode_per_utt._model = solver.merged_model()

    res = {}
    for split in ("dev", "test"):
        r = decode_per_utt(cfg, tok, None, str(corpus_dir / f"{split}.jsonl"),
                           0.0)
        res[split] = {k: v for k, v in r.items() if not k.startswith("_")}
        print(f"[{variant}] {split}: wer={r['wer']} cer={r['cer']} "
              f"({r['word_errors']}/{r['n_words']} words)", flush=True)

    rec = {
        "recipe": f"commands_{variant}",
        "variant": variant,
        "corpus": str(corpus_dir),
        "steps": steps,
        "tokenizer": cfg.data.tokenizer,
        "bpe_vocab_size": (cfg.data.bpe_vocab_size
                           if cfg.data.tokenizer == "bpe" else None),
        "vocab_size": tok.vocab_size,
        "dev": res["dev"],
        "test": res["test"],
        "wall_s": round(time.time() - t0, 1),
    }
    out = (Path(__file__).resolve().parent.parent / "bench_results"
           / f"r5_quality_{variant}.json")
    out.write_text(json.dumps(rec, indent=2))
    print(json.dumps(rec, indent=2), flush=True)


if __name__ == "__main__":
    main()
