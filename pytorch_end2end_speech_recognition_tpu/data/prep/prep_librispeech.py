"""LibriSpeech prep: local OpenSLR-12 tree -> JSONL manifests.

Capability parity: the reference genre's `prep_librispeech.py` (SURVEY.md §2a
"Corpus prep"). Requires an already-downloaded LibriSpeech split dir (zero
network egress here):

    python -m pytorch_end2end_speech_recognition_tpu.data.prep.prep_librispeech \
        --root /data/LibriSpeech --splits train-clean-100 dev-clean test-clean \
        --out data/librispeech

LibriSpeech ships FLAC; `data/flac.py` (and the C++ fast path in `native/`)
decodes it directly — `--ext flac` is the default and durations are exact
(read from each file's STREAMINFO header, no decode needed).
"""

from __future__ import annotations

import argparse
from pathlib import Path

from pytorch_end2end_speech_recognition_tpu.data.manifest import (
    Utterance,
    write_manifest,
)

SAMPLE_RATE = 16000


def prep_split(root: Path, split: str, out: Path, ext: str) -> int:
    split_dir = root / split
    if not split_dir.exists():
        raise SystemExit(f"{split_dir} not found — download LibriSpeech "
                         "locally first (this machine has no network egress)")
    utts = []
    for trans in sorted(split_dir.rglob("*.trans.txt")):
        for line in trans.read_text().splitlines():
            uid, _, text = line.partition(" ")
            audio = trans.parent / f"{uid}.{ext}"
            if not audio.exists():
                continue
            if ext == "wav":
                from pytorch_end2end_speech_recognition_tpu.data.audio import (
                    read_wav,
                )

                x, sr = read_wav(audio)
                dur = len(x) / sr
            else:
                # exact duration from the FLAC STREAMINFO header (no decode)
                from pytorch_end2end_speech_recognition_tpu.data.flac import (
                    flac_info,
                )

                dur = flac_info(audio).duration_s
            utts.append(Utterance(id=uid, audio=str(audio),
                                  duration_s=dur, text=text.strip()))
    write_manifest(out, utts)
    return len(utts)


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--root", required=True)
    ap.add_argument("--splits", nargs="+",
                    default=["train-clean-100", "dev-clean", "test-clean"])
    ap.add_argument("--out", required=True)
    ap.add_argument("--ext", default="flac", choices=["wav", "flac"])
    args = ap.parse_args(argv)
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    for split in args.splits:
        n = prep_split(Path(args.root), split, out / f"{split}.jsonl", args.ext)
        print(f"{split}: {n} utts")


if __name__ == "__main__":
    main()
