"""Checkpoint averaging: write an `avg` checkpoint from N snapshots.

Genre parity: ESPnet-style model averaging (`average_checkpoints` over the
last/best N epochs) is the standard cheap WER win for attention/CTC models
(SURVEY.md §2a "Checkpointing" genre row). Average the *params* of several
step checkpoints; carry opt_state/meta from the newest so `--resume` off an
averaged tag still works.

    python -m pytorch_end2end_speech_recognition_tpu.cli.average_ckpts \
        --ckpt-dir exp/ckpt --last-n 3 --out-tag avg
"""

from __future__ import annotations

import argparse
import shutil
import sys
from pathlib import Path

import numpy as np


def _avg_leaves(leaves: list[np.ndarray]) -> np.ndarray:
    first = np.asarray(leaves[0])
    if not np.issubdtype(first.dtype, np.floating):
        return first  # counters/int leaves: keep the newest-listed
    acc = np.zeros(first.shape, np.float32)
    for x in leaves:
        acc += np.asarray(x, np.float32)
    return (acc / len(leaves)).astype(first.dtype)


def average_checkpoints(ckpt_dir: str, tags: list[str],
                        out_tag: str = "avg") -> Path:
    """Average `params` across tags (newest first); save under out_tag."""
    import jax
    import orbax.checkpoint as ocp

    if len(tags) < 1:
        raise ValueError("need at least one checkpoint tag to average")
    if out_tag in ("last", "best") or out_tag.startswith("step_"):
        raise ValueError(
            f"--out-tag {out_tag!r} collides with a source checkpoint tag "
            "(last/best/step_*); averaging would rmtree a real checkpoint. "
            "Pick a distinct name like 'avg'.")
    ckptr = ocp.StandardCheckpointer()
    base = Path(ckpt_dir)
    trees = [ckptr.restore((base / t).absolute()) for t in tags]
    params = [t["params"] for t in trees]
    avg = jax.tree_util.tree_map(
        lambda *xs: _avg_leaves(list(xs)), *params)
    out = dict(trees[0])  # newest: opt_state + meta (step, rng, cursor...)
    out["params"] = avg
    out_path = (base / out_tag).absolute()
    if out_path.exists():
        shutil.rmtree(out_path)
    ckptr.save(out_path, out)
    ckptr.wait_until_finished()
    # carry config provenance from the newest source tag if present
    src_cfg = base / f"{tags[0]}.config.json"
    if src_cfg.exists():
        shutil.copyfile(src_cfg, base / f"{out_tag}.config.json")
    return out_path


def pick_last_n(ckpt_dir: str, n: int) -> list[str]:
    steps = sorted(p.name for p in Path(ckpt_dir).glob("step_*")
                   if p.is_dir())
    if not steps:
        raise FileNotFoundError(
            f"no step_* checkpoints under {ckpt_dir}; train with "
            "train.checkpoint_every set, or pass --tags explicitly")
    if len(steps) < n:
        print(f"[average_ckpts] WARNING: only {len(steps)} step_* "
              f"checkpoints under {ckpt_dir}, averaging fewer than the "
              f"requested {n}", file=sys.stderr)
    return list(reversed(steps[-n:]))  # newest first


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out-tag", default="avg")
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--tags", nargs="+",
                   help="explicit tags, newest first (meta comes from the "
                        "first)")
    g.add_argument("--last-n", type=int,
                   help="average the newest N step_* checkpoints")
    args = ap.parse_args(argv)
    tags = args.tags or pick_last_n(args.ckpt_dir, args.last_n)
    path = average_checkpoints(args.ckpt_dir, tags, args.out_tag)
    print(f"averaged {len(tags)} checkpoints ({', '.join(tags)}) "
          f"-> {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
