"""Training entry point.

Capability parity: the reference genre's `python main.py --config x.yaml`
(SURVEY.md §2a "CLI entry points", L8). Usage:

    python -m pytorch_end2end_speech_recognition_tpu.cli.train \
        --config configs/an4_ctc.json [--set train.lr=1e-3 ...] [--resume]

Multi-host (the genre's torch.distributed.launch, SURVEY.md §3.3): run the
SAME command on every host with either `--distributed` (TPU pods: coordinator
auto-discovered from the cluster env) or explicit rendezvous flags /
ASR_COORDINATOR_ADDRESS, ASR_NUM_PROCESSES, ASR_PROCESS_ID env vars:

    python -m ...cli.train --config rung5.json --distributed
    # or, on generic hosts:
    ASR_COORDINATOR_ADDRESS=host0:1234 ASR_NUM_PROCESSES=2 \
        ASR_PROCESS_ID=$RANK python -m ...cli.train --config rung5.json

Each host then feeds its shard of every global batch (BucketedLoader
shard_index/num_shards) and dev WER is reduced across hosts.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", required=True, help="config JSON path or preset name")
    ap.add_argument("--set", action="append", default=[], metavar="K=V",
                    help="dotted config override, e.g. train.lr=1e-3")
    ap.add_argument("--resume", action="store_true",
                    help="resume from <checkpoint_dir>/last")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-host: jax.distributed.initialize() with "
                         "cluster auto-detection (TPU pods)")
    ap.add_argument("--coordinator",
                    default=os.environ.get("ASR_COORDINATOR_ADDRESS"),
                    help="host:port of process 0 (generic multi-host)")
    ap.add_argument("--num-processes", type=int,
                    default=int(os.environ.get("ASR_NUM_PROCESSES", 0)) or None)
    ap.add_argument("--process-id", type=int,
                    default=int(os.environ.get("ASR_PROCESS_ID", -1))
                    if os.environ.get("ASR_PROCESS_ID") else None)
    return ap


def load_config(spec: str):
    from pytorch_end2end_speech_recognition_tpu.configs import presets
    from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig

    if Path(spec).exists():
        return AsrConfig.from_json(Path(spec).read_text())
    if spec in presets.PRESETS:
        return presets.PRESETS[spec]()
    raise SystemExit(f"config '{spec}' is neither a file nor a preset "
                     f"(presets: {sorted(presets.PRESETS)})")


def main(argv=None):
    args = build_argparser().parse_args(argv)
    from pytorch_end2end_speech_recognition_tpu.utils.platform import (
        enable_compilation_cache,
        maybe_force_cpu,
    )

    maybe_force_cpu()
    enable_compilation_cache()
    from pytorch_end2end_speech_recognition_tpu.parallel.mesh import (
        host_shard_info,
        initialize_multihost,
        make_mesh,
    )

    if args.distributed or args.coordinator:
        initialize_multihost(args.coordinator, args.num_processes,
                             args.process_id)
    from pytorch_end2end_speech_recognition_tpu.data.dataset import BucketedLoader
    from pytorch_end2end_speech_recognition_tpu.data.manifest import read_manifest
    from pytorch_end2end_speech_recognition_tpu.data.tokenizer import (
        Tokenizer,
        build_tokenizer,
    )
    from pytorch_end2end_speech_recognition_tpu.training.solver import Solver
    from pytorch_end2end_speech_recognition_tpu.utils.config import parse_overrides

    cfg = parse_overrides(load_config(args.config), args.set)
    train_utts = read_manifest(cfg.data.train_manifest)
    shard_index, num_shards = host_shard_info()
    ckpt_dir = Path(cfg.train.checkpoint_dir)
    ckpt_tok = ckpt_dir / "tokenizer.json"
    if cfg.data.tokenizer_path and Path(cfg.data.tokenizer_path).exists():
        tok = Tokenizer.load(cfg.data.tokenizer_path)
    elif ckpt_tok.exists():
        # authoritative copy from a previous run of this experiment: --resume
        # must not swap the vocab mid-training by rebuilding from a
        # possibly-changed manifest
        tok = Tokenizer.load(ckpt_tok)
    else:
        tok = build_tokenizer(cfg.data.tokenizer, [u.text for u in train_utts],
                              vocab_size=cfg.data.bpe_vocab_size)
        if cfg.data.tokenizer_path:
            tok.save(cfg.data.tokenizer_path)
    # drop a copy next to the checkpoints so decode/transcribe can resolve
    # the vocab without data.tokenizer_path (tokenizer.load_for_config).
    # Never overwrite an existing copy; process 0 only, atomic tmp+rename
    # (the ckpt dir may be shared GCS/NFS written by many hosts at once).
    ckpt_dir.mkdir(parents=True, exist_ok=True)
    if not ckpt_tok.exists() and shard_index == 0:
        tmp_tok = ckpt_tok.with_name("tokenizer.json.tmp")
        tok.save(tmp_tok)
        tmp_tok.replace(ckpt_tok)
    mesh = None
    if num_shards > 1 or cfg.train.dp * cfg.train.tp > 1:
        import jax

        tp = cfg.train.tp
        dp = cfg.train.dp
        if dp * tp != len(jax.devices()):
            dp = len(jax.devices()) // tp  # default: every global device
            print(f"[train] mesh defaulted to dp={dp} tp={tp} over "
                  f"{len(jax.devices())} devices / {num_shards} hosts",
                  file=sys.stderr)
        mesh = make_mesh(dp=dp, tp=tp)
    loader = BucketedLoader(train_utts, tok, cfg.data,
                            sample_rate=cfg.frontend.sample_rate,
                            shard_index=shard_index, num_shards=num_shards)
    dev_loader = None
    if cfg.data.dev_manifest:
        dev_loader = BucketedLoader(
            read_manifest(cfg.data.dev_manifest), tok, cfg.data,
            sample_rate=cfg.frontend.sample_rate, train=False,
            shard_index=shard_index, num_shards=num_shards,
        )
    solver = Solver(cfg, tok, mesh=mesh)
    if args.resume:
        from pytorch_end2end_speech_recognition_tpu.training.checkpoint import (
            latest_step_checkpoint,
        )

        tag = "last"
        if not Path(cfg.train.checkpoint_dir, "last").exists():
            tag = latest_step_checkpoint(cfg.train.checkpoint_dir)
        if tag:
            print(f"resuming from {tag}", file=sys.stderr)
            solver.load_checkpoint(tag)
        else:
            print("no checkpoint found; starting fresh", file=sys.stderr)
    try:
        solver.fit(loader, dev_loader, steps=args.steps)
    finally:
        solver.save_checkpoint("last")
    print(f"done at step {solver.step}; best dev WER {solver.best_wer:.4f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
