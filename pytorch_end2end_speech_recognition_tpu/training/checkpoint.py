"""Checkpoint save/restore via Orbax.

Capability parity: the reference genre's `torch.save({model, optim, epoch,
best_wer})` + `--resume` (SURVEY.md §2a "Checkpointing", §5.4). Orbax gives
sharded async-capable saves and resharding-aware restore; the config JSON is
stored alongside for provenance.
"""

from __future__ import annotations

import json
from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig


def save_checkpoint(
    ckpt_dir: str, tag: str, params, opt_state, step: int, best_wer: float,
    cfg: AsrConfig | None = None,
) -> None:
    path = (Path(ckpt_dir) / tag).absolute()
    ckptr = ocp.StandardCheckpointer()
    tree = {
        "params": params,
        "opt_state": opt_state,
        "meta": {
            "step": np.asarray(step),
            "best_wer": np.asarray(best_wer, np.float32),
        },
    }
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if cfg is not None:
        (path.parent / f"{tag}.config.json").write_text(cfg.to_json())


def load_checkpoint(ckpt_dir: str, tag: str, params_like, opt_state_like) -> dict:
    path = (Path(ckpt_dir) / tag).absolute()
    ckptr = ocp.StandardCheckpointer()
    target = {
        "params": params_like,
        "opt_state": opt_state_like,
        "meta": {
            "step": np.asarray(0),
            "best_wer": np.asarray(0.0, np.float32),
        },
    }
    restored = ckptr.restore(path, target)
    return {
        "params": restored["params"],
        "opt_state": restored["opt_state"],
        "step": restored["meta"]["step"],
        "best_wer": restored["meta"]["best_wer"],
    }


def save_step_checkpoint(
    ckpt_dir: str, step: int, params, opt_state, best_wer: float,
    cfg: AsrConfig | None = None, max_to_keep: int = 3,
) -> None:
    """Step-tagged checkpoint with retention of the newest `max_to_keep`
    (genre parity: periodic snapshots; best/last tags are kept separately)."""
    import shutil

    save_checkpoint(ckpt_dir, f"step_{step:08d}", params, opt_state, step,
                    best_wer, cfg)
    steps = sorted(
        p for p in Path(ckpt_dir).glob("step_*") if p.is_dir()
    )
    for old in steps[:-max_to_keep]:
        shutil.rmtree(old, ignore_errors=True)
        extra = old.parent / f"{old.name}.config.json"
        if extra.exists():
            extra.unlink()


def latest_step_checkpoint(ckpt_dir: str) -> str | None:
    steps = sorted(p for p in Path(ckpt_dir).glob("step_*") if p.is_dir())
    return steps[-1].name if steps else None


def load_config(ckpt_dir: str, tag: str) -> AsrConfig | None:
    p = Path(ckpt_dir) / f"{tag}.config.json"
    if p.exists():
        return AsrConfig.from_json(p.read_text())
    return None
