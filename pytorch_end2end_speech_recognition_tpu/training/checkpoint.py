"""Checkpoint save/restore via Orbax.

Capability parity: the reference genre's `torch.save({model, optim, epoch,
best_wer})` + `--resume` (SURVEY.md §2a "Checkpointing", §5.4). Orbax gives
sharded async-capable saves and resharding-aware restore; the config JSON is
stored alongside for provenance.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import orbax.checkpoint as ocp

from pytorch_end2end_speech_recognition_tpu.utils.config import AsrConfig


def _default_meta() -> dict:
    """Training-state metadata beyond (params, opt): step, best metric,
    PRNG key, loader cursor, plateau-LR state (SURVEY.md §5.4)."""
    return {
        "step": np.asarray(0),
        "best_wer": np.asarray(0.0, np.float32),
        # fixed 4-word slot: threefry keys are 2 uint32s, rbg keys 4; the
        # actual width rides in rng_len and save/restore pad/slice to it
        "rng": np.zeros((4,), np.uint32),
        "rng_len": np.asarray(2),
        "cursor_epoch": np.asarray(0),
        "cursor_batch": np.asarray(0),
        "lr_scale": np.asarray(1.0, np.float32),
        "evals_since_best": np.asarray(0),
        # crc32 of the tokenizer vocab (0 = unknown, for pre-r3 checkpoints)
        "vocab_hash": np.asarray(0, np.uint32),
    }


def save_checkpoint(
    ckpt_dir: str, tag: str, params, opt_state, step: int, best_wer: float,
    cfg: AsrConfig | None = None, extra_meta: dict | None = None,
) -> None:
    path = (Path(ckpt_dir) / tag).absolute()
    ckptr = ocp.StandardCheckpointer()
    meta = _default_meta()
    meta["step"] = np.asarray(step)
    meta["best_wer"] = np.asarray(best_wer, np.float32)
    for k, v in (extra_meta or {}).items():
        v = np.asarray(v, meta[k].dtype)
        if k == "rng":  # zero-pad narrower key impls into the 4-word slot
            meta["rng_len"] = np.asarray(v.size)
            v = np.pad(v.reshape(-1), (0, meta[k].size - v.size))
        meta[k] = v.reshape(meta[k].shape)
    tree = {"params": params, "opt_state": opt_state, "meta": meta}
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
        "meta": _default_meta(),
    }
    restored = ckptr.restore(path, target)
    out = {
        "params": restored["params"],
        "opt_state": restored["opt_state"],
    }
    out.update(restored["meta"])
    return out


def save_step_checkpoint(
    ckpt_dir: str, step: int, params, opt_state, best_wer: float,
    cfg: AsrConfig | None = None, max_to_keep: int = 3,
    extra_meta: dict | None = None,
) -> None:
    """Step-tagged checkpoint with retention of the newest `max_to_keep`
    (genre parity: periodic snapshots; best/last tags are kept separately)."""
    import shutil

    save_checkpoint(ckpt_dir, f"step_{step:08d}", params, opt_state, step,
                    best_wer, cfg, extra_meta=extra_meta)
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
