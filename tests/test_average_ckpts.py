"""Checkpoint averaging (cli/average_ckpts) — ESPnet-style model averaging."""

import numpy as np
import orbax.checkpoint as ocp
import pytest

from pytorch_end2end_speech_recognition_tpu.cli.average_ckpts import (
    average_checkpoints,
    pick_last_n,
)
from pytorch_end2end_speech_recognition_tpu.training.checkpoint import (
    save_checkpoint,
)


def _save(ckpt_dir, step, w):
    params = {"enc": {"w": np.full((4, 8), w, np.float32),
                      "steps_seen": np.asarray(step, np.int32)}}
    opt_state = {"mu": np.full((4, 8), w * 10, np.float32)}
    save_checkpoint(str(ckpt_dir), f"step_{step:08d}", params, opt_state,
                    step=step, best_wer=0.5)


def test_average_is_param_mean_and_meta_from_newest(tmp_path):
    for step, w in ((1, 1.0), (2, 2.0), (3, 6.0)):
        _save(tmp_path, step, w)
    tags = pick_last_n(str(tmp_path), 3)
    assert tags == ["step_00000003", "step_00000002", "step_00000001"]
    out = average_checkpoints(str(tmp_path), tags, "avg")

    restored = ocp.StandardCheckpointer().restore(out)
    np.testing.assert_allclose(restored["params"]["enc"]["w"],
                               np.full((4, 8), 3.0))  # (1+2+6)/3
    # int leaves are not averaged: newest wins
    assert int(restored["params"]["enc"]["steps_seen"]) == 3
    # opt_state + meta carried from the newest tag so --resume still works
    np.testing.assert_allclose(restored["opt_state"]["mu"],
                               np.full((4, 8), 60.0))
    assert int(restored["meta"]["step"]) == 3


def test_pick_last_n_subset_and_missing(tmp_path):
    for step in (1, 2, 3, 4):
        _save(tmp_path, step, float(step))
    assert pick_last_n(str(tmp_path), 2) == ["step_00000004",
                                             "step_00000003"]
    with pytest.raises(FileNotFoundError):
        pick_last_n(str(tmp_path / "empty"), 2)


def test_out_tag_collision_rejected(tmp_path):
    """--out-tag must not name a source checkpoint: averaging rmtree's the
    target, so 'last'/'best'/'step_*' would destroy a real checkpoint
    (ADVICE.md r2)."""
    for step in (1, 2):
        _save(tmp_path, step, float(step))
    tags = pick_last_n(str(tmp_path), 2)
    for bad in ("last", "best", "step_00000001"):
        with pytest.raises(ValueError, match="collides"):
            average_checkpoints(str(tmp_path), tags, bad)


def test_pick_last_n_warns_when_fewer(tmp_path, capsys):
    _save(tmp_path, 1, 1.0)
    assert pick_last_n(str(tmp_path), 3) == ["step_00000001"]
    assert "WARNING" in capsys.readouterr().err
