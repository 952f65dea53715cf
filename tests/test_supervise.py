"""Watchdog tests for cli/supervise.run_supervised (SURVEY.md §5.3).

r1 VERDICT "What's weak" #8: the kill/restart path was never exercised.
These tests inject a tiny stand-in child (via the `launcher` hook) so the
hang-detection SIGKILL, the crash-restart-with---resume, and the give-up
paths all run in a few seconds without training anything.
"""

import sys
import textwrap
from pathlib import Path

from pytorch_end2end_speech_recognition_tpu.cli.supervise import (
    run_supervised,
)

# Child behavior, selected by how many times it has already run (a counter
# file the child increments). Args: counter_file metrics_file mode
CHILD = textwrap.dedent("""
    # increment the run counter as the VERY first statement (before any
    # non-essential import): on a loaded CI box the watchdog's hang_timeout
    # races interpreter cold-start, and a SIGKILL before the increment would
    # break the runs == N assertions (ADVICE.md r2, test_supervise race)
    import sys
    with open(sys.argv[1], "a+") as f:
        f.seek(0)
        n = int(f.read() or 0)
        f.seek(0); f.truncate(); f.write(str(n + 1))
    import time, pathlib
    counter, metrics, mode = sys.argv[1], sys.argv[2], sys.argv[3]
    resumed = "--resume" in sys.argv
    if mode == "hang_then_ok":
        if n == 0:
            time.sleep(60)  # never touches metrics -> watchdog must SIGKILL
        pathlib.Path(metrics).write_text("step 1\\n")
        sys.exit(0 if resumed else 7)
    if mode == "crash_then_ok":
        if n == 0:
            sys.exit(3)
        pathlib.Path(metrics).write_text("step 1\\n")
        sys.exit(0 if resumed else 7)
    if mode == "always_crash":
        sys.exit(3)
""")


def _launch(tmp_path, mode, **kw):
    script = tmp_path / "child.py"
    script.write_text(CHILD)
    counter = tmp_path / "count"
    metrics = tmp_path / "metrics.jsonl"
    launcher = [sys.executable, str(script), str(counter), str(metrics), mode]
    rc = run_supervised([], metrics, poll_s=0.2, launcher=launcher, **kw)
    runs = int(counter.read_text()) if counter.exists() else 0
    return rc, runs, metrics


def test_hang_is_killed_and_restarted_with_resume(tmp_path):
    # run 1 hangs (no metrics progress) -> killpg after hang_timeout;
    # run 2 gets --resume, writes metrics, exits 0.
    # hang_timeout must cover interpreter cold-start on a loaded CI box,
    # or run 1 is killed before it ever increments the counter (the child
    # also increments before importing anything else, see CHILD)
    rc, runs, metrics = _launch(tmp_path, "hang_then_ok",
                                hang_timeout=6.0, max_restarts=2)
    assert rc == 0
    assert runs == 2
    assert metrics.read_text() == "step 1\n"


def test_crash_restarts_from_checkpoint(tmp_path):
    rc, runs, _ = _launch(tmp_path, "crash_then_ok",
                          hang_timeout=30.0, max_restarts=2)
    assert rc == 0
    assert runs == 2  # exactly one restart


def test_gives_up_after_max_restarts(tmp_path):
    rc, runs, _ = _launch(tmp_path, "always_crash",
                          hang_timeout=30.0, max_restarts=2)
    assert rc == 1
    assert runs == 3  # initial attempt + 2 restarts
