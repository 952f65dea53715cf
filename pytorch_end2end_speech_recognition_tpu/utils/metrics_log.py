"""Metrics logging: JSONL file + console.

Capability parity: the reference genre's tensorboard `SummaryWriter` + tqdm
console (SURVEY.md §5.5). JSONL is the source of truth (one row per event,
machine-parsable); a tensorboard writer can be layered on when TF is wanted.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path


class MetricsLogger:
    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = Path(path) if path else None
        self.echo = echo
        if self.path:
            self.path.parent.mkdir(parents=True, exist_ok=True)
            self._f = open(self.path, "a")
        else:
            self._f = None

    def log(self, tag: str, metrics: dict) -> None:
        row = {"tag": tag, "time": time.time(), **metrics}
        if self._f:
            self._f.write(json.dumps(row) + "\n")
            self._f.flush()
        if self.echo:
            parts = " ".join(
                f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                for k, v in metrics.items()
            )
            print(f"[{tag}] {parts}", file=sys.stderr)

    def close(self):
        if self._f:
            self._f.close()
