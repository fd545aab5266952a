"""Scalar metrics logging: JSONL always, TensorBoard when available.

The reference logs per-epoch scalars via tensorboardX (train.py:347-357).
tensorboardX isn't a hard dependency here: scalars always go to
<logdir>/scalars.jsonl (one {"step", "tag", "value"} per line) and are
mirrored to TensorBoard if the package is importable.
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, logdir: str):
        os.makedirs(logdir, exist_ok=True)
        self._f = open(os.path.join(logdir, "scalars.jsonl"), "a")
        self._tb = None
        try:
            from tensorboardX import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def add_scalar(self, tag: str, value, step: int):
        self._f.write(json.dumps(
            {"time": time.time(), "step": int(step), "tag": tag,
             "value": float(value)}) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()


class TextLogger:
    """Append-only text log file (reference tools.py:10-17 surface)."""

    def __init__(self, log_path: str):
        self.log_path = log_path
        with open(self.log_path, "w") as f:
            f.write("")

    def log(self, log: str):
        with open(self.log_path, "a+") as f:
            f.write(log + "\n")
