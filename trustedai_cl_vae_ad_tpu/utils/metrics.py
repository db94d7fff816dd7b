"""Metric logging: JSONL always, TensorBoard events when available.

Replaces the reference's Keras TensorBoard callback (train.py:116-120) and the
camera app's manual CallbackList epoch logging (camera_streamer_qt.py:160-168,
:857-884, :1410-1416). Scalars are logged per step/epoch; everything lands in
``<logdir>/metrics.jsonl`` so downstream tooling never needs TF, and mirrored
to TensorBoard event files (via torch.utils.tensorboard) when the package is
importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Mapping, Optional


def _try_tensorboard(logdir: str):
    try:
        from torch.utils.tensorboard import SummaryWriter  # type: ignore

        return SummaryWriter(log_dir=logdir)
    except Exception:
        return None


class MetricsWriter:
    def __init__(self, logdir: str, use_tensorboard: bool = True):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._jsonl_path = os.path.join(logdir, "metrics.jsonl")
        self._jsonl = open(self._jsonl_path, "a")
        self._tb = _try_tensorboard(logdir) if use_tensorboard else None

    def log(self, step: int, metrics: Mapping[str, float], prefix: str = "") -> None:
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            key = f"{prefix}{k}"
            try:
                record[key] = float(v)
            except (TypeError, ValueError):
                continue
            if self._tb is not None:
                self._tb.add_scalar(key, record[key], int(step))
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class EpochTimer:
    """Wall-clock per-phase timing (replaces the reference's print deltas)."""

    def __init__(self):
        self._t0: Optional[float] = None
        self.history: list = []

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self) -> float:
        dt = time.perf_counter() - self._t0
        self.history.append(dt)
        return dt
