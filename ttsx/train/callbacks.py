"""Engine callbacks: CSV/JSONL logging, step timing artifacts, EMA info.

Reference: train/callbacks/{checkpoint,logger,ema}.py + the metrics/
observability surface of SURVEY §5.5 (tensorboard optional, CSV always,
step_times.json artifact like hyper_diarizer/cli.py:111-160).
"""
from __future__ import annotations

import csv
import json
import time
from pathlib import Path
from typing import Dict, Optional

from ttsx.train.engine import Callback


class CSVLogger(Callback):
    """Append step metrics to a CSV (unified_full.yaml logging.csv)."""

    def __init__(self, path: str, every: int = 50):
        self.path = Path(path)
        self.every = every
        self._fieldnames = None

    def on_step_end(self, trainer, metrics: Dict):
        if trainer.state.global_step % self.every:
            return
        row = {"step": trainer.state.global_step, **metrics}
        new = not self.path.exists()
        if self._fieldnames is None:
            self._fieldnames = list(row.keys())
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with self.path.open("a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames,
                               extrasaction="ignore")
            if new:
                w.writeheader()
            w.writerow(row)


class JSONLLogger(Callback):
    def __init__(self, path: str, every: int = 50):
        self.path = Path(path)
        self.every = every

    def on_step_end(self, trainer, metrics: Dict):
        if trainer.state.global_step % self.every:
            return
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with self.path.open("a") as f:
            f.write(json.dumps(
                {"step": trainer.state.global_step, **metrics}) + "\n")

    def on_validation_end(self, trainer, metrics: Dict):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with self.path.open("a") as f:
            f.write(json.dumps(
                {"step": trainer.state.global_step, "val": metrics}) + "\n")


class StepTimeArtifact(Callback):
    """Write step_times.json on train end (hyper_diarizer step_times.json
    style tracing artifact)."""

    def __init__(self, path: str):
        self.path = Path(path)

    def on_train_end(self, trainer):
        self.path.parent.mkdir(parents=True, exist_ok=True)
        times = trainer.state.step_times
        self.path.write_text(json.dumps({
            "steps": len(times),
            "mean_s": sum(times) / max(len(times), 1),
            "total_s": sum(times),
            "times": times[-200:],
        }))


class TensorBoardLogger(Callback):
    """Optional; degrades to no-op if tensorboard isn't importable."""

    def __init__(self, logdir: str, every: int = 50):
        self.every = every
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.writer = SummaryWriter(logdir)
        except Exception:
            self.writer = None

    def on_step_end(self, trainer, metrics: Dict):
        if self.writer is None or trainer.state.global_step % self.every:
            return
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(k, v, trainer.state.global_step)

    def on_validation_end(self, trainer, metrics: Dict):
        if self.writer is None:
            return
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(f"val/{k}", v,
                                       trainer.state.global_step)
