"""Metrics logging: JSONL always; wandb when available & configured.

The reference logs to wandb project "BrepGen" every 10 iterations
(``trainer.py:95-96``). Offline-first here: a JSONL file is the source of
truth; wandb mirrors it when importable and WANDB_API_KEY is set.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict


class MetricsLogger:
    def __init__(self, log_dir: str, name: str = "train", use_wandb: bool = False):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, f"{name}.jsonl")
        self._fh = open(self.path, "a")
        self._wandb = None
        if use_wandb:
            try:
                import wandb  # type: ignore

                wandb.init(project="BrepGen", dir=log_dir, name=name)
                self._wandb = wandb
            except Exception:
                self._wandb = None

    def log(self, metrics: Dict, step: int) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._fh.close()
