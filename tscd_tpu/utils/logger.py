"""Logging (reference: yolox/utils/logger.py — loguru setup_logger:66 +
stdout redirect + WandbLogger:101).

Process-0-only file+stdout logger (no loguru dependency) and a JSONL
metrics sink usable as a tensorboard/wandb stand-in; if tensorboardX or
wandb happen to be importable they are used additionally."""

import json
import os
import sys
import time
from typing import Dict, Optional


class Logger:
    def __init__(self, save_dir: str = "", filename: str = "train_log.txt",
                 process_index: int = 0, mode: str = "a"):
        self.is_main = process_index == 0
        self.file = None
        if self.is_main and save_dir:
            os.makedirs(save_dir, exist_ok=True)
            self.file = open(os.path.join(save_dir, filename), mode)

    def info(self, msg: str):
        if not self.is_main:
            return
        line = f"{time.strftime('%Y-%m-%d %H:%M:%S')} | {msg}"
        print(line)
        if self.file:
            self.file.write(line + "\n")
            self.file.flush()

    warning = info
    error = info


def setup_logger(save_dir: str, distributed_rank: int = 0,
                 filename: str = "train_log.txt", mode: str = "a") -> Logger:
    """(reference logger.py:66)."""
    return Logger(save_dir, filename, distributed_rank, mode)


class MetricsLogger:
    """Scalar metrics -> JSONL (+ tensorboard/wandb when available).
    Stand-in for the reference's tensorboard writer + WandbLogger."""

    def __init__(self, save_dir: str, project: Optional[str] = None,
                 process_index: int = 0):
        self.is_main = process_index == 0
        self.file = None
        self.tb = None
        self.wandb = None
        if not self.is_main:
            return
        os.makedirs(save_dir, exist_ok=True)
        self.file = open(os.path.join(save_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self.tb = SummaryWriter(os.path.join(save_dir, "tb"))
        except Exception:
            pass
        if project:
            try:
                import wandb
                self.wandb = wandb.init(project=project, dir=save_dir)
            except Exception:
                pass

    def log(self, metrics: Dict[str, float], step: int):
        if not self.is_main:
            return
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in metrics.items()})
        self.file.write(json.dumps(rec) + "\n")
        self.file.flush()
        if self.tb:
            for k, v in metrics.items():
                self.tb.add_scalar(k, float(v), step)
        if self.wandb:
            self.wandb.log(metrics, step=step)

    def close(self):
        if self.file:
            self.file.close()
        if self.tb:
            self.tb.close()
        if self.wandb:
            self.wandb.finish()
