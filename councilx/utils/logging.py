"""Metric logging + output-folder layout.

Reference parity: utils.py::{prepare_sub_folder, write_loss}. The reference
reflects over trainer attributes named loss_*/grad/nwd and writes them to
tensorboardX. Here the jitted step *returns* a metrics dict (no reflection
needed); the logger always writes JSONL (metrics.jsonl) and additionally
TensorBoard events when torch.utils.tensorboard is importable.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict

import numpy as np


def prepare_sub_folder(output_directory: str):
    """Create images/ and checkpoints/ under the run dir (reference
    utils.py::prepare_sub_folder)."""
    image_directory = os.path.join(output_directory, "images")
    checkpoint_directory = os.path.join(output_directory, "checkpoints")
    os.makedirs(image_directory, exist_ok=True)
    os.makedirs(checkpoint_directory, exist_ok=True)
    return checkpoint_directory, image_directory


class MetricLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def write(self, step: int, metrics: Dict, prefix: str = "") -> None:
        clean = {f"{prefix}{k}": float(np.asarray(v))
                 for k, v in metrics.items()}
        rec = {"step": int(step), "time": time.time(), **clean}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in clean.items():
                self._tb.add_scalar(k, v, step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
