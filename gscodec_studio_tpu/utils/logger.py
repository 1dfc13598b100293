"""Training observability: scalar + histogram logging.

Reference behavior: TensorBoard SummaryWriter per run
(simple_trainer.py:538, :1023-1053 — losses, num_GS, memory, bpp,
attribute histograms). Here: a JSONL stream that always works (greppable,
machine-readable) plus TensorBoard events when torch's SummaryWriter is
importable (it ships with the baked torch).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class TrainLogger:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self._f = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=log_dir)
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def scalar(self, tag: str, value, step: int):
        self.scalars({tag: value}, step)

    def scalars(self, values: Dict[str, float], step: int):
        rec = {"step": int(step), "t": round(time.time() - self._t0, 3)}
        rec.update({k: float(v) for k, v in values.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()
        if self._tb is not None:
            for k, v in values.items():
                self._tb.add_scalar(k, float(v), step)

    def histogram(self, tag: str, values, step: int, bins: int = 64):
        v = np.asarray(values).reshape(-1)
        hist, edges = np.histogram(v, bins=bins)
        self._f.write(json.dumps({
            "step": int(step), "hist": tag,
            "counts": hist.tolist(),
            "lo": float(edges[0]), "hi": float(edges[-1]),
        }) + "\n")
        self._f.flush()
        if self._tb is not None:
            self._tb.add_histogram(tag, v, step)

    def close(self):
        self._f.close()
        if self._tb is not None:
            self._tb.close()
