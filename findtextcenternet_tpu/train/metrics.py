"""Training observability: running metrics + TensorBoard/JSONL logging.

Functional replacement for the reference's ``RunningLoss`` modules and
SummaryWriter plumbing (`/root/reference/train1.py:29-78`): running means
of the loss dict and exact-match accuracy, flushed every N steps to
TensorBoard (via tf.summary when TensorFlow is available) and to a JSONL
log, mirrored to stdout.
"""
from __future__ import annotations

import json
import os
import time
from typing import Dict


class RunningMetrics:
    def __init__(self):
        self._sums: Dict[str, float] = {}
        self._count = 0
        self._correct = 0.0
        self._total = 0.0

    def update(self, metrics: Dict):
        for k, v in metrics.items():
            if k in ("correct", "total"):
                continue
            self._sums[k] = self._sums.get(k, 0.0) + float(v)
        self._correct += float(metrics.get("correct", 0))
        self._total += float(metrics.get("total", 0))
        self._count += 1

    def summary(self) -> Dict[str, float]:
        if self._count == 0:
            return {}
        out = {k: v / self._count for k, v in self._sums.items()}
        if self._total > 0:
            out["accuracy"] = self._correct / self._total
        return out

    def reset(self):
        self._sums.clear()
        self._count = 0
        self._correct = 0.0
        self._total = 0.0


class MetricLogger:
    """stdout + JSONL + (optional) TensorBoard."""

    def __init__(self, logdir: str, use_tensorboard: bool = True):
        os.makedirs(logdir, exist_ok=True)
        self.logdir = logdir
        self._jsonl = open(os.path.join(logdir, "log.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf
                self._tb = tf.summary.create_file_writer(logdir)
            except Exception:
                self._tb = None
        self._t0 = time.time()

    def log(self, step: int, metrics: Dict[str, float], prefix: str = "train"):
        rec = {"step": step, "time": round(time.time() - self._t0, 2),
               "prefix": prefix, **{k: round(float(v), 6)
                                    for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        msg = " ".join(f"{k}={v:.4f}" for k, v in metrics.items())
        print(f"[{prefix} step {step}] {msg}", flush=True)
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(f"{prefix}/{k}", float(v), step=step)
                self._tb.flush()

    def log_text(self, step: int, tag: str, text: str):
        if self._tb is not None:
            import tensorflow as tf
            with self._tb.as_default():
                tf.summary.text(tag, text, step=step)

    def close(self):
        self._jsonl.close()
