"""Structured metrics logging (SURVEY.md §5.5).

The reference logs loss lines to stdout and optionally TensorBoard/Crayon
scalars (reference: logging in train.py). Here: a small scalar-metrics
writer that fans out to stdout-friendly dicts, a JSONL file, and (when
TensorFlow is importable) TensorBoard summaries.
"""

from __future__ import annotations

import json
import os
import time


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        os.makedirs(log_dir, exist_ok=True)
        self.jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self.tb = None
        if use_tensorboard:
            try:
                import tensorflow as tf

                self.tb = tf.summary.create_file_writer(
                    os.path.join(log_dir, "tb")
                )
            except Exception:
                self.tb = None

    def write(self, step: int, scalars: dict):
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.jsonl.write(json.dumps(rec) + "\n")
        self.jsonl.flush()
        if self.tb is not None:
            import tensorflow as tf

            with self.tb.as_default():
                for k, v in scalars.items():
                    tf.summary.scalar(k, float(v), step=int(step))

    def close(self):
        self.jsonl.close()
        if self.tb is not None:
            self.tb.close()
