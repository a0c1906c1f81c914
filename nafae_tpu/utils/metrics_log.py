"""Structured JSONL metrics logging (SURVEY.md L278: replaces print-based logs).

Each line is one JSON record with a wall-clock timestamp; the train loop adds
the frames/sec counter (the BASELINE north-star throughput metric, L274).
Optionally mirrors numeric scalars to TensorBoard event files (SURVEY.md
§6 "structured JSONL metrics + optional TensorBoard scalars") — tensorflow
is imported lazily and only when a tensorboard_dir is configured.
"""

from __future__ import annotations

import json
import os
import time


class MetricsLogger:
    def __init__(self, out_dir: str, name: str = "metrics.jsonl",
                 tensorboard_dir: str = ""):
        os.makedirs(out_dir, exist_ok=True)
        self.path = os.path.join(out_dir, name)
        self._tb = None
        if tensorboard_dir:
            try:
                import tensorflow as tf  # noqa: F401  (baked-in, lazy)
                self._tf = tf
                self._tb = tf.summary.create_file_writer(tensorboard_dir)
            except Exception as e:  # pragma: no cover - env without TF
                import warnings
                warnings.warn(f"tensorboard logging disabled: {e}")

    def log(self, record: dict) -> None:
        record = dict(record)
        record.setdefault("ts", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record, default=float) + "\n")
        if self._tb is not None:
            step = int(record.get("step", 0))
            with self._tb.as_default():
                for k, v in record.items():
                    if k in ("ts", "step"):
                        continue
                    try:
                        self._tf.summary.scalar(k, float(v), step=step)
                    except (TypeError, ValueError):
                        continue  # non-numeric record fields stay JSONL-only
            self._tb.flush()

    def read(self) -> list[dict]:
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(ln) for ln in f if ln.strip()]
