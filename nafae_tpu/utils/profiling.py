"""Profiling helpers (SURVEY.md L274: jax.profiler traces + throughput counter).

Usage:
    with trace("/tmp/nafae_trace"):
        state, metrics = train_fn(state, batch)
    # -> TensorBoard/Perfetto-readable trace directory

    tracker = ThroughputTracker(frames_per_batch=B*T)
    ... tracker.step() each train step; tracker.summary()
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputTracker:
    """Frames/sec/chip counter — the BASELINE.json north-star metric."""

    def __init__(self, frames_per_batch: int, window: int = 50):
        self.frames_per_batch = frames_per_batch
        self.window = window
        self._t0 = None
        self._count = 0
        self.history: list[float] = []

    def step(self) -> float | None:
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return None
        self._count += 1
        if self._count % self.window == 0:
            fps = self.frames_per_batch * self.window / (now - self._t0)
            self.history.append(fps)
            self._t0 = now
            return fps
        return None

    def summary(self) -> dict:
        if not self.history:
            return {"frames_per_sec": 0.0, "windows": 0}
        return {"frames_per_sec": sum(self.history) / len(self.history),
                "peak_frames_per_sec": max(self.history),
                "windows": len(self.history)}
