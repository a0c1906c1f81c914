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


# --------------------------------------------------------------- HLO audits

# dtype -> bytes, for payload accounting of optimized-HLO collectives
HLO_DTYPE_SIZES = {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "f16": 2,
                   "pred": 1, "f64": 8, "s64": 8, "u8": 1, "s8": 1}

_COLLECTIVE_RE = (r"= (.*?)\s*(all-gather|all-reduce|reduce-scatter|"
                  r"collective-permute|all-to-all)\(")


def collective_payloads(hlo_text: str):
    """Parse an optimized-HLO dump into [(op, operand-shapes str, payload
    bytes)] — one entry per collective instruction. The payload is the
    per-device bytes that cross ICI for that op. ONE implementation shared
    by scripts/collective_audit.py (the PERF.md byte tables) and the
    test-side size audits (test_train DP smallness, test_kmeans_bank
    seeding cap), so the shape regex and dtype table cannot drift apart.
    """
    import re

    out = []
    for ln in hlo_text.splitlines():
        m = re.search(_COLLECTIVE_RE, ln)
        if m is None:
            continue
        payload, shapes = 0, []
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", m.group(1)):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            payload += n * HLO_DTYPE_SIZES.get(dt, 4)
            shapes.append(f"{dt}[{dims}]")
        out.append((m.group(2), "+".join(shapes), payload))
    return out
