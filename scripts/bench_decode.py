"""Decode scale-out measurement (SURVEY.md hard part #6; VERDICT r2 #8).

Measures aggregate native-decoder throughput at N concurrent workers and
prints one JSON line per worker count. The native decode call is a ctypes
FFI call, so the GIL is released for its whole duration — worker THREADS
scale with CORES (on this repo's 1-core CI box the aggregate stays flat;
on a production host it scales to nproc). Use the numbers to size the
decode tier for the inline config-5 pipeline, or to decide to extract-once
instead (docs/PERF.md "Decode scale-out").

    python scripts/bench_decode.py [--workers 1,2,4] [--seconds 6]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))          # runnable from any cwd


def make_video(path: str, frames: int = 300, size: int = 320,
               fps: float = 25.0) -> None:
    import cv2
    import numpy as np
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), fps,
                        (size, size))
    rng = np.random.RandomState(0)
    base = rng.randint(0, 255, (size, size, 3), np.uint8)
    for i in range(frames):
        frame = np.roll(base, i * 3, axis=1)          # realistic-ish motion
        w.write(frame)
    w.release()


def run(path: str, n_workers: int, seconds: float,
        sample_fps: float, image_size: int) -> dict:
    from nafae_tpu.extract import decode_segment
    counts = [0] * n_workers
    stop = time.monotonic() + seconds

    def worker(i: int) -> None:
        while time.monotonic() < stop:
            frames = decode_segment(path, sample_fps, 10_000, image_size)
            counts[i] += frames.shape[0]

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(n_workers)]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    dt = time.monotonic() - t0
    total = sum(counts)
    return {"workers": n_workers, "decoded_fps": round(total / dt, 1),
            "per_worker_fps": round(total / dt / n_workers, 1),
            "seconds": round(dt, 2)}


def main(argv=None) -> int:
    p = argparse.ArgumentParser("bench_decode")
    p.add_argument("--workers", default="1,2,4")
    p.add_argument("--seconds", type=float, default=6.0)
    p.add_argument("--video", default=None,
                   help="existing video (default: synthesize 300f MJPG)")
    p.add_argument("--sample-fps", type=float, default=25.0,
                   help="sampling rate; == source fps decodes every frame "
                        "(the inline-pipeline consumption mode)")
    p.add_argument("--image-size", type=int, default=320)
    args = p.parse_args(argv)

    tmp = None
    path = args.video
    if path is None:
        tmp = tempfile.NamedTemporaryFile(suffix=".avi", delete=False)
        tmp.close()
        make_video(tmp.name)
        path = tmp.name
    try:
        from nafae_tpu.utils.native_io import load_library
        try:
            load_library()
            backend = "native"
        except Exception:
            backend = "cv2-fallback"
        print(json.dumps({"nproc": os.cpu_count(), "backend": backend,
                          "video": os.path.basename(path)}))
        for n in [int(x) for x in args.workers.split(",")]:
            print(json.dumps(run(path, n, args.seconds, args.sample_fps,
                                 args.image_size)), flush=True)
    finally:
        if tmp is not None:
            os.unlink(tmp.name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
