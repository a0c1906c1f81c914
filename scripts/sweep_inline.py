"""Within-process B×T sweep of the config-5 inline step (VERDICT r3 #2).

The r3 inline number was measured at B=2, T=8 = 16 images/step through the
detector convs — likely under-filling XLA's conv emitters. This sweep
builds the inline program at several (B, T) shapes in ONE process (same
within-process methodology as ab_inline; absolute cross-process numbers
are meaningless on this host) and reports the per-frame rate of each, so
the best production shape can move into the config-5 notes.

    scripts/tpu_run.sh scripts/sweep_inline.py [--shapes 2x8,4x8,8x8,4x16]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--shapes", default="2x8,4x8,8x8,4x16,8x16",
                   help="comma-separated BxT list")
    p.add_argument("--spc", type=int, default=64)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--calls", type=int, default=2)
    p.add_argument("--image-size", type=int, default=320)
    p.add_argument("--overrides", default="",
                   help="extra comma-separated config overrides")
    args = p.parse_args()

    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("sweep_inline")
    enable_compilation_cache()
    import bench

    extra = [o for o in args.overrides.split(",") if o]
    rows = []
    for shape in args.shapes.split(","):
        b, t = (int(x) for x in shape.split("x"))
        # scale steps-per-call down as the per-step work grows so each
        # timing call stays ~O(100 ms) and the sweep fits a chip window
        spc = max(8, min(args.spc, args.spc * 16 // (b * t)))
        try:
            cfg, batch, multi = bench.make_inline_setup(
                overrides=extra, b=b, t=t, image_size=args.image_size,
                steps_per_call=spc)
            dt, loss = bench.measure_inline(cfg, batch, multi, spc,
                                            ncalls=args.calls,
                                            repeats=args.repeats)
        except Exception as e:    # one OOM shape must not kill the sweep
            print(f"[B={b} T={t}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
            continue
        fps = b * t / dt
        per_img_us = dt * 1e6 / (b * t)
        rows.append((shape, b * t, dt * 1e6, fps, per_img_us))
        print(f"[B={b} T={t}] {b * t:3d} img/step  {dt * 1e6:8.1f} us/step  "
              f"{fps:8,.0f} frames/s  {per_img_us:6.1f} us/frame  "
              f"loss={loss:.4f}", flush=True)
    best = min(rows, key=lambda r: r[4])
    base = next((r for r in rows if r[0] == "2x8"), rows[0])
    print(f"best: {best[0]} at {best[4]:.1f} us/frame "
          f"({base[4] / best[4]:.2f}x the {base[0]} per-frame rate)")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use (see bench.py)
