"""Within-process A/B of two config-5 INLINE variants (frames -> frozen
Faster R-CNN -> fused losses, one XLA program).

Same methodology as ab_kernels.py (docs/PERF.md: cross-process comparisons
are meaningless on this host): both programs are built in one process and
each reports best-of-4 of a scan-`spc` call bounded by a real scalar fetch.
Variants are comma-separated config overrides, e.g.:

    scripts/tpu_run.sh scripts/ab_inline.py \
        --a detector.dtype=float32 --b detector.dtype=bfloat16
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--a", default="detector.dtype=float32")
    p.add_argument("--b", default="detector.dtype=bfloat16")
    p.add_argument("--c", default=None,
                   help="optional third variant (same overrides syntax)")
    p.add_argument("--spc", type=int, default=64)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--calls", type=int, default=2)
    p.add_argument("--image-size", type=int, default=320)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--frames", type=int, default=8)
    args = p.parse_args()

    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("ab_inline")
    enable_compilation_cache()
    import bench   # shared inline harness — bench.make_inline_setup keeps
                   # the measured program identical to `bench --mode e2e`

    b, t = args.batch, args.frames
    res = {}
    variants = [v for v in (args.a, args.b, args.c) if v is not None]
    for name in variants:
        cfg, batch, multi = bench.make_inline_setup(
            overrides=[o for o in name.split(",") if o], b=b, t=t,
            image_size=args.image_size, steps_per_call=args.spc)
        dt, loss = bench.measure_inline(cfg, batch, multi, args.spc,
                                        ncalls=args.calls,
                                        repeats=args.repeats)
        res[name] = dt
        fps = b * t / dt
        print(f"[{name}]: {dt * 1e6:.1f} us/step = {fps:,.0f} frames/s "
              f"loss={loss:.4f}", flush=True)
    d = (res[args.b] - res[args.a]) * 1e6
    print(f"delta: {d:+.1f} us/step (positive = A wins)")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use (see bench.py)
