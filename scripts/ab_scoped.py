"""Within-process A/B of `train.scoped_vmem_kib` at PRODUCTION shapes.

The r5 long-clip work proved the knob propagates through the remote-compile
service and captured -46% at 8x320 (docs/PERF.md "Extending the kernel
envelope"), where it moves the fused-ctx backward from the XLA fallback
back onto the Pallas kernel. This script measures the OTHER question: does
raising the scoped-VMEM stack change XLA's own fusion/tiling decisions at
the default bench shapes, where nothing is falling back?

  - config-4 train step (B=32 T=20, feature files): the driver's headline
  - config-5 inline step (B=2 T=8 320px): conv-emitter dominated

Same methodology as ab_inline/ab_step_variants: both programs built in ONE
process, best-of-N scan calls bounded by a real fetch.

    scripts/tpu_run.sh scripts/ab_scoped.py [--kib 65536] [--modes train,inline]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kib", type=int, default=65536)
    p.add_argument("--modes", default="train,inline")
    p.add_argument("--spc", type=int, default=64)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--calls", type=int, default=4)
    args = p.parse_args()

    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("ab_scoped")
    enable_compilation_cache()

    # Watchdog: first device use can hang in outage mode (see
    # ab_step_variants.py); exit 3 lets tpu_run.sh retry a fresh process.
    import threading
    deadline = float(os.environ.get("NAFAE_AB_DEADLINE", "900"))
    progress = threading.Event()

    def _watchdog():
        while True:
            progress.clear()
            if not progress.wait(deadline):
                print(f"ab_scoped: no variant finished in {deadline:.0f} s; "
                      "exiting 3 for the tpu_run.sh retry loop",
                      file=sys.stderr)
                sys.stderr.flush()
                os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import bench

    knob = f"train.scoped_vmem_kib={args.kib}"
    if "train" in args.modes:
        res = {}
        for name, ov in (("base", ()), (knob, (knob,))):
            fps, dt, loss = bench.bench_jax(
                bench.SHAPES, iters=args.spc * args.calls,
                steps_per_call=args.spc, repeats=args.repeats,
                extra_overrides=ov)
            res[name] = dt
            progress.set()
            print(f"[train/{name}]: {dt * 1e6:.1f} us/step = {fps:,.0f} "
                  f"frames/s loss={loss:.4f}", flush=True)
        print(f"train delta: {(res[knob] - res['base']) * 1e6:+.1f} us/step "
              "(positive = base wins)", flush=True)

    if "inline" in args.modes:
        res = {}
        for name, ov in (("base", ()), (knob, (knob,))):
            cfg, batch, multi = bench.make_inline_setup(
                overrides=ov, steps_per_call=args.spc)
            dt, loss = bench.measure_inline(cfg, batch, multi, args.spc,
                                            ncalls=max(1, args.calls // 2),
                                            repeats=args.repeats)
            res[name] = dt
            progress.set()
            b, t = batch["frames"].shape[:2]
            print(f"[inline/{name}]: {dt * 1e6:.1f} us/step = "
                  f"{b * t / dt:,.0f} frames/s loss={loss:.4f}", flush=True)
        print(f"inline delta: {(res[knob] - res['base']) * 1e6:+.1f} us/step "
              "(positive = base wins)", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use (see bench.py)
