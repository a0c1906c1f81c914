"""Within-process A/B of the inference bench programs (chip must be free).

Two comparisons, all four programs built and measured in ONE process
(cross-process perf comparisons are meaningless on this host — docs/PERF.md
methodology; best-of-N each):

- eval: one-hot-einsum box selection in ops/iou.grounding_hits (r4) vs the
  old take_along_axis gather form.
- serve: the honest all-outputs program (box select + beta + scores kept
  alive in the carry) vs the r3 region-only reduction that let XLA DCE
  drop everything but sim+argmax — quantifies how inflated the recorded
  r3 serve number was.

Usage:
    scripts/tpu_run.sh scripts/ab_infer.py [--iters 2048] [--repeats 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def old_grounding_hits_gather(s, boxes, gt_boxes, gt_mask, iou_thresh=0.5):
    """The pre-r4 grounding_hits: take_along_axis box gather."""
    import jax.numpy as jnp

    from nafae_tpu.ops.iou import box_iou

    r_star = jnp.argmax(s, axis=-1)
    pred = jnp.take_along_axis(
        boxes[:, None], r_star[..., None, None], axis=-2)[..., 0, :]
    iou = box_iou(pred, gt_boxes)
    return (iou > iou_thresh).astype(jnp.float32) * gt_mask, gt_mask


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2048)
    p.add_argument("--spc", type=int, default=256)
    p.add_argument("--repeats", type=int, default=4)
    args = p.parse_args()

    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("ab_infer")
    enable_compilation_cache()
    import bench
    import nafae_tpu.ops.iou as iou_mod

    s = bench.SHAPES
    spc = max(1, min(args.spc, args.iters))
    ncalls = max(1, args.iters // spc)
    new_hits = iou_mod.grounding_hits
    results = {}

    def measure_eval(tag):
        fps, dt = bench.bench_jax_eval(s, iters=args.iters,
                                       steps_per_call=spc)
        results[tag] = dt
        print(f"{tag}: {dt * 1e6:.1f} us/step  {fps:,.0f} f/s", flush=True)

    # eval A/B: the module-level symbol is what bench_jax_eval imports
    iou_mod.grounding_hits = old_grounding_hits_gather
    measure_eval("eval_gather(old)")
    iou_mod.grounding_hits = new_hits
    measure_eval("eval_onehot(new)")

    # serve A/B: honest all-outputs vs the r3 region-only DCE hole, plus
    # the r5 int8-compute variant (model.quantize=int8)
    def measure_serve(tag, all_outputs, quantize=None):
        serves, params, feats = bench.make_serve_program(
            s, spc, all_outputs=all_outputs, quantize=quantize)
        int(serves(params, feats))                     # compile + warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(ncalls):
                acc = serves(params, feats)
            int(acc)                                   # real fetch bound
            best = min(best, time.perf_counter() - t0)
        dt = best / (ncalls * spc)
        results[tag] = dt
        print(f"{tag}: {dt * 1e6:.1f} us/step  "
              f"{s['B'] * s['T'] / dt:,.0f} f/s", flush=True)

    measure_serve("serve_dce(r3-hole)", all_outputs=False)
    measure_serve("serve_guarded(honest)", all_outputs=True)
    measure_serve("serve_int8(r5)", all_outputs=True, quantize="int8")
    measure_serve("serve_int8pre(r5)", all_outputs=True, quantize="int8pre")

    d_eval = (results["eval_gather(old)"] - results["eval_onehot(new)"]) * 1e6
    d_serve = (results["serve_guarded(honest)"]
               - results["serve_dce(r3-hole)"]) * 1e6
    d_int8 = (results["serve_guarded(honest)"]
              - results["serve_int8(r5)"]) * 1e6
    d_pre = (results["serve_guarded(honest)"]
             - results["serve_int8pre(r5)"]) * 1e6
    print(f"eval delta: {d_eval:+.1f} us/step (positive = one-hot wins)")
    print(f"serve DCE inflation: {d_serve:+.1f} us/step hidden by the hole")
    print(f"serve int8 delta: {d_int8:+.1f} us/step (positive = int8 wins)")
    print(f"serve int8-PRE delta: {d_pre:+.1f} us/step (offline-quantized "
          f"feats; positive = int8pre wins)")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use (see bench.py)
