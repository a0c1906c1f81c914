"""Single-chip long-clip sweep: config-4 train step at growing T until the
HBM ceiling (VERDICT r4 #4b: the long-clip story stopped at T=160 with no
measured ceiling / SP-crossover point).

r5 finding: the first "ceiling" this sweep hit was NOT data HBM — it was
the fused-ctx BACKWARD kernel's per-grid-step blocks blowing Mosaic's
16 MB scoped-VMEM stack at T>=~214 (ops/pallas/fused_ctx.py
_BWD_SCOPED_VMEM_LIMIT has the full story). ctx_mix_pallas now falls back
to the XLA ctx path above that bound (with a warning), so rows beyond it
measure the jnp-ctx step — slower per frame but functional — and the
sweep can reach the true data ceiling.

One process (within-process comparability; fresh compile per shape). For
each (B, T) the full config-4 step (bf16 + auto kernels, the bench
protocol at reduced iters) is measured; an OOM is caught and recorded as
the ceiling for that B. The dominant long-clip tensor is the ranking
cross einsum's f32 [B,B,K,T,R] scores (B²·K·T·R·4 bytes — quadratic in B,
linear in T), so the ceiling moves with B; the sweep includes reduced-B
rows to separate the T-scaling of the ctx/projection path from the B²
ranking cost.

Usage: scripts/tpu_run.sh scripts/sweep_longclip.py [--iters 64]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEP = [
    (32, 20),     # the bench headline shape, as the anchor
    (8, 160),     # the r3 long-clip record point
    (8, 192),     # last shape inside the ctx-kernel scoped-VMEM bound
    (8, 320),     # first XLA-ctx-fallback shape
    (8, 640),
    (4, 640),
    (2, 1280),
    (1, 2560),
    (1, 5120),
]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=64)
    p.add_argument("--spc", type=int, default=32)
    args = p.parse_args()

    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("sweep_longclip")
    enable_compilation_cache()
    import bench

    print("| B | T | frames/step | µs/step | µs/frame | note |")
    print("|---|---|---|---|---|---|")
    # (B, T, extra overrides): the scoped_vmem rows exercise the extended
    # Pallas-ctx envelope (train.scoped_vmem_kib, docs/PERF.md)
    sweep = [(b, t, ()) for b, t in SWEEP] + [
        (8, 320, ("train.scoped_vmem_kib=65536",)),
    ]
    for b, t, extra in sweep:
        s = dict(bench.SHAPES)
        s.update(B=b, T=t)
        try:
            fps, dt, loss = bench.bench_jax(
                s, iters=args.iters, steps_per_call=args.spc, repeats=2,
                extra_overrides=extra)
            note = f"loss={loss:.3f}" + (f" {','.join(extra)}" if extra
                                         else "")
            print(f"| {b} | {t} | {b * t} | {dt * 1e6:,.1f} | "
                  f"{dt * 1e6 / (b * t):.2f} | {note} |",
                  flush=True)
        except Exception as e:
            msg = str(e)
            oom = ("RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg
                   or "out of memory" in msg)
            print(f"| {b} | {t} | {b * t} | — | — | "
                  f"{'OOM (HBM ceiling)' if oom else type(e).__name__}: "
                  f"{msg[:120]} |", flush=True)
            if not oom:
                raise


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use
