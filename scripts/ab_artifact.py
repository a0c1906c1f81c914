"""Within-process A/B: AOT-exported StableHLO artifact vs the live-jit
serving program (VERDICT r4 #4: every recorded serve number measured the
live-jit path; jax.export round-trip CORRECTNESS is tested, but nothing
showed the artifact a deployment host runs performs at parity).

One process, chip exclusive: builds the live guarded serve program
(bench.make_serve_program), exports the SAME config+params to a temp dir
(serve.export_grounding), builds the guarded artifact program over it
(bench.make_artifact_serve_program), measures both best-of-N, prints the
delta. Optionally repeats for the int8-compute pair (--int8).

Usage:
    scripts/tpu_run.sh scripts/ab_artifact.py [--iters 2048] [--int8]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=2048)
    p.add_argument("--spc", type=int, default=256)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--int8", action="store_true",
                   help="also A/B the int8-compute live vs artifact pair")
    p.add_argument("--int8pre", action="store_true",
                   help="also A/B the int8pre (pre-quantized features — "
                        "the deployable +30% serving form) live vs "
                        "artifact pair")
    args = p.parse_args()

    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("ab_artifact")
    enable_compilation_cache()
    import jax
    import bench
    from nafae_tpu.config import load_config
    from nafae_tpu.models.grounding import init_params
    from nafae_tpu.serve import export_grounding

    s = bench.SHAPES
    spc = max(1, min(args.spc, args.iters))
    ncalls = max(1, args.iters // spc)
    results = {}

    def timeit(tag, serves, params, feats):
        int(serves(params, feats))                 # compile + warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(ncalls):
                acc = serves(params, feats)
            int(acc)                               # real fetch bound
            best = min(best, time.perf_counter() - t0)
        dt = best / (ncalls * spc)
        results[tag] = dt
        print(f"{tag}: {dt * 1e6:.1f} us/step  "
              f"{s['B'] * s['T'] / dt:,.0f} f/s", flush=True)

    variants = [(None, "f32art")] \
        + ([("int8", "int8art")] if args.int8 else []) \
        + ([("int8pre", "int8pre_art")] if args.int8pre else [])
    for quantize, label in variants:
        serves, params, feats = bench.make_serve_program(
            s, spc, quantize=quantize)
        timeit(f"live_{label}", serves, params, feats)

        # export the SAME config+params, then measure the artifact program
        # (an int8pre manifest makes make_artifact_serve_program feed the
        # int8-feats + scales calling convention)
        cfg = load_config(preset_name="config1", overrides=[
            f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
            "model.dtype=bfloat16", "model.matmul_precision=default",
            f"data.batch_size={s['B']}", f"data.max_frames={s['T']}",
            f"data.num_regions={s['R']}", f"data.feat_dim={s['D']}",
            f"data.max_words={s['K']}"]
            + ([f"model.quantize={quantize}"] if quantize else []))
        raw = init_params(jax.random.PRNGKey(0), cfg.model)
        d = tempfile.mkdtemp(prefix=f"nafae_art_{label}_")
        try:
            export_grounding(cfg, raw, d)
            a_serves, a_params, a_feats, _ = \
                bench.make_artifact_serve_program(d, spc)
            timeit(f"artifact_{label}", a_serves, a_params, a_feats)
        finally:
            shutil.rmtree(d, ignore_errors=True)

        delta = (results[f"artifact_{label}"]
                 - results[f"live_{label}"]) * 1e6
        print(f"{label}: artifact - live = {delta:+.1f} us/step "
              f"(positive = artifact slower)", flush=True)


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use (see bench.py)
