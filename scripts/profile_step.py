"""Device-time breakdown of the production train step (docs/PERF.md tables).

Runs ONE chip acquisition: compile the config4 multi-step program, capture a
jax.profiler trace of a few executions, then parse the XPlane protobuf and
print device-time per op (top-N + totals). This is the tool behind the
"Device-time breakdown" table in docs/PERF.md.

Usage (chip must be free):
    scripts/tpu_run.sh scripts/profile_step.py [--kernels auto] [--spc 64]
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import sys
import time

import numpy as np

# runnable as `python scripts/profile_step.py` without an installed package
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_trace(log_dir: str):
    """Sum device XLA-op durations (us) by op name from the chrome trace.

    The jax profiler writes <run>/<host>.trace.json.gz; device events live
    under the pid named "/device:TPU:*", tid "XLA Ops". The enclosing
    `while` op (the steps_per_call scan) double-counts its body and is
    dropped. Also returns each op's HLO long_name for attribution.
    """
    import gzip
    import json

    paths = glob.glob(os.path.join(log_dir,
                                   "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    d = json.load(gzip.open(sorted(paths)[-1], "rt"))
    dev_pids, op_tids = set(), {}
    for e in d["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name" \
                and "/device:TPU" in e.get("args", {}).get("name", ""):
            dev_pids.add(e["pid"])
        if e.get("ph") == "M" and e.get("name") == "thread_name" \
                and e.get("args", {}).get("name") == "XLA Ops":
            op_tids[e["pid"]] = e["tid"]
    per_op: dict[str, float] = collections.defaultdict(float)
    hlo: dict[str, str] = {}
    total = 0.0
    for e in d["traceEvents"]:
        if (e.get("ph") == "X" and e.get("pid") in dev_pids
                and e.get("tid") == op_tids.get(e.get("pid"))
                and not e["name"].startswith("while")):
            per_op[e["name"]] += e.get("dur", 0.0)
            total += e.get("dur", 0.0)
            if e.get("args", {}).get("long_name"):
                hlo[e["name"]] = e["args"]["long_name"]
    return per_op, hlo, total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--kernels", default="auto")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--spc", type=int, default=64)
    p.add_argument("--calls", type=int, default=2, help="traced executions")
    p.add_argument("--top", type=int, default=35)
    p.add_argument("--out", default="/tmp/nafae_profile")
    p.add_argument("--shapes", default="B=32,T=20,R=20,D=2048,E=256,K=8,"
                   "V=67,KC=67,W=3")
    p.add_argument("--inline", action="store_true",
                   help="profile the config-5 INLINE step (frames -> frozen "
                        "detector -> losses) instead of the config-4 step")
    p.add_argument("--image-size", type=int, default=320)
    p.add_argument("--inline-shapes", default="B=2,T=8")
    p.add_argument("--det-dtype", default="bfloat16")
    p.add_argument("--overrides", default="",
                   help="comma-separated extra config overrides appended "
                        "after the kernels/dtype ones, e.g. "
                        "'detector.fold_bn=true,detector.stem_im2col=true'")
    p.add_argument("--flags", default="",
                   help="comma-separated experimental module flags set "
                        "before tracing, e.g. "
                        "'grounding.CROSS_ONEHOT=True,train.PROJ_FUSED=False'"
                        " (module names resolve under nafae_tpu/ops and "
                        "nafae_tpu; values are Python literals)")
    args = p.parse_args()

    # CLAUDE.md rule: a lost chip silently falls back to CPU, so every
    # TPU measurement script must check the backend. Exit 3 = the
    # scripts/tpu_run.sh retry contract.
    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("profile_step")
    enable_compilation_cache()
    import jax

    if args.flags:
        import ast
        import importlib
        for kv in args.flags.split(","):
            path, val = kv.split("=", 1)
            modname, attr = path.rsplit(".", 1)
            for prefix in ("nafae_tpu.ops.", "nafae_tpu.", ""):
                try:
                    mod = importlib.import_module(prefix + modname)
                    break
                except ImportError:
                    continue
            else:
                raise SystemExit(f"--flags: module {modname!r} not found")
            if not hasattr(mod, attr):
                raise SystemExit(f"--flags: {mod.__name__} has no {attr}")
            setattr(mod, attr, ast.literal_eval(val))
            print(f"[flags] {mod.__name__}.{attr} = {val}", flush=True)

    s = {k: int(v) for k, v in
         (kv.split("=") for kv in args.shapes.split(","))}
    import bench
    from nafae_tpu.config import load_config
    from nafae_tpu.train import TrainState, make_optimizer, make_train_step

    if args.inline:
        # shared harness: the traced program is exactly bench --mode e2e's
        sh = {k: int(v) for k, v in
              (kv.split("=") for kv in args.inline_shapes.split(","))}
        cfg, batch, multi = bench.make_inline_setup(
            overrides=[f"train.kernels={args.kernels}",
                       f"model.dtype={args.dtype}",
                       f"detector.dtype={args.det_dtype}"]
            + [o for o in args.overrides.split(",") if o],
            b=sh["B"], t=sh["T"], image_size=args.image_size,
            steps_per_call=args.spc)
        step = None
    else:
        cfg = load_config(preset_name="config4", overrides=[
            f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
            f"data.batch_size={s['B']}", f"loss.num_clusters={s['KC']}",
            f"loss.ctx_window={s['W']}", "loss.kmeans_interval=100",
            f"train.kernels={args.kernels}",
            f"model.dtype={args.dtype}", "model.matmul_precision=default",
        ] + [o for o in args.overrides.split(",") if o])
        batch = {k: jax.device_put(v) for k, v in bench.make_batch(s).items()}
        step = make_train_step(cfg, make_optimizer(cfg))

    if step is not None:                          # config-4 path
        # route compiler options exactly like bench_jax / make_inline_setup
        # (train.scoped_vmem_kib would otherwise be silently dropped here,
        # and the near-deterministic trace would read as "knob is a no-op")
        import functools

        from nafae_tpu.train import jit_compiler_options

        @functools.partial(jax.jit,
                           compiler_options=jit_compiler_options(cfg))
        def multi(state, batch):
            def body(st, _):
                st, metrics = step(st, batch)
                return st, metrics["loss"]
            return jax.lax.scan(body, state, None, length=args.spc)

    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    t0 = time.perf_counter()
    state, losses = multi(state, batch)           # compile + warm
    loss = float(losses[-1])
    print(f"compiled+warm in {time.perf_counter() - t0:.1f}s "
          f"loss={loss:.4f}", flush=True)

    jax.profiler.start_trace(args.out)
    for _ in range(args.calls):
        state, losses = multi(state, batch)
    float(np.asarray(state.params["b_v"])[0])     # real device->host bound
    jax.profiler.stop_trace()

    per_op, hlo, total = parse_trace(args.out)
    steps = args.calls * args.spc
    print(f"\ndevice busy: {total:.0f} us over {steps} steps "
          f"= {total / steps:.1f} us/step")
    print(f"{'us/step':>9}  {'share':>6}  op")
    for name, dur in sorted(per_op.items(), key=lambda kv: -kv[1])[:args.top]:
        print(f"{dur / steps:9.2f}  {dur / total:6.1%}  {name:32s} "
              f"{hlo.get(name, '')[:110]}")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use (see bench.py)
