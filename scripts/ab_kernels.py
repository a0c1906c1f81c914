"""Within-process A/B of two kernel routings on the full config4 train step.

Cross-process perf comparisons are meaningless on this host (the chip rate
varies >2x between measurement windows — docs/PERF.md methodology); this
tool builds BOTH jitted programs in one process and reports best-of-4 for
each plus the delta.

Usage (chip must be free):
    scripts/tpu_run.sh scripts/ab_kernels.py --a auto --b pallas [--spc 64]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--a", default="auto")
    p.add_argument("--b", default="jnp")
    p.add_argument("--spc", type=int, default=64)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--shapes", default="B=32,T=20,R=20,D=2048,E=256,K=8,"
                   "V=67,KC=67,W=3")
    args = p.parse_args()

    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("ab_kernels")
    enable_compilation_cache()
    import jax
    import bench
    from nafae_tpu.config import load_config
    from nafae_tpu.train import TrainState, make_optimizer, make_train_step

    s = {k: int(v) for k, v in
         (kv.split("=") for kv in args.shapes.split(","))}
    batch = {k: jax.device_put(v) for k, v in bench.make_batch(s).items()}

    def build(kernels):
        cfg = load_config(preset_name="config4", overrides=[
            f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
            f"data.batch_size={s['B']}", f"loss.num_clusters={s['KC']}",
            f"loss.ctx_window={s['W']}", "loss.kmeans_interval=100",
            f"train.kernels={kernels}", f"model.dtype={args.dtype}",
            "model.matmul_precision=default"])
        step = make_train_step(cfg, make_optimizer(cfg))

        @jax.jit
        def multi(state, batch):
            def body(st, _):
                st, m = step(st, batch)
                return st, m["loss"]
            return jax.lax.scan(body, state, None, length=args.spc)
        return cfg, multi

    def measure(cfg, multi):
        state = TrainState.create(jax.random.PRNGKey(0), cfg)
        state, losses = multi(state, batch)         # compile + warm
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(4):
                state, losses = multi(state, batch)
            float(np.asarray(state.params["b_v"])[0])   # real fetch bound
            best = min(best, time.perf_counter() - t0)
        return best / (4 * args.spc), float(losses[-1])

    res = {}
    for name in (args.a, args.b):
        dt, loss = measure(*build(name))
        res[name] = dt
        print(f"kernels={name}: {dt * 1e6:.1f} us/step loss={loss:.4f}",
              flush=True)
    d = (res[args.b] - res[args.a]) * 1e6
    print(f"delta: {d:+.1f} us/step (positive = {args.a} wins)")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use (see bench.py)
