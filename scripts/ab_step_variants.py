"""Within-process A/B of experimental train-step variants (chip required).

Builds the FULL config-4 train step once per named variant in ONE process
(docs/PERF.md methodology: cross-process comparisons are meaningless here)
and reports best-of-N each. Variants are (module, attr, value) flags set at
trace time, declared in FLAGS below:

- base            — the production step (current defaults, nothing touched)
- alpha_recompute — ctx kernel recomputes the band scores in the backward
                    instead of saving the alpha slabs (the pre-r4 default;
                    fused_ctx.ALPHA_RESIDUAL=False)

(r4 history: alpha_res won +17.3 µs/step and became the default; cross_dw
lost −376 µs/step and was deleted — docs/PERF.md "headroom closed".)

    scripts/tpu_run.sh scripts/ab_step_variants.py [--variants base,...]
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
    p.add_argument("--variants", default="base,alpha_recompute")
    p.add_argument("--spc", type=int, default=64)
    p.add_argument("--repeats", type=int, default=4)
    p.add_argument("--calls", type=int, default=4)
    p.add_argument("--tile", type=int, default=0,
                   help="ctx kernel tile override (0 = production auto)")
    p.add_argument("--dtype", default="bfloat16")
    args = p.parse_args()

    from nafae_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache,
                                 require_tpu_or_exit3)
    apply_platform_override()
    require_tpu_or_exit3("ab_step_variants")
    enable_compilation_cache()

    # Backend init can succeed while the FIRST DEVICE USE hangs forever
    # (observed r4: device_put blocked 30 min with 0 progress — the r3
    # outage mode, docs/PERF.md). Same contract as bench.py: a watchdog
    # thread exits 3 unless a variant completes within the deadline, so
    # tpu_run.sh retries in a fresh process. Each finished variant rearms.
    import threading
    deadline = float(os.environ.get("NAFAE_AB_DEADLINE", "900"))
    progress = threading.Event()

    def _watchdog():
        while True:
            progress.clear()
            if not progress.wait(deadline):
                print(f"ab_step_variants: no variant finished in "
                      f"{deadline:.0f} s; exiting 3 for the tpu_run.sh "
                      "retry loop", file=sys.stderr)
                sys.stderr.flush()
                os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    import bench
    import nafae_tpu.ops.losses as LS
    import nafae_tpu.ops.pallas.fused_ctx as FC
    import nafae_tpu.train as TR
    from nafae_tpu.config import load_config
    from nafae_tpu.train import TrainState, make_optimizer, make_train_step

    s = bench.SHAPES
    batch = {k: jax.device_put(v) for k, v in bench.make_batch(s).items()}
    cfg = load_config(preset_name="config4", overrides=[
        f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
        f"data.batch_size={s['B']}", f"loss.num_clusters={s['KC']}",
        f"loss.ctx_window={s['W']}", "loss.kmeans_interval=100",
        "train.kernels=auto", f"model.dtype={args.dtype}",
        "model.matmul_precision=default"])
    if args.tile:
        FC._pick_tile = lambda t, w: args.tile

    # variant -> list of (module, attr, value) applied before tracing;
    # "base" applies nothing (production defaults). Add experimental
    # module flags here; flags are restored to defaults after each build.
    FLAGS = {
        "base": [],
        "alpha_recompute": [(FC, "ALPHA_RESIDUAL", False)],
        # r4 tail attack (docs/PERF.md r4 trace + "headroom closed"):
        # assign_vpu — the pre-r4 k-means assignment (f32-promoted VPU loop
        #   fusion; ASSIGN_MXU won −35.9 us/step and is the default)
        # argmax_2d — selection argmax over the relayouted materialized s
        #   (the re-emitted transposed-einsum form lost +99.9 us, deleted)
        "assign_vpu": [(TR, "ASSIGN_MXU", False)],
        "argmax_lanes": [(TR, "ARGMAX_2D", False)],
        # proj_unfused — XLA-autodiff projection+normalize (the pre-r4
        #   form; PROJ_FUSED won −19.9 us/step and is the default)
        "proj_unfused": [(TR, "PROJ_FUSED", False)],
        # (r4 history: cross_onehot — a one-hot custom-VJP cross-MIL max
        # whose backward fed dv̂/dŵ as MXU dots over a shared selection
        # matrix — lost +566.0 µs/step to materialized 5-D broadcast/
        # reshape layout traffic and was deleted; see the NOTE at
        # ops/grounding._cross_sim and docs/PERF.md "headroom closed".)
        # cluster_onehot — cluster-loss target centers via a one-hot MXU
        #   dot instead of the 14.5 µs kCustom dynamic-gather (exact).
        #   MEASURED LOSS: 970.7 → 1037.8 µs/step (−67.1) — exactness on
        #   f32 centers forces a HIGHEST-precision (6-pass) dot; see the
        #   ops/losses.CLUSTER_TARGET_ONEHOT note and PERF.md.
        "cluster_onehot": [(LS, "CLUSTER_TARGET_ONEHOT", True)],
        # opt_flat — optimizer (global-norm clip + adamw) over ONE raveled
        #   vector via optax.flatten (train.OPT_FLAT note): fuses the
        #   per-leaf update chains in the ~110 us near-zero-FLOP tail.
        #   MEASURED LOSS: 995.3 → 1005.4 µs/step (−10.1) — the ravel/
        #   unravel concats cost more than the fusion-count cut saves.
        "opt_flat": [(TR, "OPT_FLAT", True)],
    }
    defaults = {(m, a): getattr(m, a) for fl in FLAGS.values()
                for m, a, _ in fl}

    def build(flags):
        for (m, a), v in defaults.items():
            setattr(m, a, v)
        for m, a, v in flags:              # read at trace time
            setattr(m, a, v)
        # rebuilt per variant: make_optimizer reads flags (OPT_FLAT) at
        # BUILD time, the loss path reads the rest at trace time
        step = make_train_step(cfg, make_optimizer(cfg))

        @jax.jit
        def multi(state, batch):
            def body(st, _):
                st, m = step(st, batch)
                return st, m["loss"]
            return jax.lax.scan(body, state, None, length=args.spc)
        return multi

    def measure(multi):
        state = TrainState.create(jax.random.PRNGKey(0), cfg)
        state, losses = multi(state, batch)
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            for _ in range(args.calls):
                state, losses = multi(state, batch)
            float(np.asarray(state.params["b_v"])[0])
            best = min(best, time.perf_counter() - t0)
        return best / (args.calls * args.spc), float(losses[-1])

    res = {}
    for name in args.variants.split(","):
        dt, loss = measure(build(FLAGS[name]))
        res[name] = dt
        progress.set()
        print(f"{name}: {dt * 1e6:.1f} us/step loss={loss:.4f}", flush=True)
    for (m, a), v in defaults.items():
        setattr(m, a, v)
    base = res.get("base")
    if base:
        for name, dt in res.items():
            if name != "base":
                print(f"{name} vs base: {(base - dt) * 1e6:+.1f} us/step "
                      f"(positive = {name} wins)")


if __name__ == "__main__":
    main()
    sys.stdout.flush()
    os._exit(0)   # axon teardown can hang after chip use (see bench.py)
