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
import time

import numpy as np

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

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "axon":
        os.environ["JAX_PLATFORMS"] = ""
    import jax
    if jax.default_backend() != "tpu":
        print(f"ab_inline: backend {jax.default_backend()!r}; exiting 3 "
              "for the tpu_run.sh retry loop", file=sys.stderr)
        sys.exit(3)

    from nafae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    from nafae_tpu.config import load_config
    from nafae_tpu.models.detector.faster_rcnn import init_detector
    from nafae_tpu.train import TrainState, make_optimizer, make_train_step

    b, t, sz = args.batch, args.frames, args.image_size
    rng = np.random.RandomState(0)
    batch = {
        "frames": rng.rand(b, t, sz, sz, 3).astype(np.float32),
        "word_ids": rng.randint(0, 67, (b, 4)).astype(np.int32),
        "frame_mask": np.ones((b, t), np.float32),
        "word_mask": np.ones((b, 4), np.float32),
        "segment_id": np.arange(b, dtype=np.int32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    def build(overrides):
        cfg = load_config(preset_name="config5", overrides=[
            f"data.batch_size={b}", f"data.max_frames={t}",
            f"detector.image_size={sz}", "loss.kmeans_interval=100",
            "train.kernels=auto", "model.dtype=bfloat16",
            "model.matmul_precision=default",
        ] + [o for o in overrides.split(",") if o])
        det_model, det_params = init_detector(jax.random.PRNGKey(0),
                                              cfg.detector)
        step = make_train_step(cfg, make_optimizer(cfg),
                               extractor=(det_model.apply, det_params))

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
            for _ in range(args.calls):
                state, losses = multi(state, batch)
            float(np.asarray(state.params["b_v"])[0])   # real fetch bound
            best = min(best, time.perf_counter() - t0)
        return best / (args.calls * args.spc), float(losses[-1])

    res = {}
    variants = [v for v in (args.a, args.b, args.c) if v is not None]
    for name in variants:
        dt, loss = measure(*build(name))
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
