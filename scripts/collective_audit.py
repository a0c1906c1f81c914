"""Per-collective byte audit of the compiled DP×SP train step (VERDICT r4
#4: replace PERF.md's "a few hundred KB/step" with a per-collective byte
table at 8/16/32 devices).

Compiles the PRODUCTION-shape config-4 step (B=32 T=20 R=20 D=2048 E=256,
bf16 + auto kernels like bench.py) over virtual CPU meshes data×frame =
8×1, 8×2, 8×4, parses the optimized HLO's collective ops, and prints a
markdown table of every collective's payload bytes per device per step.

The numbers are mesh-topology facts, not timings: they are what crosses
ICI on a real v5e slice of that shape. Run:

    python scripts/collective_audit.py            # all three meshes
    python scripts/collective_audit.py --mesh 8x4 # one

Self-bootstrapping: re-execs with a 32-device virtual CPU backend when
the current backend is smaller (same pattern as __graft_entry__).
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

def collect(txt: str):
    """[(op, operand shapes str, payload bytes)] from optimized HLO.
    ONE parser shared with the test-side audits — see
    nafae_tpu.utils.profiling.collective_payloads."""
    from nafae_tpu.utils.profiling import collective_payloads
    return collective_payloads(txt)


def audit(data: int, frame: int):
    import numpy as np
    import jax

    from nafae_tpu.config import load_config
    from nafae_tpu.parallel import make_mesh
    from nafae_tpu.train import TrainState, build_train_fn

    n = data * frame
    cfg = load_config(preset_name="config4", overrides=[
        "data.batch_size=32", "data.max_frames=20", "data.num_regions=20",
        "data.feat_dim=2048", "model.feat_dim=2048", "model.embed_dim=256",
        "loss.num_clusters=67", "loss.ctx_window=3", "loss.kmeans_interval=1",
        "model.dtype=bfloat16", "model.matmul_precision=default",
        "train.kernels=jnp",   # CPU compile; the ctx kernel's collectives
                               # are identical (the halo runs OUTSIDE it)
        f"mesh.data_axis={data}", f"mesh.frame_axis={frame}",
    ])
    mesh = make_mesh(data, frame, devices=jax.devices()[:n])
    rng = np.random.RandomState(0)
    b, t, r = 32, 20, 20
    batch = {
        "feats": rng.randn(b, t, r, 2048).astype(np.float32),
        "boxes": np.abs(rng.rand(b, t, r, 4)).astype(np.float32),
        "word_ids": rng.randint(0, 67, (b, 8)).astype(np.int32),
        "frame_mask": np.ones((b, t), np.float32),
        "word_mask": np.ones((b, 8), np.float32),
        "region_mask": np.ones((b, t, r), np.float32),
        "segment_id": np.arange(b, dtype=np.int32),
    }
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    fn = build_train_fn(cfg, mesh)
    txt = fn.lower(state, batch).compile().as_text()
    rows = collect(txt)
    total = sum(p for _, _, p in rows)
    print(f"\n### mesh data×frame = {data}×{frame} ({n} devices), "
          f"config-4 production shapes, bf16")
    print("| collective | payload (per device) | bytes |")
    print("|---|---|---|")
    agg: dict = {}
    for op, shapes, p in rows:
        key = (op, shapes, p)
        agg[key] = agg.get(key, 0) + 1
    for (op, shapes, p), cnt in sorted(agg.items(), key=lambda kv: -kv[0][2]):
        label = shapes if len(shapes) < 48 else shapes[:45] + "..."
        mult = f" ×{cnt}" if cnt > 1 else ""
        print(f"| {op}{mult} | {label} | {p:,} |")
    print(f"| **total/step** | {len(rows)} collectives | **{total:,}** |")
    return total


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--mesh", nargs="*", default=["8x1", "8x2", "8x4"])
    args = p.parse_args()
    need = max(int(m.split("x")[0]) * int(m.split("x")[1])
               for m in args.mesh)

    if os.environ.get("_NAFAE_AUDIT_CHILD") != "1":
        env = dict(os.environ)
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                            + f" --xla_force_host_platform_device_count={need}"
                            ).strip()
        env["_NAFAE_AUDIT_CHILD"] = "1"
        env.pop("JAX_PLATFORMS", None)
        sys.exit(subprocess.run([sys.executable] + sys.argv, env=env).returncode)

    import jax
    jax.config.update("jax_platforms", "cpu")
    for m in args.mesh:
        data, frame = (int(x) for x in m.split("x"))
        audit(data, frame)


if __name__ == "__main__":
    main()
