"""Multi-host plumbing: process sharding, global-batch assembly, and a
REAL 2-process CPU cluster running one DP train step.

The reference has no distributed story (SURVEY.md §1); these tests pin the
pod-scale layer of parallel/multihost.py: the single-process degenerate
path must equal the plain mesh path bitwise, the per-process dataset slice
must be a disjoint cover, and a genuine jax.distributed 2-process CPU
cluster (4 local devices each -> 8 global) must reproduce the
single-process 8-device loss."""

import json
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest

import jax

from nafae_tpu.config import Config
from nafae_tpu.parallel import make_mesh
from nafae_tpu.parallel.multihost import (batch_sharding, global_batch_spec,
                                          host_local_to_global,
                                          init_multihost, process_shard)


def _tiny_cfg():
    cfg = Config()
    cfg.data.feat_dim = 16
    cfg.data.max_frames = 4
    cfg.data.num_regions = 3
    cfg.data.max_words = 2
    cfg.data.batch_size = 8
    cfg.model.feat_dim = 16
    cfg.model.embed_dim = 8
    cfg.loss.ctx_window = 1
    cfg.loss.num_clusters = 4
    cfg.train.steps_per_call = 1
    return cfg


def _batch(cfg, b, seed=0):
    rng = np.random.default_rng(seed)
    dc = cfg.data
    t, r, d, k = dc.max_frames, dc.num_regions, dc.feat_dim, dc.max_words
    return {
        "feats": rng.normal(size=(b, t, r, d)).astype(np.float32),
        "boxes": rng.uniform(0, 50, size=(b, t, r, 4)).astype(np.float32),
        "word_ids": rng.integers(0, cfg.model.vocab_size,
                                 size=(b, k)).astype(np.int32),
        "frame_mask": np.ones((b, t), np.float32),
        "word_mask": np.ones((b, k), np.float32),
        "region_mask": np.ones((b, t, r), np.float32),
        "segment_id": np.arange(b, dtype=np.int32),
    }


def test_process_shard_disjoint_cover():
    for n in (8, 10, 3):
        for cnt in (1, 2, 4):
            got = []
            for pid in range(cnt):
                got.extend(process_shard(n, pid, cnt))
            assert got == list(range(n))   # disjoint, covering, ordered


def test_init_multihost_noop_single_process():
    # No coordinator configured and no cluster env markers: must decline
    # LOUDLY (a pod launch may never silently degrade to one host).
    with pytest.warns(UserWarning, match="SINGLE-process"):
        assert init_multihost() is False
    assert jax.process_count() == 1


def test_host_local_to_global_single_process_matches_mesh_path():
    """process_count=1: assembly must be a plain sharded put — the train
    step over assembled arrays equals the step over host numpy bitwise."""
    from nafae_tpu.train import TrainState, build_train_fn

    cfg = _tiny_cfg()
    mesh = make_mesh(8, 1)
    fn = build_train_fn(cfg, mesh)
    batch = _batch(cfg, cfg.data.batch_size)
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    s1, m1 = fn(state, batch)

    spec = global_batch_spec(cfg, mesh)
    shardings = batch_sharding(mesh, spec)
    rows = list(process_shard(cfg.data.batch_size))
    local = {k: np.take(v, rows, axis=0) for k, v in batch.items()}
    gbatch = host_local_to_global(local, shardings)
    state2 = TrainState.create(jax.random.PRNGKey(0), cfg)
    s2, m2 = fn(state2, gbatch)
    assert float(m1["loss"]) == float(m2["loss"])
    np.testing.assert_array_equal(np.asarray(s1.params["w_v"]),
                                  np.asarray(s2.params["w_v"]))


def test_global_batch_spec_matches_train_consumption():
    cfg = _tiny_cfg()
    mesh = make_mesh(4, 2)
    spec = global_batch_spec(cfg, mesh)
    assert spec["feats"] == jax.sharding.PartitionSpec("data", "frame")
    assert spec["word_ids"] == jax.sharding.PartitionSpec("data")
    spec5 = global_batch_spec(cfg, mesh, with_frames=True,
                              leading_scan_axis=True)
    assert spec5["frames"] == jax.sharding.PartitionSpec(None, "data",
                                                         "frame")
    assert "feats" not in spec5


_WORKER = textwrap.dedent("""
    import os, sys, json
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    port, pid = sys.argv[1], int(sys.argv[2])
    # Go through init_multihost's documented env-var launch path (the
    # DEPLOY.md flow): JAX_* vars only, no direct initialize() call. This
    # pins the order-of-operations contract — init_multihost must call
    # jax.distributed.initialize BEFORE any backend-touching jax query.
    os.environ["JAX_COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    os.environ["JAX_NUM_PROCESSES"] = "2"
    os.environ["JAX_PROCESS_ID"] = str(pid)
    from nafae_tpu.parallel.multihost import init_multihost
    assert init_multihost() is True
    assert init_multihost() is True        # idempotent second call
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()

    import numpy as np
    from nafae_tpu.parallel import make_mesh
    from nafae_tpu.train import TrainState, build_train_fn
    from tests.test_multihost import _tiny_cfg, _batch

    cfg = _tiny_cfg()
    mesh = make_mesh(8, 1)                    # 8 global devices, 2 hosts
    fn = build_train_fn(cfg, mesh)            # takes the process_count>1 path
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, cfg.data.batch_size)  # identically seeded per host
    for _ in range(2):
        state, metrics = fn(state, batch)
    print(json.dumps({"pid": pid, "loss": float(metrics["loss"]),
                      "grad_norm": float(metrics["grad_norm"])}), flush=True)
""")


def test_two_process_cpu_cluster(tmp_path):
    """Spawn a real jax.distributed 2-process CPU cluster (4 devices each)
    and run two DP-8 train steps; both hosts must report the exact loss the
    single-process 8-device mesh run produces."""
    from nafae_tpu.train import TrainState, build_train_fn

    # ground truth: same program, single process, 8 local devices
    cfg = _tiny_cfg()
    fn = build_train_fn(cfg, make_mesh(8, 1))
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    batch = _batch(cfg, cfg.data.batch_size)
    for _ in range(2):
        state, metrics = fn(state, batch)
    want = float(metrics["loss"])

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    import os
    env = {**os.environ, "PYTHONPATH": os.pathsep.join(
        [str(p) for p in (os.getcwd(),)] + sys.path)}
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen([sys.executable, str(script), str(port),
                               str(pid)], stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE, env=env, text=True)
             for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    assert {o["pid"] for o in outs} == {0, 1}
    for o in outs:
        assert np.isfinite(o["loss"])
        np.testing.assert_allclose(o["loss"], want, rtol=1e-5,
                                   err_msg=str(outs))
    np.testing.assert_allclose(outs[0]["grad_norm"], outs[1]["grad_norm"],
                               rtol=1e-6)
