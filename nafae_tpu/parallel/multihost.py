"""Multi-host (multi-process) SPMD plumbing.

The reference is single-process research code (SURVEY.md §1: "No
distributed training"); production TPU pods are one process per host with
4 local chips each, coordinated through `jax.distributed`. This module is
the thin, testable layer that takes the existing single-process mesh path
(train.build_train_fn's jit(shard_map)) to a pod:

- ``init_multihost``: `jax.distributed.initialize` wrapper (coordinator
  address / process count / process id from args or the standard
  JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars;
  on real TPU pods jax autodetects all three from the TPU metadata and
  the wrapper is a pass-through).
- ``process_shard``: the per-process slice of a dataset — disjoint,
  covering, and deterministic, so every global batch row is read by
  exactly one host.
- ``host_local_to_global``: assemble each process's local batch rows into
  global `jax.Array`s via `jax.make_array_from_process_local_data`; the
  jitted shard_map program then consumes them with zero re-layout (each
  host's rows are already on its own chips).

Everything here is exercised single-process by the test suite (the
assembly path is identical — `make_array_from_process_local_data` with
process_count=1 is the degenerate case) and cross-process by
tests/test_multihost.py's real 2-process CPU cluster.
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-process run.

    Returns True when a multi-process runtime was initialized (or already
    was), False for a plain single-process run (no coordinator configured
    anywhere). Safe to call twice.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if jax.process_count() > 1:
        return True          # already initialized (e.g. TPU pod autodetect)
    if coordinator is None and num_processes is None:
        return False
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_shard(n: int, process_id: int | None = None,
                  process_count: int | None = None) -> range:
    """The contiguous slice of [0, n) owned by this process.

    Disjoint + covering: remainder items go to the first `n % count`
    processes, matching how a global batch's rows map to mesh devices
    (row-major over the data axis — each host's loader feeds exactly the
    rows that live on its chips).
    """
    pid = jax.process_index() if process_id is None else process_id
    cnt = jax.process_count() if process_count is None else process_count
    base, rem = divmod(n, cnt)
    lo = pid * base + min(pid, rem)
    return range(lo, lo + base + (1 if pid < rem else 0))


def batch_sharding(mesh: Mesh, spec_tree: dict) -> dict:
    """PartitionSpec tree -> NamedSharding tree for one batch."""
    return {k: NamedSharding(mesh, s) for k, s in spec_tree.items()}


def host_local_to_global(batch: dict, shardings: dict) -> dict:
    """Assemble per-process local batch rows into global jax.Arrays.

    batch[k] holds THIS process's rows of the global batch (global_B /
    process_count each, in process_index order — the `process_shard`
    layout). With one process this degenerates to a plain device_put onto
    the sharding, so the same code path serves both.
    """
    return {k: jax.make_array_from_process_local_data(
                shardings[k], np.asarray(v))
            for k, v in batch.items()}


def global_batch_spec(cfg, mesh: Mesh, with_frames: bool = False,
                      leading_scan_axis: bool = False) -> dict:
    """The batch PartitionSpec tree build_train_fn uses, exported so the
    multihost assembly shards batches exactly the way the compiled
    program consumes them (data axis over hosts' chips, frame axis over
    SP)."""
    axis = cfg.mesh.data_axis_name
    faxis = cfg.mesh.frame_axis_name
    fspec = faxis if mesh.shape.get(faxis, 1) > 1 else None
    lead = (None,) if leading_scan_axis else ()
    spec = {
        "word_ids": P(*lead, axis), "frame_mask": P(*lead, axis, fspec),
        "word_mask": P(*lead, axis), "segment_id": P(*lead, axis),
    }
    if with_frames:
        spec["frames"] = P(*lead, axis, fspec)
    else:
        spec["feats"] = P(*lead, axis, fspec)
        spec["boxes"] = P(*lead, axis, fspec)
        spec["region_mask"] = P(*lead, axis, fspec)
    return spec
