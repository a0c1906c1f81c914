"""Multi-host (multi-process) SPMD plumbing.

The reference is single-process research code (SURVEY.md §1: "No
distributed training"); production TPU pods are one process per host with
4 local chips each, coordinated through `jax.distributed`. This module is
the thin, testable layer that takes the existing single-process mesh path
(train.build_train_fn's jit(shard_map)) to a pod:

- ``init_multihost``: `jax.distributed.initialize` wrapper (coordinator
  address / process count / process id from args or the standard
  JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars).
  When nothing is configured but the environment looks like a cluster
  (TPU pod / SLURM / MPI env markers), it attempts jax's own autodetecting
  bare ``initialize()``; otherwise it warns and stays single-process so a
  pod launch can never *silently* degrade to one host.
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
import warnings

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

# Env markers of a multi-process launch environment whose parameters jax's
# bare ``jax.distributed.initialize()`` knows how to autodetect. Only when
# one of these is present do we attempt the bare call — its cloud-TPU
# detector may block on metadata queries on ordinary hosts.
_CLUSTER_ENV_HINTS = (
    "MEGASCALE_COORDINATOR_ADDRESS",        # multislice TPU
    "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",  # GCE/GKE TPU pod runtime
    "SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",   # slurm / open-mpi clusters
    "NAFAE_MULTIHOST_AUTODETECT",             # explicit opt-in override
)


# Set after a successful initialize() in THIS module, so idempotence does
# not depend on the private jax._src.distributed.global_state probe below
# surviving jax upgrades (ADVICE r4 #3): if the probe breaks, a second
# init_multihost call would otherwise re-call initialize() and raise.
_INITIALIZED_HERE = False


def _distributed_client_live() -> bool:
    """True iff jax.distributed.initialize already ran in this process.

    Checked through jax's distributed global state — NOT through
    ``jax.process_count()``, which initializes the XLA backend and would
    make a subsequent ``initialize()`` raise (it must run before any
    backend-touching call). Falls back to the module-level flag when the
    private-API probe fails."""
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:                                    # pragma: no cover
        return _INITIALIZED_HERE


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> bool:
    """Initialize jax.distributed for a multi-process run.

    Returns True when a distributed runtime was initialized (or already
    was), False for a plain single-process run (no coordinator configured
    or detectable anywhere). Safe to call twice.

    Order matters: ``jax.distributed.initialize`` must run BEFORE anything
    that initializes the XLA backend (even ``jax.process_count()``), so all
    configuration is read from args/env first and jax is only queried on
    paths that no longer need to call ``initialize``.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    global _INITIALIZED_HERE
    if _distributed_client_live():
        return True                        # initialized earlier; idempotent
    if coordinator is not None or num_processes is not None:
        # Explicitly configured launch (args or JAX_* env vars).
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
        _INITIALIZED_HERE = True
        return True
    if any(os.environ.get(k) for k in _CLUSTER_ENV_HINTS):
        # Cluster environment with no explicit coordinator: jax's bare
        # initialize() autodetects (TPU pod metadata, SLURM, MPI). Attempt
        # it so a pod launch cannot silently train single-host.
        try:
            jax.distributed.initialize()
            _INITIALIZED_HERE = True
            return True
        except Exception as e:             # detection failed — be loud
            warnings.warn(
                f"--multihost: cluster env markers present but "
                f"jax.distributed.initialize() autodetection failed ({e}); "
                f"continuing SINGLE-process. Set JAX_COORDINATOR_ADDRESS/"
                f"JAX_NUM_PROCESSES/JAX_PROCESS_ID to configure explicitly.")
            return False
    warnings.warn(
        "--multihost requested but no coordinator is configured "
        "(JAX_COORDINATOR_ADDRESS unset) and no cluster environment was "
        "detected; continuing SINGLE-process with the global batch size.")
    return False


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
