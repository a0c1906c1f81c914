"""Device mesh construction (SURVEY.md §3 parallelism table).

The reference is single-process/single-GPU with no communication backend
(SURVEY.md L163); the TPU-native answer is a `jax.sharding.Mesh` whose
collectives ride ICI. Axes:
  data  — videos (DP): gradients psum-reduced; in-batch negatives handled by
          the distributed ranking decomposition in parallel/sharding.py.
  frame — the frame/sequence axis (SP) for long clips: MIL softmax becomes an
          online softmax across shards, the context window a halo exchange.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(data_axis: int = -1, frame_axis: int = 1,
              data_axis_name: str = "data", frame_axis_name: str = "frame",
              devices=None) -> Mesh:
    explicit_devices = devices is not None
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data_axis == -1:
        if n % frame_axis:
            raise ValueError(f"{n} devices not divisible by frame_axis={frame_axis}")
        data_axis = n // frame_axis
    if data_axis * frame_axis > n:
        raise ValueError(
            f"mesh {data_axis}x{frame_axis} needs {data_axis * frame_axis} devices, "
            f"have {n}")
    if not explicit_devices and data_axis * frame_axis < n:
        # an explicit device list smaller than the mesh is a caller choice
        # (tests build submeshes this way); silently idling devices from the
        # DEFAULT list is not — the run would train at a fraction of the
        # expected throughput with a smaller global batch than sized for
        import warnings
        warnings.warn(
            f"mesh {data_axis}x{frame_axis} uses {data_axis * frame_axis} of "
            f"{n} devices; the rest idle (pass devices= explicitly to build "
            "a submesh on purpose)", stacklevel=2)
    devs = np.asarray(devices[: data_axis * frame_axis]).reshape(
        data_axis, frame_axis)
    return Mesh(devs, (data_axis_name, frame_axis_name))
