"""Pallas TPU kernels for the grounding hot path.

Each kernel has a pure-jnp reference in `nafae_tpu.ops` and is verified
against it in tests (interpret mode on CPU, compiled on TPU). SURVEY.md §3
rows tagged NATIVE: similarity+MIL fusion, context window, RoIAlign, NMS.
"""

from nafae_tpu.ops.pallas.fused_ground import cross_mil  # noqa: F401
from nafae_tpu.ops.pallas.nms import nms_pallas  # noqa: F401
from nafae_tpu.ops.pallas.roi_align import roi_align_pallas  # noqa: F401
