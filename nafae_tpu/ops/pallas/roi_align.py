"""Pallas RoIAlign kernel (SURVEY.md L139 NATIVE row).

Uses the separable-bilinear formulation (see ops/roi_align.py
roi_align_matmul): per box, pooling weights Wy [P,H] / Wx [P,W] are built
in-kernel from the box coordinates with broadcasted iotas (no gathers — the
reference's CUDA kernel gathers, which is the wrong primitive on TPU), then
the crop-and-pool is two MXU contractions staged through a VMEM scratch.

Production code paths default to roi_align_matmul (pure XLA, identical math,
better MXU utilization via batched einsums); this kernel is the standalone
Pallas artifact, verified against the gather reference in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nafae_tpu.ops.pallas.fused_ground import _interpret


def _weights(lo, hi, size: int, out_size: int, sr: int):
    """Separable bilinear weights [out_size, size] from scalar box extent."""
    extent = jnp.maximum(hi - lo, 1.0)
    cell = extent / out_size
    # TPU iota must be integer-typed; cast to f32 afterwards
    p_iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, size), 0).astype(jnp.float32)
    h_iota = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, size), 1).astype(jnp.float32)
    acc = jnp.zeros((out_size, size), jnp.float32)
    for s in range(sr):
        pts = lo + (p_iota + (s + 0.5) / sr) * cell
        pts = jnp.clip(pts - 0.5, 0.0, size - 1.0)
        acc = acc + jax.nn.relu(1.0 - jnp.abs(pts - h_iota))
    return acc / sr


def _kernel(boxes_ref, feat_ref, out_ref, st_ref, *, H, W, C, P, sr, scale):
    from nafae_tpu.ops.pallas.fused_ground import _score_precision

    x1 = boxes_ref[0, 0, 0] * scale
    y1 = boxes_ref[0, 0, 1] * scale
    x2 = boxes_ref[0, 0, 2] * scale
    y2 = boxes_ref[0, 0, 3] * scale
    # the dots must run in feat's dtype: Mosaic rejects HIGHEST on bf16
    # operands ('Bad lhs type') and mixed f32xbf16 dots fail to lower — a
    # bf16 detector (detector.dtype=bfloat16) hits this on a real chip while
    # the interpret-mode CPU tests sail through (same rule as
    # fused_ground._score_precision)
    fdt = feat_ref.dtype
    prec = _score_precision(fdt)
    wy = _weights(y1, y2, H, P, sr).astype(fdt)        # [P, H]
    wx = _weights(x1, x2, W, P, sr).astype(fdt)        # [P, W]
    # stage 1: st[h, q, c] = sum_w wx[q, w] * feat[h, w, c]
    for h in range(H):
        st_ref[h] = jax.lax.dot_general(
            wx, feat_ref[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                            # [P(q), C]
    # stage 2: out[p, q, c] = sum_h wy[p, h] * st[h, q, c]
    for q in range(P):
        out_ref[0, :, q, :] = jax.lax.dot_general(
            wy.astype(jnp.float32), st_ref[:, q, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)       # [P, C]


def roi_align_pallas(feat: jax.Array, boxes: jax.Array, out_size: int = 7,
                     spatial_scale: float = 1.0, sampling_ratio: int = 2
                     ) -> jax.Array:
    """feat [H,W,C], boxes [N,4] xyxy (image coords) -> [N,P,P,C]."""
    h, w, c = feat.shape
    n = boxes.shape[0]
    kernel = functools.partial(_kernel, H=h, W=w, C=c, P=out_size,
                               sr=sampling_ratio, scale=spatial_scale)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, 1, 4), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, w, c), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, out_size, out_size, c),
                               lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, out_size, out_size, c),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((h, out_size, c), jnp.float32)],
        interpret=_interpret(),
    )(boxes[:, None, :], feat)
