"""Pallas TPU NMS kernel (SURVEY.md L138 NATIVE row).

The reference lineage uses a CUDA nms kernel; greedy NMS is sequential, so
the TPU formulation is the fixed-iteration masked suppression of ops/nms.py
run entirely in VMEM: per iteration a per-row argmax over the live-score
lanes, a vectorized IoU of each row's winner against all its boxes, and a
mask update — no HBM traffic between iterations. Exactly matches
ops/nms.nms (tested).

Design note (r2 rewrite): the first version ran grid=(B,) with one batch
row per program — but TPU grid steps execute *serially*, so B=16 rows cost
16 × num_keep sequential argmax chains and the kernel LOST to the XLA scan
(+21 us/step at inline config-5 shapes). This version processes a BLOCK of
rows per program ([rb, N]): the per-iteration argmax/IoU/suppress are
row-parallel VPU ops (sublane axis = batch, lane axis = boxes), leaving
only the inherent num_keep-step sequential dependence. Problems whose five
input planes fit the VMEM budget run as a single block (the benchmarked
inline shapes); larger ones tile the batch axis over a serial grid of
row blocks. It also scales to the full anchor pool (N ≈ 6k-24k), enabling
proposal selection WITHOUT the [B, N] pre-NMS sort (see
models/detector/rpn.py full-pool mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nafae_tpu.ops.pallas.fused_ground import NEG, _interpret


def _kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref, idx_ref, valid_ref,
            *, N, num_keep, iou_thresh):
    x1 = x1_ref[...]                                  # [B, N]
    y1 = y1_ref[...]
    x2 = x2_ref[...]
    y2 = y2_ref[...]
    scores = scores_ref[...]                          # [B, N]
    b = scores.shape[0]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (b, N), 1)
    keep_lane = jax.lax.broadcasted_iota(jnp.int32, (b, num_keep), 1)

    live = jnp.ones((b, N), jnp.float32)
    idx_acc = jnp.zeros((b, num_keep), jnp.int32)
    val_acc = jnp.zeros((b, num_keep), jnp.float32)

    for it in range(num_keep):                        # static unroll
        masked = jnp.where(live > 0, scores, NEG)
        bval = jnp.max(masked, axis=1, keepdims=True)           # [B, 1]
        # per-row argmax = first lane attaining the max (== jnp.argmax ties)
        is_max = masked == bval
        bidx = jnp.min(jnp.where(is_max, lane, N), axis=1,
                       keepdims=True)                           # [B, 1]
        onehot = lane == bidx                                   # [B, N]
        valid = bval > NEG      # strict, matching ops/nms.py exactly: a
                                # row exhausts when its masked max IS the
                                # NEG fill (scores in (-1e9, -5e8] stay
                                # valid, as in the jnp reference)

        def pick(vec):
            """vec[row, bidx[row]] via masked reduce (no dynamic_slice)."""
            return jnp.sum(jnp.where(onehot, vec, 0.0), axis=1,
                           keepdims=True)                       # [B, 1]

        bx1, by1 = pick(x1), pick(y1)
        bx2, by2 = pick(x2), pick(y2)
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        ix = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        iy = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = ix * iy
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        suppress = jnp.logical_or(iou > iou_thresh, onehot)
        live = jnp.where(
            jnp.logical_and(jnp.logical_not(suppress), valid), live, 0.0)
        # scalar stores to VMEM are unsupported: accumulate result lanes
        # and write whole [B, num_keep] vectors once after the loop
        sel = keep_lane == it
        idx_acc = jnp.where(sel, bidx, idx_acc)
        val_acc = jnp.where(sel, valid.astype(jnp.float32), val_acc)

    idx_ref[...] = idx_acc
    valid_ref[...] = val_acc


# VMEM byte budget for the five input planes of one block. Rows are
# independent, so oversize problems tile the batch axis over a serial grid
# of row blocks (e.g. the config-5 preset's own defaults reach 320 rows x
# 24000 anchors = 31 MB/plane — far past the ~16 MB VMEM as one block).
_VMEM_INPUT_BUDGET = 4 * 1024 * 1024


def nms_pallas_planes(x1: jax.Array, y1: jax.Array, x2: jax.Array,
                      y2: jax.Array, scores: jax.Array, num_keep: int,
                      iou_thresh: float = 0.7
                      ) -> tuple[jax.Array, jax.Array]:
    """Coordinate-plane form: x1/y1/x2/y2/scores each [B,N] ->
    (keep_idx [B,num_keep] int32, keep_valid [B,num_keep] f32).

    This is the kernel's native layout — the full-pool proposal path
    (rpn.decode_boxes_planes) feeds it without ever building [B,N,4]."""
    b, n = scores.shape
    per_row = 5 * n * 4
    if b * per_row <= _VMEM_INPUT_BUDGET:
        rb = b                       # common case: whole batch, one block
    else:
        # row blocks in multiples of the 8-sublane tile; padded rows carry
        # NEG scores, so they emit valid=0 slots like any dead row
        rb = min(b, max(8, _VMEM_INPUT_BUDGET // per_row // 8 * 8))
        if rb * per_row > 4 * _VMEM_INPUT_BUDGET:
            # the 8-row sublane floor has overridden the budget (N so large
            # that even one tile of rows blows VMEM) — fail with the fix,
            # not a Mosaic allocation error deep in compilation
            raise ValueError(
                f"nms_pallas_planes: pool of N={n} anchors needs "
                f"{rb * per_row >> 20} MiB of VMEM input blocks even at the "
                "minimum 8-row tile; pre-select with detector.rpn_pre_nms_"
                "topk (approx_topk sort) or shrink detector.image_size — "
                "the full-pool kernel tops out around N~100k")
    pad = (-b) % rb
    if pad:
        rows = lambda a, v: jnp.pad(a, ((0, pad), (0, 0)),
                                    constant_values=v)
        x1, y1, x2, y2 = (rows(p, 0.0) for p in (x1, y1, x2, y2))
        scores = rows(scores, NEG)
    kernel = functools.partial(_kernel, N=n, num_keep=num_keep,
                               iou_thresh=iou_thresh)
    blk = lambda cols: pl.BlockSpec((rb, cols), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)
    idx, valid = pl.pallas_call(
        kernel,
        grid=((b + pad) // rb,),
        in_specs=[blk(n)] * 5,
        out_specs=[blk(num_keep), blk(num_keep)],
        out_shape=[
            jax.ShapeDtypeStruct((b + pad, num_keep), jnp.int32),
            jax.ShapeDtypeStruct((b + pad, num_keep), jnp.float32),
        ],
        interpret=_interpret(),
    )(x1, y1, x2, y2, scores)
    return idx[:b], valid[:b]


def nms_pallas(boxes: jax.Array, scores: jax.Array, num_keep: int,
               iou_thresh: float = 0.7) -> tuple[jax.Array, jax.Array]:
    """boxes [B,N,4], scores [B,N] -> (keep_idx [B,num_keep] int32,
    keep_valid [B,num_keep] f32). Matches ops/nms.batched_nms exactly."""
    planes = jnp.moveaxis(boxes, -1, 0)               # [4, B, N]
    return nms_pallas_planes(planes[0], planes[1], planes[2], planes[3],
                             scores, num_keep, iou_thresh)
