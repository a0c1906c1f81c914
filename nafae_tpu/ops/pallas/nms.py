"""Pallas TPU NMS kernel (SURVEY.md L138 NATIVE row).

The reference lineage uses a CUDA nms kernel; greedy NMS is sequential, so
the TPU formulation is the fixed-iteration masked suppression of ops/nms.py
run entirely in VMEM: per iteration an argmax over the live-score lanes, a
vectorized IoU of the winner against all boxes, and a mask update — no HBM
traffic between iterations. Exactly matches ops/nms.nms (tested).

Layout: boxes are passed coordinate-planes-first [B, 4, N] so each coordinate
is one full lane vector; scores [B, 1, N].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _kernel(boxes_ref, scores_ref, idx_ref, valid_ref, *, N, num_keep,
            iou_thresh):
    x1 = boxes_ref[0, 0, :][None, :]                  # [1, N]
    y1 = boxes_ref[0, 1, :][None, :]
    x2 = boxes_ref[0, 2, :][None, :]
    y2 = boxes_ref[0, 3, :][None, :]
    scores = scores_ref[0]                            # [1, N]
    area = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, N), 1)

    live = jnp.ones((1, N), jnp.float32)

    def body(it, live):
        nonlocal it_state
        masked = jnp.where(live > 0, scores, NEG)
        bidx = jnp.argmax(masked, axis=-1)[0]         # scalar int
        onehot = (lane == bidx).astype(jnp.float32)   # [1, N]

        def pick(vec):
            """vec[0, bidx] via masked reduce (no dynamic_slice in Mosaic)."""
            return jnp.sum(vec * onehot)

        bval = pick(masked)
        valid = bval > NEG / 2
        bx1, by1 = pick(x1), pick(y1)
        bx2, by2 = pick(x2), pick(y2)
        barea = jnp.maximum(bx2 - bx1, 0.0) * jnp.maximum(by2 - by1, 0.0)
        ix = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        iy = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = ix * iy
        union = area + barea - inter
        iou = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)
        suppress = jnp.logical_or(iou > iou_thresh, lane == bidx)
        new_live = jnp.where(
            jnp.logical_and(jnp.logical_not(suppress), valid), live, 0.0)
        # scalar stores to VMEM are unsupported: accumulate result lanes and
        # write whole vectors once after the loop
        sel = (keep_lane == it)
        idx_acc = jnp.where(sel, bidx.astype(jnp.int32), it_state[0])
        val_acc = jnp.where(sel, valid.astype(jnp.float32), it_state[1])
        return new_live, (idx_acc, val_acc)

    keep_lane = jax.lax.broadcasted_iota(jnp.int32, (1, num_keep), 1)
    it_state = (jnp.zeros((1, num_keep), jnp.int32),
                jnp.zeros((1, num_keep), jnp.float32))
    for it in range(num_keep):                        # static unroll
        live, it_state = body(it, live)
    idx_ref[0] = it_state[0]
    valid_ref[0] = it_state[1]


def nms_pallas(boxes: jax.Array, scores: jax.Array, num_keep: int,
               iou_thresh: float = 0.7) -> tuple[jax.Array, jax.Array]:
    """boxes [B,N,4], scores [B,N] -> (keep_idx [B,num_keep] int32,
    keep_valid [B,num_keep] f32). Matches ops/nms.batched_nms exactly."""
    b, n, _ = boxes.shape
    planes = jnp.moveaxis(boxes, -1, 1)               # [B, 4, N]
    kernel = functools.partial(_kernel, N=n, num_keep=num_keep,
                               iou_thresh=iou_thresh)
    idx, valid = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 4, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, num_keep), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, num_keep), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, 1, num_keep), jnp.int32),
            jax.ShapeDtypeStruct((b, 1, num_keep), jnp.float32),
        ],
        interpret=_interpret(),
    )(planes, scores[:, None, :])
    return idx[:, 0, :], valid[:, 0, :]
