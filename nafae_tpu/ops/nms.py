"""TPU-style NMS: fixed-iteration masked suppression (jnp reference).

The reference detector lineage uses a CUDA nms kernel (SURVEY.md L138).
GPU NMS is data-dependent/sequential; the TPU formulation is a
shape-static iterative suppression: at each of exactly `num_keep` steps,
select the highest-scoring live box, emit it, and kill every live box with
IoU > thresh against it. Runs under jit/scan; the Pallas version
(ops/pallas/nms.py) implements the same loop on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

NEG = -1e9


@functools.partial(jax.jit, static_argnames=("num_keep",))
def nms(boxes: jax.Array, scores: jax.Array, num_keep: int,
        iou_thresh: float = 0.7, score_thresh: float = -jnp.inf
        ) -> tuple[jax.Array, jax.Array]:
    """boxes [N,4] xyxy, scores [N] -> (keep_idx [num_keep], keep_valid [num_keep]).

    Exactly matches classic greedy NMS for the top num_keep survivors.
    Invalid slots (fewer than num_keep survivors) have keep_valid=0 and
    keep_idx=0 (safe to gather; multiply results by keep_valid).
    """
    # IoU rows are computed lazily per selected box: the full [N,N] matrix
    # costs O(N^2) HBM (at N=1024, 16 frames it was ~40% of the inline
    # config-5 step's device time) while the greedy loop only ever reads
    # num_keep rows. The coordinates are split into [N] planes OUTSIDE the
    # scan: indexing the packed [N,4] array inside the scan body made XLA
    # relayout it to coordinate planes every step (a 111 us/step copy at
    # the inline shapes). Same formula as ops/iou.box_iou, exact same
    # survivors (tested vs classic greedy).
    x1, y1, x2, y2 = (boxes[:, i] for i in range(4))        # [N] each
    areas = jnp.clip(x2 - x1, 0.0, None) * jnp.clip(y2 - y1, 0.0, None)
    live = scores > score_thresh

    def body(live, _):
        s = jnp.where(live, scores, NEG)
        best = jnp.argmax(s)
        valid = s[best] > NEG
        bx1, by1, bx2, by2 = x1[best], y1[best], x2[best], y2[best]
        iw = jnp.clip(jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1), 0.0, None)
        ih = jnp.clip(jnp.minimum(by2, y2) - jnp.maximum(by1, y1), 0.0, None)
        inter = iw * ih
        union = areas[best] + areas - inter
        iou_row = jnp.where(union > 0, inter / jnp.maximum(union, 1e-12),
                            0.0)                            # [N]
        # kill the selected box and all its high-IoU neighbors
        suppress = (iou_row > iou_thresh) | (
            jnp.arange(scores.shape[0]) == best)
        live = live & ~suppress & valid                     # freeze when done
        return live, (best, valid.astype(jnp.float32))

    _, (keep_idx, keep_valid) = jax.lax.scan(
        body, live, None, length=num_keep)
    return keep_idx, keep_valid


def batched_nms(boxes: jax.Array, scores: jax.Array, num_keep: int,
                iou_thresh: float = 0.7) -> tuple[jax.Array, jax.Array]:
    """vmap over a leading batch axis. boxes [B,N,4], scores [B,N]."""
    fn = lambda b, s: nms(b, s, num_keep, iou_thresh)
    return jax.vmap(fn)(boxes, scores)
