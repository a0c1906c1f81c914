"""Box IoU and grounding accuracy primitives (docs/MATH.md §Evaluation).

Reference eval protocol per SURVEY.md L190-199: argmax region per (frame, word),
IoU>0.5 vs GT box, macro/micro box accuracy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """IoU of xyxy boxes; a [..,4], b [..,4] (broadcastable) -> [..].

    Degenerate (zero-area) boxes yield IoU 0.
    """
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0.0, None) * jnp.clip(
        a[..., 3] - a[..., 1], 0.0, None)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0.0, None) * jnp.clip(
        b[..., 3] - b[..., 1], 0.0, None)
    union = area_a + area_b - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-12), 0.0)


def pairwise_iou(a: jax.Array, b: jax.Array) -> jax.Array:
    """a [N,4], b [M,4] -> [N,M]."""
    return box_iou(a[:, None, :], b[None, :, :])


def grounding_hits(s: jax.Array, boxes: jax.Array, gt_boxes: jax.Array,
                   gt_mask: jax.Array, iou_thresh: float = 0.5
                   ) -> tuple[jax.Array, jax.Array]:
    """Batched correctness bits for annotated (frame, word) pairs.

    s [B,K,T,R] similarity; boxes [B,T,R,4] proposal boxes (xyxy);
    gt_boxes [B,K,T,4] per-(word,frame) GT; gt_mask [B,K,T] (1 = annotated).
    Returns (correct [B,K,T] float, gt_mask) — host code aggregates per class.
    """
    from nafae_tpu.ops.grounding import PRECISION

    r_star = jnp.argmax(s, axis=-1)                               # [B,K,T]
    # One-hot einsum instead of take_along_axis: the R-gather of the argmax
    # box becomes a tiny MXU contraction (the select_top_regions lesson —
    # gathers serialize on TPU, 0/1-weight matmuls don't). HIGHEST keeps
    # the selected coordinates bitwise-exact (each output sums exactly one
    # f32 product by 1.0). Unlike the gather, the contraction multiplies
    # EVERY slot by 0/1, so a non-finite value in a dead/padded slot would
    # poison pred via 0·inf=NaN (ADVICE r4 #4) — sanitize first (identity
    # on finite boxes, so the exactness claim stands; loaders/detector pad
    # with zeros, making this a guard, not a behavior change).
    boxes = jnp.nan_to_num(boxes, posinf=0.0, neginf=0.0)
    onehot = jax.nn.one_hot(r_star, s.shape[-1], dtype=boxes.dtype)
    pred = jnp.einsum("bktr,btrc->bktc", onehot, boxes,
                      precision=PRECISION)                        # [B,K,T,4]
    iou = box_iou(pred, gt_boxes)                                 # [B,K,T]
    return (iou > iou_thresh).astype(jnp.float32) * gt_mask, gt_mask
