"""Region Proposal Network (SURVEY.md L137): objectness + deltas -> proposals.

Proposal selection is shape-static for XLA: top-k by objectness (fixed k),
delta decode, then fixed-iteration NMS (ops/nms.py) down to num_proposals.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from nafae_tpu.models.detector.anchors import decode_boxes



class RPNHead(nn.Module):
    num_anchors: int
    channels: int = 256
    dtype: jnp.dtype | None = None   # conv compute dtype; outputs are cast
                                     # back to f32 — box delta decode and
                                     # NMS scoring are precision-sensitive

    @nn.compact
    def __call__(self, feat):              # [B,H,W,C]
        y = nn.relu(nn.Conv(self.channels, (3, 3), padding="SAME",
                            dtype=self.dtype)(feat))
        obj = nn.Conv(self.num_anchors, (1, 1),
                      dtype=self.dtype)(y)                   # [B,H,W,A]
        deltas = nn.Conv(self.num_anchors * 4, (1, 1),
                         dtype=self.dtype)(y)                # [B,H,W,A*4]
        b = feat.shape[0]
        return (obj.reshape(b, -1).astype(jnp.float32),
                deltas.reshape(b, -1, 4).astype(jnp.float32))


def select_proposals_batched(obj_logits: jax.Array, deltas: jax.Array,
                             anchors: jax.Array, image_size: int,
                             pre_nms_topk: int, num_proposals: int,
                             nms_iou: float = 0.7,
                             nms_impl: str = "jnp",
                             topk_impl: str = "exact"
                             ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched proposal selection: obj [B,N], deltas [B,N,4] ->
    (boxes [B,R,4], scores [B,R], keep_valid [B,R]). keep_valid marks the
    NMS survivors — it becomes the batch's region_mask so downstream
    max/softmax/losses can exclude dead proposal slots. nms_impl="pallas"
    uses the on-chip suppression kernel (ops/pallas/nms.py).

    topk_impl="approx" uses lax.approx_max_k — the TPU-native partial
    reduction (recall ~0.95 of the exact top-k; a full [B,N] sort cost
    ~8% of the inline config-5 step). On CPU it falls back to exact.
    Proposal recall is insensitive to the tail of the pre-NMS pool; use
    "exact" when comparing detections against a converted reference
    checkpoint (docs/PARITY.md §3)."""
    k = min(pre_nms_topk, obj_logits.shape[-1])
    if topk_impl == "approx":
        scores, idx = jax.lax.approx_max_k(obj_logits, k)       # [B,k]
    else:
        scores, idx = jax.lax.top_k(obj_logits, k)              # [B,k]
    boxes = jax.vmap(lambda i, d: decode_boxes(
        jnp.take(anchors, i, axis=0), d, image_size))(
        idx, jnp.take_along_axis(deltas, idx[..., None], axis=1))
    if nms_impl == "pallas":
        from nafae_tpu.ops.pallas.nms import nms_pallas
        keep_idx, keep_valid = nms_pallas(boxes, scores, num_proposals,
                                          nms_iou)
    else:
        from nafae_tpu.ops.nms import batched_nms
        keep_idx, keep_valid = batched_nms(boxes, scores, num_proposals,
                                           nms_iou)
    out_boxes = jnp.take_along_axis(boxes, keep_idx[..., None], axis=1)
    out_scores = jnp.take_along_axis(scores, keep_idx, axis=1) * keep_valid
    return out_boxes * keep_valid[..., None], out_scores, keep_valid


def select_proposals(obj_logits: jax.Array, deltas: jax.Array,
                     anchors: jax.Array, image_size: int,
                     pre_nms_topk: int, num_proposals: int,
                     nms_iou: float = 0.7, nms_impl: str = "jnp",
                     topk_impl: str = "exact"
                     ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-image form of select_proposals_batched (same 3-tuple contract,
    without the leading batch axis)."""
    boxes, scores, keep_valid = select_proposals_batched(
        obj_logits[None], deltas[None], anchors, image_size, pre_nms_topk,
        num_proposals, nms_iou, nms_impl=nms_impl, topk_impl=topk_impl)
    return boxes[0], scores[0], keep_valid[0]
