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


def windowed_topk(scores: jax.Array, k: int, window: int
                  ) -> tuple[jax.Array, jax.Array]:
    """Partial top-k via per-window pre-reduction: [B,N] -> ([B,k], [B,k]).

    The TPU-native answer to "top-k where the sort dominates": max+argmax
    over contiguous windows of `window` entries first, then an exact top-k
    over the N/window window maxima — the sort shrinks by the window factor.
    (lax.approx_max_k's PartialReduce needs ~k/-ln(recall) buckets, so at
    proposal-selection ratios like k=1024 of N=6000 it silently falls back
    to the same full sort this replaces.)

    Approximate: at most one candidate survives per window, so a true
    top-k entry is lost only when two land in the same window — in the
    [h,w,A] anchor layout those are same-cell near-duplicates that NMS at
    IoU 0.7 would mostly suppress anyway. window=1 is exact top_k.
    """
    if window <= 1:
        return jax.lax.top_k(scores, k)
    b, n = scores.shape
    pad = (-n) % window
    if pad:
        scores = jnp.pad(scores, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
    nw = scores.shape[1] // window
    s = scores.reshape(b, nw, window)
    vals, widx = jax.lax.top_k(jnp.max(s, axis=-1), min(k, nw))
    warg = jnp.argmax(s, axis=-1)                          # [B,nw]
    idx = widx * window + jnp.take_along_axis(warg, widx, axis=1)
    if k > nw:       # keep the contract shape; extra slots repeat the last
        vals = jnp.pad(vals, ((0, 0), (0, k - nw)), mode="edge")
        idx = jnp.pad(idx, ((0, 0), (0, k - nw)), mode="edge")
    return vals, idx


def select_proposals_batched(obj_logits: jax.Array, deltas: jax.Array,
                             anchors: jax.Array, image_size: int,
                             pre_nms_topk: int, num_proposals: int,
                             nms_iou: float = 0.7,
                             nms_impl: str = "jnp",
                             topk_impl: str = "exact",
                             topk_window: int = 4
                             ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Batched proposal selection: obj [B,N], deltas [B,N,4] ->
    (boxes [B,R,4], scores [B,R], keep_valid [B,R]). keep_valid marks the
    NMS survivors — it becomes the batch's region_mask so downstream
    max/softmax/losses can exclude dead proposal slots. nms_impl="pallas"
    uses the on-chip suppression kernel (ops/pallas/nms.py).

    topk_impl: "exact" (full sort), "approx" (lax.approx_max_k — NOTE at
    proposal ratios it usually falls back to the same full sort, see
    windowed_topk), "window" (windowed_topk with `topk_window`: the
    sort shrinks by the window factor; at-most-one candidate per window
    of adjacent same-cell anchors), or "none" (NO pre-NMS truncation:
    decode every anchor and run greedy NMS over the full pool — the
    textbook-exact selection, no sort at all; pair with nms_impl="pallas",
    whose single-program row-parallel kernel handles N≈6k, since the XLA
    scan's per-iteration cost scales with N). Proposal recall is
    insensitive to the tail of the pre-NMS pool; use "exact" when
    comparing detections against a converted reference checkpoint
    (docs/PARITY.md §3)."""
    k = min(pre_nms_topk, obj_logits.shape[-1])
    if topk_impl == "none":
        scores = obj_logits                                     # [B,N]
        boxes = jax.vmap(
            lambda d: decode_boxes(anchors, d, image_size))(deltas)
    elif topk_impl == "window":
        scores, idx = windowed_topk(obj_logits, k, topk_window)  # [B,k]
    elif topk_impl == "approx":
        scores, idx = jax.lax.approx_max_k(obj_logits, k)       # [B,k]
    else:
        scores, idx = jax.lax.top_k(obj_logits, k)              # [B,k]
    if topk_impl != "none":
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
                     topk_impl: str = "exact", topk_window: int = 4
                     ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-image form of select_proposals_batched (same 3-tuple contract,
    without the leading batch axis)."""
    boxes, scores, keep_valid = select_proposals_batched(
        obj_logits[None], deltas[None], anchors, image_size, pre_nms_topk,
        num_proposals, nms_iou, nms_impl=nms_impl, topk_impl=topk_impl,
        topk_window=topk_window)
    return boxes[0], scores[0], keep_valid[0]
