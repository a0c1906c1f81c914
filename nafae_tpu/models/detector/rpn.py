"""Region Proposal Network (SURVEY.md L137): objectness + deltas -> proposals.

Proposal selection is shape-static for XLA. Two routes:
- topk: top-k by objectness (fixed k), delta decode, fixed-iteration NMS
  (ops/nms.py) down to num_proposals — the reference lineage's order.
- full-pool (topk_impl="none"): decode every anchor as coordinate planes
  and greedy-NMS the whole pool in the row-parallel Pallas kernel — no
  sort, textbook-exact, fastest on TPU (docs/PERF.md r2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from nafae_tpu.models.detector.anchors import (decode_boxes,
                                               decode_boxes_planes,
                                               decode_delta_planes)



class RPNHead(nn.Module):
    num_anchors: int
    channels: int = 256
    dtype: jnp.dtype | None = None   # conv compute dtype; scores are cast
                                     # back to f32 (NMS scoring / the
                                     # pre-NMS sort are precision-
                                     # sensitive). Deltas KEEP the compute
                                     # dtype — the conv already quantized
                                     # their values, so deferring the f32
                                     # upcast into the decode fusion
                                     # (anchors.decode_delta_planes) is
                                     # bitwise-identical and lets the raw
                                     # plane path stay bf16 end-to-end.

    @nn.compact
    def __call__(self, feat, raw: bool = False):   # [B,H,W,C]
        y = nn.relu(nn.Conv(self.channels, (3, 3), padding="SAME",
                            dtype=self.dtype)(feat))
        obj = nn.Conv(self.num_anchors, (1, 1),
                      dtype=self.dtype)(y)                   # [B,H,W,A]
        deltas = nn.Conv(self.num_anchors * 4, (1, 1),
                         dtype=self.dtype)(y)                # [B,H,W,A*4]
        b = feat.shape[0]
        obj = obj.reshape(b, -1).astype(jnp.float32)
        if raw:
            # grid-layout deltas for the full-pool plane path: channel
            # index a*4+c matches the generate_anchors order (cell-major,
            # anchor-minor), so strided channel slices ARE the coordinate
            # planes — no [B,N,4] materialization (whose layout conversion
            # cost ~19 us/step at inline config-5, docs/PERF.md).
            return obj, deltas
        return obj, deltas.reshape(b, -1, 4)


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
                             topk_window: int = 1,
                             deltas_raw: jax.Array | None = None
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
        # Full-pool path works in coordinate-PLANE form throughout: the
        # decode produces four [B,N] planes (XLA fuses the channel slices
        # of the deltas into the decode math) and the Pallas kernel takes
        # planes directly — never materializing [B,N,4] boxes, whose
        # plane-major relayout for the kernel cost ~19 us/step at inline
        # config-5 shapes (a [16,6000,4] reshape + copy, docs/PERF.md).
        scores = obj_logits                                     # [B,N]
        if deltas_raw is not None:
            # grid-layout deltas [B,H,W,A*4] (RPNHead raw=True): channel
            # a*4+c matches the anchor order, so stride-4 channel slices
            # are the per-coordinate delta planes; XLA fuses slice +
            # upcast + decode into one fusion per plane instead of a
            # [B,N,4] reshape + plane-major copy.
            b = deltas_raw.shape[0]
            d = [deltas_raw[..., c::4].reshape(b, -1) for c in range(4)]
            planes = decode_delta_planes(anchors, *d, image_size)
        else:
            planes = decode_boxes_planes(anchors, deltas, image_size)
        if nms_impl == "pallas":
            from nafae_tpu.ops.pallas.nms import nms_pallas_planes
            keep_idx, keep_valid = nms_pallas_planes(
                *planes, scores, num_proposals, nms_iou)
        else:
            from nafae_tpu.ops.nms import batched_nms
            keep_idx, keep_valid = batched_nms(
                jnp.stack(planes, axis=-1), scores, num_proposals, nms_iou)
        out_boxes = jnp.stack(
            [jnp.take_along_axis(p, keep_idx, axis=1) for p in planes],
            axis=-1)                                            # [B,R,4]
        out_scores = (jnp.take_along_axis(scores, keep_idx, axis=1)
                      * keep_valid)
        return out_boxes * keep_valid[..., None], out_scores, keep_valid
    if topk_impl == "window":
        scores, idx = windowed_topk(obj_logits, k, topk_window)  # [B,k]
    elif topk_impl == "approx":
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
                     topk_impl: str = "exact", topk_window: int = 1
                     ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Per-image form of select_proposals_batched (same 3-tuple contract,
    without the leading batch axis)."""
    boxes, scores, keep_valid = select_proposals_batched(
        obj_logits[None], deltas[None], anchors, image_size, pre_nms_topk,
        num_proposals, nms_iou, nms_impl=nms_impl, topk_impl=topk_impl,
        topk_window=topk_window)
    return boxes[0], scores[0], keep_valid[0]
