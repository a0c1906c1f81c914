"""Second-stage Faster R-CNN heads: classification + box refinement.

Completes the detector beyond feature extraction (SURVEY.md L136-139: the
reference's external detector has cls/reg heads over the RoI features; the
grounding pipeline itself only consumes the pooled features, but detection
outputs are part of the Faster R-CNN surface). Per-class refinement deltas
follow the standard parameterization (anchors.decode_boxes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from nafae_tpu.models.detector.anchors import decode_boxes


class DetectionHead(nn.Module):
    """RoI features [N, F] -> class logits [N, C+1] and per-class deltas."""

    num_classes: int            # foreground classes (background is class 0)

    @nn.compact
    def __call__(self, roi_feats: jax.Array):
        c = self.num_classes + 1
        logits = nn.Dense(c, name="cls")(roi_feats)                # [N, C+1]
        deltas = nn.Dense(c * 4, name="reg")(roi_feats)            # [N, (C+1)*4]
        return logits, deltas.reshape(roi_feats.shape[0], c, 4)


def decode_detections(boxes: jax.Array, logits: jax.Array, deltas: jax.Array,
                      image_size: int, score_thresh: float = 0.05
                      ) -> dict:
    """Per-RoI best foreground class + refined box.

    boxes [N,4] proposals; logits [N,C+1]; deltas [N,C+1,4].
    Returns {boxes [N,4], scores [N], classes [N]} (classes are 1-based
    foreground ids; score below threshold -> class 0 / background).
    """
    probs = jax.nn.softmax(logits, axis=-1)
    fg = probs[:, 1:]                                              # [N, C]
    best = jnp.argmax(fg, axis=-1)                                 # [N]
    scores = jnp.take_along_axis(fg, best[:, None], axis=1)[:, 0]
    # take_along_axis broadcasts the non-axis dims of the [N,1,1] index
    d = jnp.take_along_axis(deltas, (best + 1)[:, None, None], axis=1)[:, 0]
    refined = decode_boxes(boxes, d, image_size)
    cls = jnp.where(scores >= score_thresh, best + 1, 0)
    return {"boxes": refined, "scores": scores, "classes": cls}
