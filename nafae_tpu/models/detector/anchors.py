"""Anchor generation + box encoding/decoding (SURVEY.md L137: RPN + anchors).

Standard Faster R-CNN parameterization: anchors are (scale, ratio) boxes
tiled over the feature grid at the backbone stride; deltas are
(dx, dy, dw, dh) in the usual normalized form.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def generate_anchors(feat_h: int, feat_w: int, stride: int,
                     scales=(32, 64, 128, 256, 512),
                     ratios=(0.5, 1.0, 2.0)) -> np.ndarray:
    """-> [feat_h*feat_w*A, 4] xyxy anchors (numpy; static per config)."""
    base = []
    for s in scales:
        for r in ratios:
            w = s * np.sqrt(1.0 / r)
            h = s * np.sqrt(r)
            base.append([-w / 2, -h / 2, w / 2, h / 2])
    base = np.asarray(base, np.float32)                      # [A,4]
    ys = (np.arange(feat_h) + 0.5) * stride
    xs = (np.arange(feat_w) + 0.5) * stride
    cx, cy = np.meshgrid(xs, ys)                             # [H,W]
    centers = np.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
    return (centers + base[None]).reshape(-1, 4).astype(np.float32)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 image_size: int) -> jnp.ndarray:
    """Apply (dx,dy,dw,dh) deltas to anchors; clip to the image. [N,4]->[N,4]."""
    aw = anchors[:, 2] - anchors[:, 0]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    dx, dy, dw, dh = (deltas[:, 0], deltas[:, 1],
                      jnp.clip(deltas[:, 2], -4.0, 4.0),
                      jnp.clip(deltas[:, 3], -4.0, 4.0))
    cx = acx + dx * aw
    cy = acy + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    boxes = jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=1)
    return jnp.clip(boxes, 0.0, float(image_size))
