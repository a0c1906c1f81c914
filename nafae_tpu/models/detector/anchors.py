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


def decode_delta_planes(anchors: jnp.ndarray, dx: jnp.ndarray,
                        dy: jnp.ndarray, dw: jnp.ndarray, dh: jnp.ndarray,
                        image_size: int
                        ) -> tuple[jnp.ndarray, jnp.ndarray,
                                   jnp.ndarray, jnp.ndarray]:
    """Decode from per-coordinate delta planes ([B,N] each, any float
    dtype — upcast to f32 here, inside the fusion) to clipped coordinate
    planes (x1, y1, x2, y2), each [B,N] f32. Same math as decode_boxes;
    this is the layout the Pallas NMS kernel consumes
    (nafae_tpu/ops/pallas/nms.py)."""
    aw = anchors[:, 2] - anchors[:, 0]                       # [N]
    ah = anchors[:, 3] - anchors[:, 1]
    acx = anchors[:, 0] + 0.5 * aw
    acy = anchors[:, 1] + 0.5 * ah
    dx = dx.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    dw = jnp.clip(dw.astype(jnp.float32), -4.0, 4.0)
    dh = jnp.clip(dh.astype(jnp.float32), -4.0, 4.0)
    cx = acx + dx * aw
    cy = acy + dy * ah
    w = aw * jnp.exp(dw)
    h = ah * jnp.exp(dh)
    clip = lambda v: jnp.clip(v, 0.0, float(image_size))
    return (clip(cx - w / 2), clip(cy - h / 2),
            clip(cx + w / 2), clip(cy + h / 2))


def decode_boxes_planes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                        image_size: int
                        ) -> tuple[jnp.ndarray, jnp.ndarray,
                                   jnp.ndarray, jnp.ndarray]:
    """Batched plane-form decode from stacked deltas: anchors [N,4] +
    deltas [B,N,4] -> (x1, y1, x2, y2), each [B,N], clipped. Prefer the
    grid-layout path (slicing RPNHead raw output channels straight into
    decode_delta_planes) where available — it avoids materializing
    [B,N,4] at all (~19 us/step at inline config-5, docs/PERF.md r2)."""
    return decode_delta_planes(anchors, deltas[..., 0], deltas[..., 1],
                               deltas[..., 2], deltas[..., 3], image_size)


def decode_boxes(anchors: jnp.ndarray, deltas: jnp.ndarray,
                 image_size: int) -> jnp.ndarray:
    """Apply (dx,dy,dw,dh) deltas to anchors; clip to the image. [N,4]->[N,4].

    Stacked-output convenience over decode_delta_planes (one source of
    truth for the decode math)."""
    return jnp.stack(
        decode_delta_planes(anchors, deltas[..., 0], deltas[..., 1],
                            deltas[..., 2], deltas[..., 3], image_size),
        axis=-1)
