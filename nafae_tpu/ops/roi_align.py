"""RoIAlign (bilinear crop-and-pool) — jnp reference.

The reference detector lineage uses a CUDA roi_align kernel (SURVEY.md
L139). This is the standard Mask R-CNN formulation: each output cell of an
`out_size × out_size` grid averages `sampling_ratio²` bilinear samples from
the feature map; boxes are in feature-map coordinates after applying
`spatial_scale`. Gather-based, so it jits/vmaps cleanly; the Pallas version
lives in ops/pallas/roi_align.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("out_size", "sampling_ratio"))
def roi_align(feat: jax.Array, boxes: jax.Array, out_size: int = 7,
              spatial_scale: float = 1.0, sampling_ratio: int = 2
              ) -> jax.Array:
    """feat [H,W,C], boxes [N,4] xyxy (image coords) -> [N,out,out,C]."""
    h, w, c = feat.shape
    n = boxes.shape[0]
    b = boxes * spatial_scale
    x1, y1, x2, y2 = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
    bw = jnp.maximum(x2 - x1, 1.0)
    bh = jnp.maximum(y2 - y1, 1.0)
    cell_w = bw / out_size                                   # [N]
    cell_h = bh / out_size
    sr = sampling_ratio
    # sample coordinates: out_size cells × sr samples per cell per axis
    grid = (jnp.arange(out_size * sr) + 0.5) / sr            # [S] in cell units
    sx = x1[:, None] + grid[None, :] * cell_w[:, None]       # [N,S]
    sy = y1[:, None] + grid[None, :] * cell_h[:, None]       # [N,S]

    def bilinear(py, px):
        """py [N,S], px [N,S] -> samples [N,S,S,C] (y outer, x inner)."""
        py = jnp.clip(py - 0.5, 0.0, h - 1.0)                # pixel-center align
        px = jnp.clip(px - 0.5, 0.0, w - 1.0)
        y0 = jnp.floor(py).astype(jnp.int32)
        x0 = jnp.floor(px).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy1 = py - y0
        wx1 = px - x0
        f = feat.reshape(h * w, c)

        def gather(yi, xi):                                  # [N,S],[N,S]->[N,S,S,C]
            idx = yi[:, :, None] * w + xi[:, None, :]        # [N,S,S]
            return jnp.take(f, idx.reshape(n, -1), axis=0).reshape(
                n, yi.shape[1], xi.shape[1], c)

        v00 = gather(y0, x0)
        v01 = gather(y0, x1i)
        v10 = gather(y1i, x0)
        v11 = gather(y1i, x1i)
        wy1e = wy1[:, :, None, None]
        wx1e = wx1[:, None, :, None]
        return (v00 * (1 - wy1e) * (1 - wx1e) + v01 * (1 - wy1e) * wx1e
                + v10 * wy1e * (1 - wx1e) + v11 * wy1e * wx1e)

    samples = bilinear(sy, sx)                               # [N,S,S,C]
    s = out_size
    pooled = samples.reshape(n, s, sr, s, sr, c).mean(axis=(2, 4))
    return pooled


def bilinear_weights(coords: jax.Array, size: int, out_size: int,
                     sampling_ratio: int) -> jax.Array:
    """Separable bilinear pooling weights along one axis.

    coords: (lo, hi) [N,2] box extent on this axis (feature coords).
    Returns Wm [N, out_size, size] with
      Wm[n,p,h] = mean over the cell's samples of relu(1 - |py - h|),
    i.e. RoIAlign's bilinear kernel — clamped at the borders exactly like the
    gather implementation (sample coords clipped to [0, size-1]).
    """
    lo, hi = coords[:, 0], coords[:, 1]
    extent = jnp.maximum(hi - lo, 1.0)
    cell = extent / out_size                                  # [N]
    sr = sampling_ratio
    grid = (jnp.arange(out_size * sr) + 0.5) / sr             # [P*sr] cell units
    pts = lo[:, None] + grid[None, :] * cell[:, None]         # [N, P*sr]
    pts = jnp.clip(pts - 0.5, 0.0, size - 1.0)
    idx = jnp.arange(size, dtype=pts.dtype)
    w = jax.nn.relu(1.0 - jnp.abs(pts[:, :, None] - idx[None, None, :]))
    # border clamp: a clipped point sits exactly on cell 0 / size-1 -> weight 1
    n = coords.shape[0]
    return w.reshape(n, out_size, sr, size).mean(axis=2)      # [N,P,size]


def roi_align_matmul(feat: jax.Array, boxes: jax.Array, out_size: int = 7,
                     spatial_scale: float = 1.0, sampling_ratio: int = 2
                     ) -> jax.Array:
    """MXU-native RoIAlign: the bilinear kernel is separable, so the whole op
    is two batched matmuls, out = Wy @ feat @ Wxᵀ — no gathers at all. This is
    the production TPU formulation (the CUDA kernel the reference lineage uses
    is gather-based; gathers are the wrong primitive on TPU). Matches
    `roi_align` to float tolerance (tested)."""
    from nafae_tpu.ops import grounding as _G
    h, w, c = feat.shape
    b = boxes * spatial_scale
    wy = bilinear_weights(b[:, (1, 3)], h, out_size, sampling_ratio)  # [N,P,H]
    wx = bilinear_weights(b[:, (0, 2)], w, out_size, sampling_ratio)  # [N,P,W]
    # reduced-dtype feature maps (detector.dtype=bfloat16) keep the whole op
    # in that dtype — weights are in [0,1] and both matmuls accumulate f32
    # via preferred_element_type; f32 inputs are untouched (exactness tests)
    wy, wx = wy.astype(feat.dtype), wx.astype(feat.dtype)
    # late-bound precision: matmul_precision("default") must reach the
    # detector's hot einsums too (see ops/grounding.PRECISION contract)
    mid = jnp.einsum("nph,hwc->npwc", wy, feat,
                     preferred_element_type=jnp.float32,
                     precision=_G.PRECISION)
    out = jnp.einsum("nqw,npwc->npqc", wx, mid,
                     preferred_element_type=jnp.float32,
                     precision=_G.PRECISION)
    return out.astype(feat.dtype)


def roi_align_combined(feat: jax.Array, boxes: jax.Array, out_size: int = 7,
                       spatial_scale: float = 1.0, sampling_ratio: int = 2
                       ) -> jax.Array:
    """One-dot RoIAlign: fold BOTH separable axes into a single pooling
    matrix W2[n,(p,q),(h,w)] = wy[n,p,h]·wx[n,q,w] and contract with the
    flattened feature map in one MXU dot, out = W2 @ feat.

    Same math as `roi_align_matmul` (identical wy/wx), different HBM/FLOP
    trade: ~4x the MXU FLOPs (the reduction runs over H·W instead of H
    then W) but NO [N,P,W,C] intermediate — at inline config-5 shapes the
    separable pair traced HBM-bound at 13 TF/s moving a 92 MB bf16
    intermediate (docs/PERF.md r4 inline trace, fusion.827/829). Select via
    `detector.roi_impl=combined`.

    MEASURED A LOSS at inline config-5 shapes (r4 ab_inline, full step,
    within-process): 4075.6 → 4200.3 µs/step (+124.8) — the extra MXU
    passes + the [N,49,400] pooling-matrix build outweigh the bandwidth
    saved. Default stays "separable"; knob + parity test kept
    (docs/PERF.md "headroom closed").
    """
    from nafae_tpu.ops import grounding as _G
    h, w, c = feat.shape
    n = boxes.shape[0]
    b = boxes * spatial_scale
    wy = bilinear_weights(b[:, (1, 3)], h, out_size, sampling_ratio)  # [N,P,H]
    wx = bilinear_weights(b[:, (0, 2)], w, out_size, sampling_ratio)  # [N,Q,W]
    w2 = (wy[:, :, None, :, None] * wx[:, None, :, None, :]).reshape(
        n, out_size * out_size, h * w)                       # [N,PQ,HW]
    # one cast of the f32 product (the separable form rounds wy/wx each);
    # both accumulate the dot in f32 via preferred_element_type
    w2 = w2.astype(feat.dtype)
    out = jnp.einsum("nkm,mc->nkc", w2, feat.reshape(h * w, c),
                     preferred_element_type=jnp.float32,
                     precision=_G.PRECISION)
    return out.reshape(n, out_size, out_size, c).astype(feat.dtype)
