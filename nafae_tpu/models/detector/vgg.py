"""VGG16 backbone (flax linen): conv5_3 features + fc6/fc7 RoI head.

SURVEY.md L136 flags the reference backbone as "VGG16 or ResNet-101 —
VERIFY"; the BMVC'18/NAFAE lineage (jwyang/faster-rcnn.pytorch vgg16.py)
plausibly used VGG16, so the rebuild ships it config-switchable
(detector.backbone="vgg16") next to ResNet-C4 — reference detection parity
becomes a config flip, not a rewrite (VERDICT r2 #4).

Architecture (torchvision vgg16 indices in comments, used by the converter):
conv1_1..conv5_3 with the LAST max-pool dropped -> stride-16, 512-channel
feature map; the RoI head is fc6 -> fc7 on the 7x7 RoIAlign crop -> 4096-d
pooled features (so the grounding model runs with model.feat_dim=4096).
No BatchNorm anywhere (classic VGG) — nothing to freeze; dropout is omitted
(the detector is a frozen inference-only feature extractor).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

# (torchvision `features` module index, out_channels) of each conv, in order.
# Pools sit after blocks 1-4 (indices 4, 9, 16, 23); the stride-32 pool at
# index 30 is dropped, as in the faster-rcnn.pytorch lineage (features[:-1]).
VGG16_CONV_LAYERS = (
    (0, 64), (2, 64),
    (5, 128), (7, 128),
    (10, 256), (12, 256), (14, 256),
    (17, 512), (19, 512), (21, 512),
    (24, 512), (26, 512), (28, 512),
)
_POOL_AFTER = {1, 3, 6, 9}    # conv ordinal (0-based) followed by a 2x2 pool


class VGG16Features(nn.Module):
    """conv1_1..conv5_3, final pool dropped -> [B, H/16, W/16, 512].

    dtype: activation/compute dtype (params stay f32 — flax dtype semantics;
    bfloat16 halves activation HBM traffic, safe for a frozen extractor).
    """
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = x if self.dtype is None else x.astype(self.dtype)
        for i, (_, ch) in enumerate(VGG16_CONV_LAYERS):
            # symmetric (1,1) padding == torch Conv2d(padding=1): the VGG
            # convs are all stride 1, where flax SAME is identical too, but
            # explicit padding keeps the torch-parity convention of the
            # ResNet backbone (resnet.py r2 fix)
            y = nn.Conv(ch, (3, 3), padding=((1, 1), (1, 1)),
                        dtype=self.dtype)(y)
            y = nn.relu(y)
            if i in _POOL_AFTER:
                y = nn.max_pool(y, (2, 2), strides=(2, 2))
        return y                                   # [B, H/16, W/16, 512]


class VGG16RoIHead(nn.Module):
    """fc6 -> fc7 on the flattened 7x7 RoI crop -> [N, 4096] f32.

    The flatten is (h, w, c) order — the torch fc6 weight (which flattens
    (c, h, w)) is permuted to match in the converter, so converted
    checkpoints are elementwise-equal (tested).
    """
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, rois):                      # [N, 7, 7, 512]
        y = rois if self.dtype is None else rois.astype(self.dtype)
        y = y.reshape(y.shape[0], -1)              # [N, 7*7*512] (h,w,c)
        y = nn.relu(nn.Dense(4096, dtype=self.dtype)(y))
        y = nn.relu(nn.Dense(4096, dtype=self.dtype)(y))
        return y.astype(jnp.float32)               # [N, 4096]
