"""ResNet backbone (flax linen), C4 features + C5 RoI head.

Classic Faster R-CNN split (SURVEY.md L136: backbone; the reference lineage
uses VGG16/ResNet-101 with conv4 features at stride 16 and the conv5 block as
the per-RoI head producing 2048-d pooled features — matching the D=2048 RoI
feature dim the grounding model consumes). bfloat16-friendly; BatchNorm is
frozen (inference-style), the standard detector practice.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class FrozenBN(nn.Module):
    """Inference-style normalization: learned scale/bias, fixed running stats.

    DESIGN CONSTRAINT: mean/var live in the ordinary params collection (it
    keeps the torchvision converter and checkpoints a single flat tree),
    which is safe ONLY because the detector is a frozen feature extractor —
    its params never enter the optimizer (train.py keeps them outside
    TrainState and stop-gradients detector outputs). If the detector is
    ever fine-tuned, move mean/var to a non-trainable collection first or
    the optimizer will update running statistics as if they were weights.
    """
    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + 1e-5)
        return x * inv + (bias - mean * inv)


class Bottleneck(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False)(x)
        y = FrozenBN(self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding="SAME", use_bias=False)(y)
        y = FrozenBN(self.features)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False)(y)
        y = FrozenBN(self.features * 4)(y)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False)(x)
            residual = FrozenBN(self.features * 4)(residual)
        return nn.relu(y + residual)


class ResNetC4(nn.Module):
    """Stages conv1..conv4 -> feature map at stride 16, 1024 channels."""
    blocks: Sequence[int] = (3, 4, 6)      # resnet50 conv2..conv4

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(64, (7, 7), strides=(2, 2), padding="SAME",
                    use_bias=False)(x)
        y = FrozenBN(64)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        for stage, n_blocks in enumerate(self.blocks):
            feats = 64 * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = Bottleneck(feats, stride)(y)
        return y                            # [B, H/16, W/16, 1024]


class ResNetC5Head(nn.Module):
    """conv5 block applied per-RoI after RoIAlign -> pooled 2048-d features."""
    blocks: int = 3

    @nn.compact
    def __call__(self, rois):               # [N, 7, 7, 1024]
        y = rois
        for b in range(self.blocks):
            y = Bottleneck(512, 2 if b == 0 else 1)(y)      # -> [N,4,4,2048]
        # global average pool as static per-plane adds: both jnp.mean forms
        # (over (1,2), or over a merged h*w axis) make XLA relayout the
        # conv output to minor-4 T(4,128) tiles (~113 us/step, 16% of the
        # inline config-5 step); summing the h*w static [N,C] slices fuses
        # into one pass over the conv layout with no relayout (an
        # optimization_barrier variant measured identical — the remaining
        # neighbor fusion is the C5 1x1 convs' roofline compute).
        n, h, w, c = y.shape
        acc = y[:, 0, 0, :]
        for i in range(h):
            for j in range(w):
                if i or j:
                    acc = acc + y[:, i, j, :]
        return acc * (1.0 / (h * w))                        # -> [N, 2048]
