"""ResNet backbone (flax linen), C4 features + C5 RoI head.

Classic Faster R-CNN split (SURVEY.md L136: backbone; the reference lineage
uses VGG16/ResNet-101 with conv4 features at stride 16 and the conv5 block as
the per-RoI head producing 2048-d pooled features — matching the D=2048 RoI
feature dim the grounding model consumes). bfloat16-friendly; BatchNorm is
frozen (inference-style), the standard detector practice.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

# conv2..conv4 bottleneck counts per depth (the conv5/C5 head is always 3
# blocks). SURVEY.md L136: the reference lineage is "VGG16 or ResNet-101 —
# VERIFY"; both resnet depths and vgg16 are config-switchable.
RESNET_BLOCKS = {"resnet50": (3, 4, 6), "resnet101": (3, 4, 23)}


class FrozenBN(nn.Module):
    """Inference-style normalization: learned scale/bias, fixed running stats.

    DESIGN CONSTRAINT: mean/var live in the ordinary params collection (it
    keeps the torchvision converter and checkpoints a single flat tree),
    which is safe ONLY because the detector is a frozen feature extractor —
    its params never enter the optimizer (train.py keeps them outside
    TrainState and stop-gradients detector outputs). If the detector is
    ever fine-tuned, move mean/var to a non-trainable collection first or
    the optimizer will update running statistics as if they were weights.

    dtype: compute dtype of the affine (params stay f32; inv/shift are
    derived in f32 then cast — frozen stats make reduced precision safe,
    there is nothing to accumulate).
    """
    features: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = scale / jnp.sqrt(var + 1e-5)
        shift = bias - mean * inv
        if self.dtype is not None:
            inv, shift = inv.astype(self.dtype), shift.astype(self.dtype)
        return x * inv + shift


_BN_EPS = 1e-5


def fold_frozen_bn(params: dict) -> dict:
    """Load-time transform: fold every FrozenBN affine into its preceding
    conv's kernel (VERDICT r4 #1b). y·inv + shift with inv = scale/√(var+ε)
    becomes conv(x, W·inv) + shift — same math, but the per-forward
    inv/shift derivation and the post-conv multiply disappear from the
    compiled program.

    The param TREE is unchanged (checkpoints/converters untouched): the BN
    entry is rewritten to an exact identity-with-shift — scale' = √(1+ε)
    computed in the same f32 ops the forward uses, var' = 1, mean' = 0,
    bias' = shift — so the forward's inv' = scale'/√(var'+ε) divides a
    number by itself (exactly 1.0) and adds the original shift. Pairing
    rule: flax auto-naming makes FrozenBN_i follow Conv_i in the same
    module scope (Bottleneck, ResNetC4 stem); only 4-D no-bias conv
    kernels are folded. IDEMPOTENT: re-folding multiplies by inv' == 1.0
    and re-derives the same shift, so applying it after a checkpoint load
    (extract.py / train.py) or after init is equally safe.
    """
    import numpy as np

    z = np.sqrt(np.float32(1.0) + np.float32(_BN_EPS)).astype(np.float32)

    def fold_tree(d):
        d = {k: (fold_tree(v) if isinstance(v, dict) else v)
             for k, v in d.items()}
        for k in list(d):
            if not k.startswith("FrozenBN_"):
                continue
            conv_key = "Conv_" + k.split("_", 1)[1]
            conv = d.get(conv_key)
            if not (isinstance(conv, dict)
                    and set(conv) == {"kernel"}
                    and np.asarray(conv["kernel"]).ndim == 4):
                continue
            bn = d[k]
            scale = np.asarray(bn["scale"], np.float32)
            var = np.asarray(bn["var"], np.float32)
            mean = np.asarray(bn["mean"], np.float32)
            bias = np.asarray(bn["bias"], np.float32)
            inv = scale / np.sqrt(var + np.float32(_BN_EPS))
            shift = bias - mean * inv
            kernel = np.asarray(conv["kernel"], np.float32) * inv
            d[conv_key] = {"kernel": jnp.asarray(kernel)}
            d[k] = {"scale": jnp.full(scale.shape, z),
                    "var": jnp.ones(var.shape, jnp.float32),
                    "mean": jnp.zeros(mean.shape, jnp.float32),
                    "bias": jnp.asarray(shift)}
        return d

    return fold_tree(dict(params))


class Bottleneck(nn.Module):
    features: int
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False,
                    dtype=self.dtype)(x)
        y = FrozenBN(self.features, self.dtype)(y)
        y = nn.relu(y)
        # explicit symmetric (1,1) padding: identical to SAME at stride 1,
        # but at stride 2 flax SAME pads (0,1) while the torch reference
        # lineage pads (1,1) — converted checkpoints would see a shifted
        # feature grid (r2 review fix; tested vs torch in
        # test_torch_convert_frcnn.py)
        y = nn.Conv(self.features, (3, 3), strides=(self.stride, self.stride),
                    padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype)(y)
        y = FrozenBN(self.features, self.dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = FrozenBN(self.features * 4, self.dtype)(y)
        if residual.shape[-1] != self.features * 4 or self.stride != 1:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype)(x)
            residual = FrozenBN(self.features * 4, self.dtype)(residual)
        return nn.relu(y + residual)


class StemConv(nn.Module):
    """The 7×7/s2 stem conv, computed as a space-to-depth 4×4/s1 conv.

    The naive 7×7 on 3 input channels is INPUT-CHANNEL-STARVED on the MXU
    (128-deep reduction fed 21 elements/tap): traced at 586 µs/step = 15%
    of the whole inline config-5 step at 6.6% MFU. The classic TPU fix:
    pad the kernel 7→8 at the front, fold 2×2 input pixels into channels
    (x[2I+p, 2J+q, c] → x2[I, J, (p,q,c)]), and run the EXACT same sums as
    a 4×4 stride-1 conv on 12 channels with padding (2,1) —
      y[i] = Σ_{d∈0..6} W[d]·x[2i+d−3] = Σ_{a∈0..3,p} W'[2a+p]·x2[i+a−2, p·]
    (W'[0]=0 from the pad). Same math, different summation grouping.

    The param tree is nn.Conv's (kernel [7,7,3,F] under the caller-given
    name), so torch converters and existing checkpoints are untouched.
    s2d=False runs the plain 7×7 form (odd input sizes also fall back).

    pad_ch: zero-pad the INPUT channel dim (and the kernel) to this count
    at trace time — exact (the extra products are 0·x) with the same param
    tree; a knob for the emitter's channel tiling on the starved 3-channel
    input. 0 disables. MEASURED a wash (r4 ab_inline, full config-5 step:
    pad_ch=8 −5.2 µs, pad_ch=16 −3.4 µs ≈ noise) — the emitter already
    pads the starved channel dim internally; knob kept for other
    toolchains (docs/PERF.md "headroom closed").

    MEASURED (r4, ab_inline within-process, full config-5 step): s2d=True
    4055 → 5215 µs/step — this toolchain's conv emitter handles the
    4×4/s1/12-channel form WORSE than the native 7×7/s2, so the default
    stays False; the knob + exactness test remain for future toolchains
    (docs/PERF.md "headroom closed").
    """
    features: int = 64
    s2d: bool = True
    dtype: jnp.dtype | None = None
    pad_ch: int = 0
    im2col: bool = False   # compute the stem as XLA's
                           # conv_general_dilated_patches + ONE
                           # [N·Ho·Wo, 147]x[147, F] matmul — exact same
                           # sums (patches channel order is (C,KH,KW):
                           # kernel transposes (2,0,1,3)); hands the MXU a
                           # dense 147-deep contraction instead of the
                           # emitter's 3-channel-starved conv plan
                           # (VERDICT r4 #1c).
    nminor: bool = False   # feed the conv a [H,W,C,N] operand (exact
                           # transpose + dimension_numbers) — physically
                           # the {0,3,2,1} layout the emitter asks for,
                           # aiming to fuse the 130 µs standalone input
                           # relayout copy into the producer fusion
                           # (docs/PERF.md r4 inline trace, copy.231).

    @nn.compact
    def __call__(self, x):
        k = self.param("kernel", nn.initializers.lecun_normal(),
                       (7, 7, 3, self.features))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            k = k.astype(self.dtype)
        n, h, w, c = x.shape
        if self.pad_ch > c:
            pad = ((0, 0),) * 3 + ((0, self.pad_ch - c),)
            x = jnp.pad(x, pad)
            k = jnp.pad(k, ((0, 0), (0, 0), (0, self.pad_ch - c), (0, 0)))
            c = self.pad_ch
        dn = ("NHWC", "HWIO", "NHWC")
        if self.im2col:
            p = jax.lax.conv_general_dilated_patches(
                x, (7, 7), (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
            n2, ho, wo, ck = p.shape               # ck = c*49, (C,KH,KW) order
            y = jax.lax.dot_general(
                p.reshape(n2 * ho * wo, ck),
                k.transpose(2, 0, 1, 3).reshape(ck, self.features),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return y.reshape(n2, ho, wo, self.features).astype(
                x.dtype if self.dtype is None else self.dtype)
        if self.nminor:
            return jax.lax.conv_general_dilated(
                x.transpose(1, 2, 3, 0), k, (2, 2), ((3, 3), (3, 3)),
                dimension_numbers=("HWCN", "HWIO", "NHWC"))
        if not self.s2d or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, k, (2, 2), ((3, 3), (3, 3)), dimension_numbers=dn)
        kp = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))   # 7→8, zeros FRONT
        k2 = kp.reshape(4, 2, 4, 2, c, self.features) \
               .transpose(0, 2, 1, 3, 4, 5) \
               .reshape(4, 4, 4 * c, self.features)
        x2 = x.reshape(n, h // 2, 2, w // 2, 2, c) \
              .transpose(0, 1, 3, 2, 4, 5) \
              .reshape(n, h // 2, w // 2, 4 * c)
        return jax.lax.conv_general_dilated(
            x2, k2, (1, 1), ((2, 1), (2, 1)), dimension_numbers=dn)


class ResNetC4(nn.Module):
    """Stages conv1..conv4 -> feature map at stride 16, 1024 channels.

    dtype: activation/compute dtype (bfloat16 halves the HBM traffic of
    every stage's activations; safe under frozen BN — VERDICT r1 #8).
    Params stay float32 (flax dtype semantics), so checkpoints/converters
    are unchanged.
    """
    blocks: Sequence[int] = (3, 4, 6)      # resnet50 conv2..conv4
    dtype: jnp.dtype | None = None
    stem_s2d: bool = False      # measured slower on this toolchain — see
                                # StemConv and config.DetectorConfig.stem_s2d
    stem_pad_ch: int = 0        # StemConv.pad_ch (exact zero-pad knob)
    stem_im2col: bool = False   # StemConv.im2col (patches+matmul form)
    stem_nminor: bool = False   # StemConv.nminor ([H,W,C,N] operand knob)

    @nn.compact
    def __call__(self, x):
        if self.dtype is not None:
            x = x.astype(self.dtype)
        # torch-symmetric padding (conv1 (3,3), pool (1,1)) — flax SAME is
        # asymmetric at stride 2, which shifts the grid under converted
        # torch weights (r2 review fix). name="Conv_0" keeps the param tree
        # identical to the old nn.Conv stem (checkpoints/converters).
        y = StemConv(64, s2d=self.stem_s2d, pad_ch=self.stem_pad_ch,
                     im2col=self.stem_im2col,
                     nminor=self.stem_nminor, dtype=self.dtype,
                     name="Conv_0")(x)
        y = FrozenBN(64, self.dtype)(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        for stage, n_blocks in enumerate(self.blocks):
            feats = 64 * (2 ** stage)
            for b in range(n_blocks):
                stride = 2 if (b == 0 and stage > 0) else 1
                y = Bottleneck(feats, stride, self.dtype)(y)
        return y                            # [B, H/16, W/16, 1024]


class ResNetC5Head(nn.Module):
    """conv5 block applied per-RoI after RoIAlign -> pooled 2048-d features."""
    blocks: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, rois):               # [N, 7, 7, 1024]
        y = rois
        if self.dtype is not None:
            y = y.astype(self.dtype)
        for b in range(self.blocks):
            y = Bottleneck(512, 2 if b == 0 else 1, self.dtype)(y)  # [N,4,4,2048]
        # global average pool as static per-plane adds: both jnp.mean forms
        # (over (1,2), or over a merged h*w axis) make XLA relayout the
        # conv output to minor-4 T(4,128) tiles (~113 us/step, 16% of the
        # inline config-5 step); summing the h*w static [N,C] slices fuses
        # into one pass over the conv layout with no relayout (an
        # optimization_barrier variant measured identical — the remaining
        # neighbor fusion is the C5 1x1 convs' roofline compute).
        n, h, w, c = y.shape
        # accumulate the pool in f32 even in bf16 mode (16-term sum; the
        # cast fuses into the last conv's epilogue, costing no extra pass)
        acc = y[:, 0, 0, :].astype(jnp.float32)
        for i in range(h):
            for j in range(w):
                if i or j:
                    acc = acc + y[:, i, j, :].astype(jnp.float32)
        return acc * (1.0 / (h * w))                        # -> [N, 2048] f32
