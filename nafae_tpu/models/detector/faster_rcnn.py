"""Faster R-CNN RoI feature extractor (BASELINE config 5; SURVEY.md L136-139).

Frames -> ResNet-C4 features -> RPN proposals (top-k + TPU NMS) -> RoIAlign
-> C5 head -> R pooled 2048-d features + boxes per frame. The whole pipeline
is one jitted program per frame batch; features stay resident in HBM and feed
the grounding losses directly (SURVEY.md L205-213: the reference runs this
offline through an external CUDA repo and round-trips via disk).

No pretrained weights ship in this container; weights can be converted from a
torch checkpoint via nafae_tpu/utils/torch_convert.py. Architecture follows
the reference lineage (conv4 stride-16 features, conv5 RoI head -> 2048-d).
"""

from __future__ import annotations




import jax
import jax.numpy as jnp
from flax import linen as nn

from nafae_tpu.config import DetectorConfig
from nafae_tpu.models.detector.anchors import generate_anchors
from nafae_tpu.models.detector.resnet import ResNetC4, ResNetC5Head
from nafae_tpu.models.detector.rpn import RPNHead


class FasterRCNNExtractor(nn.Module):
    cfg: DetectorConfig
    use_pallas_roi_align: bool = False
    use_pallas_nms: bool = False
    with_detections: bool = False   # second-stage cls/reg outputs
    num_classes: int = 67

    def setup(self):
        dt = (None if self.cfg.dtype == "float32"
              else jnp.dtype(self.cfg.dtype))
        if self.cfg.backbone == "vgg16":
            # SURVEY.md L136 "VGG16 or ResNet-101 — VERIFY": the VGG lineage
            # is config-switchable (conv5_3 stride-16 features, fc6/fc7 RoI
            # head -> 4096-d; pair with model.feat_dim=4096)
            from nafae_tpu.models.detector.vgg import (VGG16Features,
                                                       VGG16RoIHead)
            self.backbone = VGG16Features(dtype=dt)
            self.head = VGG16RoIHead(dtype=dt)
        elif self.cfg.backbone in ("resnet50", "resnet101"):
            # resnet101 differs only in the conv4 block count (23 vs 6);
            # the C5 RoI head is identical (2048-d pooled features)
            from nafae_tpu.models.detector.resnet import RESNET_BLOCKS
            self.backbone = ResNetC4(blocks=RESNET_BLOCKS[self.cfg.backbone],
                                     dtype=dt, stem_s2d=self.cfg.stem_s2d,
                                     stem_pad_ch=self.cfg.stem_pad_ch,
                                     stem_im2col=self.cfg.stem_im2col,
                                     stem_nminor=self.cfg.stem_nminor)
            self.head = ResNetC5Head(dtype=dt)
        else:
            raise ValueError(
                f"unknown detector.backbone {self.cfg.backbone!r}; "
                "resnet50 | resnet101 | vgg16")
        a = len(self.cfg.anchor_scales) * len(self.cfg.anchor_ratios)
        self.rpn = RPNHead(num_anchors=a, channels=self.cfg.rpn_channels,
                           dtype=dt)
        if self.with_detections:
            from nafae_tpu.models.detector.heads import DetectionHead
            self.det_head = DetectionHead(self.num_classes)

    def __call__(self, images: jax.Array) -> dict:
        """images [B,H,W,3] (float, 0..1, H=W=cfg.image_size) ->
        {boxes [B,R,4], feats [B,R,2048], scores [B,R]}."""
        cfg = self.cfg
        stride = 16
        feat = self.backbone(images)                         # [B,h,w,1024]
        b, fh, fw, _ = feat.shape
        anchors = jnp.asarray(generate_anchors(
            fh, fw, stride, cfg.anchor_scales, cfg.anchor_ratios))
        # full-pool mode takes grid-layout deltas (raw=True) so the plane
        # path never materializes [B,N,4] (see rpn.select_proposals_batched)
        obj, deltas = self.rpn(feat, raw=cfg.full_pool_nms)  # [B,N], [B,N,4]
        deltas_raw = None
        if cfg.full_pool_nms:
            deltas, deltas_raw = None, deltas

        from nafae_tpu.models.detector.rpn import select_proposals_batched
        pallas_nms = (self.use_pallas_nms or cfg.nms_impl == "pallas"
                      or (cfg.nms_impl == "auto"
                          and jax.default_backend() == "tpu"))
        boxes, scores, keep_valid = select_proposals_batched(
            obj, deltas, anchors, cfg.image_size, cfg.rpn_pre_nms_topk,
            cfg.num_proposals, cfg.nms_iou_thresh,
            nms_impl="pallas" if pallas_nms else "jnp",
            topk_impl=("none" if cfg.full_pool_nms
                       else "window" if cfg.topk_window > 1
                       else "approx" if cfg.approx_topk else "exact"),
            topk_window=cfg.topk_window, deltas_raw=deltas_raw)

        roi_impl = "pallas" if self.use_pallas_roi_align else cfg.roi_impl
        if roi_impl == "pallas":
            from nafae_tpu.ops.pallas.roi_align import roi_align_pallas
            roi_fn = roi_align_pallas
        elif roi_impl == "combined":
            # one-dot form: no [N,P,W,C] HBM intermediate (ops/roi_align.py)
            from nafae_tpu.ops.roi_align import roi_align_combined
            roi_fn = roi_align_combined
        else:
            # MXU-native separable-matmul RoIAlign (ops/roi_align.py)
            from nafae_tpu.ops.roi_align import roi_align_matmul
            roi_fn = roi_align_matmul
        pooled = jax.vmap(
            lambda f, bx: roi_fn(f, bx, out_size=7,
                                 spatial_scale=1.0 / stride)
        )(feat, boxes)                                       # [B,R,7,7,1024]

        r = cfg.num_proposals
        roi_feats = self.head(pooled.reshape(b * r, 7, 7, pooled.shape[-1]))
        out = {
            "boxes": boxes,
            "scores": scores,
            "feats": roi_feats.reshape(b, r, -1),            # [B,R,2048]
            "region_valid": keep_valid,                      # [B,R] NMS survivors
        }
        if self.with_detections:
            from nafae_tpu.models.detector.heads import decode_detections
            logits, deltas = self.det_head(roi_feats)
            det = jax.vmap(lambda bx, lo, de: decode_detections(
                bx, lo, de, cfg.image_size))(
                boxes, logits.reshape(b, r, -1),
                deltas.reshape(b, r, *deltas.shape[1:]))
            out["det_boxes"] = det["boxes"]
            out["det_scores"] = det["scores"]
            out["det_classes"] = det["classes"]
        return out


def init_detector(key: jax.Array, cfg: DetectorConfig,
                  use_pallas_roi_align: bool = False, **kwargs):
    """Returns (module, params) initialized on a dummy frame batch.

    **kwargs forward to FasterRCNNExtractor (with_detections, num_classes,
    use_pallas_nms, ...) — initializing with a narrower module than the one
    applied later would leave its params (e.g. det_head) uncreated and fail
    at apply time with an opaque flax missing-parameter error.
    """
    model = FasterRCNNExtractor(cfg, use_pallas_roi_align, **kwargs)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    params = model.init(key, dummy)
    if cfg.fold_bn:
        # load-time BN fold (idempotent — call sites that replace these
        # params with converted checkpoint weights re-apply it after load)
        from nafae_tpu.models.detector.resnet import fold_frozen_bn
        params = fold_frozen_bn(params)
    return model, params
