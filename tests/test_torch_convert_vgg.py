"""VGG16 backbone conversion parity (VERDICT r2 #4; SURVEY.md L136 "VGG16 or
ResNet-101 — VERIFY").

Torch-cpu is the oracle: a functional VGG16 forward with the SAME random
state dict must match the converted flax modules elementwise — backbone
(conv1_1..conv5_3, final pool dropped), fc6/fc7 RoI head (incl. the
(c,h,w)->(h,w,c) flatten permutation), and the full faster-rcnn.pytorch
vgg16-lineage dispatch.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from nafae_tpu.config import DetectorConfig
from nafae_tpu.models.detector.vgg import (VGG16_CONV_LAYERS, VGG16Features,
                                           VGG16RoIHead)

SCALES = (16, 32)
RATIOS = (0.5, 1.0, 2.0)


def make_vgg16_sd(rng):
    """torchvision-style vgg16 state dict (features convs + fc6/fc7)."""
    sd = {}
    cin = 3
    for li, cout in VGG16_CONV_LAYERS:
        sd[f"features.{li}.weight"] = (
            rng.randn(cout, cin, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{li}.bias"] = rng.randn(cout).astype(np.float32) * 0.1
        cin = cout
    sd["classifier.0.weight"] = (
        rng.randn(4096, 512 * 7 * 7).astype(np.float32) * 0.01)
    sd["classifier.0.bias"] = rng.randn(4096).astype(np.float32) * 0.1
    sd["classifier.3.weight"] = (
        rng.randn(4096, 4096).astype(np.float32) * 0.01)
    sd["classifier.3.bias"] = rng.randn(4096).astype(np.float32) * 0.1
    return sd


def torch_vgg_features(sd, x_nhwc):
    """Functional torch forward of vgg16.features[:-1] (stride 16)."""
    y = torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))
    for i, (li, _) in enumerate(VGG16_CONV_LAYERS):
        y = F.relu(F.conv2d(y, torch.from_numpy(sd[f"features.{li}.weight"]),
                            torch.from_numpy(sd[f"features.{li}.bias"]),
                            padding=1))
        if li in {2, 7, 14, 21}:    # last conv of blocks 1-4
            y = F.max_pool2d(y, 2, stride=2)
    return np.transpose(y.numpy(), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def converted():
    from nafae_tpu.models.detector.faster_rcnn import init_detector
    from nafae_tpu.utils.torch_convert import convert_detector_vgg16

    cfg = DetectorConfig(backbone="vgg16", image_size=64, num_proposals=4,
                         rpn_pre_nms_topk=16, anchor_scales=SCALES,
                         anchor_ratios=RATIOS, rpn_channels=512,
                         approx_topk=False)
    model, params = init_detector(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(13)
    sd = make_vgg16_sd(rng)
    out = convert_detector_vgg16(sd, params)
    return cfg, model, params, out, sd


def test_backbone_matches_torch_vgg16(converted):
    """Converted VGG16Features == functional torch vgg16.features[:-1],
    elementwise (stride-16, 512 channels, final pool dropped)."""
    cfg, model, params, out, sd = converted
    rng = np.random.RandomState(3)
    x = rng.rand(1, 32, 32, 3).astype(np.float32)
    ref = torch_vgg_features(sd, x)                 # [1, 2, 2, 512]
    got = np.asarray(VGG16Features().apply(
        {"params": out["params"]["backbone"]}, x))
    assert got.shape == ref.shape == (1, 2, 2, 512)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_roi_head_matches_torch_fc(converted):
    """fc6/fc7 head == torch classifier.0/.3 on the (c,h,w)-flattened crop —
    pins the flatten-order permutation in the converter."""
    cfg, model, params, out, sd = converted
    rng = np.random.RandomState(5)
    crop = rng.randn(3, 7, 7, 512).astype(np.float32) * 0.1

    tc = torch.from_numpy(np.transpose(crop, (0, 3, 1, 2)))  # NCHW
    y = tc.reshape(3, -1)                            # torch (c,h,w) flatten
    y = F.relu(F.linear(y, torch.from_numpy(sd["classifier.0.weight"]),
                        torch.from_numpy(sd["classifier.0.bias"])))
    y = F.relu(F.linear(y, torch.from_numpy(sd["classifier.3.weight"]),
                        torch.from_numpy(sd["classifier.3.bias"])))
    ref = y.numpy()

    got = np.asarray(VGG16RoIHead().apply(
        {"params": out["params"]["head"]}, crop))
    assert got.shape == ref.shape == (3, 4096)
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_converted_vgg_detector_runs(converted):
    """End-to-end: the converted VGG detector runs; proposals differ from
    random init (the weights are live) and feats are 4096-d."""
    cfg, model, params, out, sd = converted
    img = jnp.asarray(np.random.RandomState(11).rand(1, 64, 64, 3),
                      jnp.float32)
    o_init = jax.jit(model.apply)(params, img)
    o_conv = jax.jit(model.apply)(out, img)
    assert o_conv["feats"].shape == (1, 4, 4096)
    for k in ("boxes", "feats", "scores"):
        assert np.isfinite(np.asarray(o_conv[k])).all(), k
    assert not np.allclose(np.asarray(o_init["feats"]),
                           np.asarray(o_conv["feats"]))


def test_faster_rcnn_vgg_lineage_dispatch(tmp_path):
    """A faster-rcnn.pytorch vgg16 checkpoint (RCNN_base = features[:-1],
    RCNN_top = fc6/fc7, + RPN convs) routes through convert_faster_rcnn's
    vgg auto-detection; RPN weights land converted."""
    from nafae_tpu.models.detector.faster_rcnn import FasterRCNNExtractor
    from nafae_tpu.utils.torch_convert import load_detector_weights

    rng = np.random.RandomState(17)
    tv = make_vgg16_sd(rng)
    sd = {}
    for k, v in tv.items():
        if k.startswith("features."):
            sd["RCNN_base." + k[len("features."):]] = v
        else:                                        # classifier.{0,3}
            sd["RCNN_top." + k[len("classifier."):]] = v
    a = len(SCALES) * len(RATIOS)
    f32 = np.float32
    sd["RCNN_rpn.RPN_Conv.weight"] = (
        rng.randn(512, 512, 3, 3) * 0.03).astype(f32)
    sd["RCNN_rpn.RPN_Conv.bias"] = rng.randn(512).astype(f32)
    sd["RCNN_rpn.RPN_cls_score.weight"] = (
        rng.randn(2 * a, 512, 1, 1) * 0.1).astype(f32)
    sd["RCNN_rpn.RPN_cls_score.bias"] = rng.randn(2 * a).astype(f32)
    sd["RCNN_rpn.RPN_bbox_pred.weight"] = (
        rng.randn(4 * a, 512, 1, 1) * 0.1).astype(f32)
    sd["RCNN_rpn.RPN_bbox_pred.bias"] = (rng.randn(4 * a) * 0.1).astype(f32)

    cfg = DetectorConfig(backbone="vgg16", image_size=64, num_proposals=4,
                         rpn_pre_nms_topk=16, anchor_scales=SCALES,
                         anchor_ratios=RATIOS, rpn_channels=512)
    model = FasterRCNNExtractor(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        np.zeros((1, 64, 64, 3), np.float32))
    pth = str(tmp_path / "frcnn_vgg.pth")
    torch.save({"model": {k: torch.from_numpy(v) for k, v in sd.items()}},
               pth)
    out = load_detector_weights(pth, params, num_scales=len(SCALES),
                                num_ratios=len(RATIOS))
    np.testing.assert_allclose(
        np.asarray(out["params"]["rpn"]["Conv_0"]["kernel"]),
        np.transpose(sd["RCNN_rpn.RPN_Conv.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(out["params"]["backbone"]["Conv_0"]["kernel"]),
        np.transpose(sd["RCNN_base.0.weight"], (2, 3, 1, 0)))
    np.testing.assert_allclose(
        np.asarray(out["params"]["head"]["Dense_1"]["kernel"]),
        sd["RCNN_top.3.weight"].T)
    o = jax.jit(model.apply)(out, jnp.zeros((1, 64, 64, 3), jnp.float32))
    assert o["feats"].shape == (1, 4, 4096)


def test_lineage_params_mismatch_errors_clearly(tmp_path):
    """A vgg16-lineage checkpoint aimed at a resnet50 params tree (and vice
    versa) must fail with the detector.backbone fix in the message, not a
    bare KeyError — the repro script's DETECTOR_PTH path hits exactly this
    when the extract overrides are forgotten."""
    from nafae_tpu.models.detector.faster_rcnn import init_detector
    from nafae_tpu.utils.torch_convert import (convert_detector_resnet50,
                                               convert_detector_vgg16)

    rng = np.random.RandomState(23)
    vgg_sd = make_vgg16_sd(rng)
    resnet_cfg = DetectorConfig(image_size=64, num_proposals=4,
                                rpn_pre_nms_topk=16, anchor_scales=SCALES)
    _, resnet_params = init_detector(jax.random.PRNGKey(0), resnet_cfg)
    with pytest.raises(ValueError, match="detector.backbone=vgg16"):
        convert_detector_vgg16(vgg_sd, resnet_params)

    from tests.test_utils import make_resnet50_sd
    vgg_cfg = DetectorConfig(backbone="vgg16", image_size=64,
                             num_proposals=4, rpn_pre_nms_topk=16,
                             anchor_scales=SCALES, rpn_channels=512)
    _, vgg_params = init_detector(jax.random.PRNGKey(0), vgg_cfg)
    with pytest.raises(ValueError, match="detector.backbone=resnet50"):
        convert_detector_resnet50(make_resnet50_sd(rng), vgg_params)
