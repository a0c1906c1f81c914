"""One-way torch .pth -> nafae_tpu parameter converter (SURVEY.md L277).

Lets reference PyTorch checkpoints seed parity runs (BASELINE north star:
"same YouCook2 numbers from the same checkpointed features"). torch-cpu is
installed for exactly this purpose; no torch is used anywhere at runtime.

Key mapping (override with --map for other lineages):
  grounding model:
    word embedding  [V,E]   <- any of: emb.weight / word_emb / embedding.weight
    projection      [D,E]   <- vis_proj.weight (torch stores [E,D]; transposed)
    projection bias [E]     <- vis_proj.bias
"""

from __future__ import annotations

import json

import numpy as np

DEFAULT_MAP = {
    "word_emb": ["word_emb", "emb.weight", "embedding.weight",
                 "txt_emb.weight"],
    "w_v": ["w_v", "vis_proj.weight", "proj.weight", "visual_emb.weight"],
    "b_v": ["b_v", "vis_proj.bias", "proj.bias", "visual_emb.bias"],
}

# Optional [CHOICE]-variant params (docs/MATH.md steps 3/5): mapped when a
# source key is present, silently absent otherwise — a reference checkpoint
# that DID use a learned frame scorer or a bilinear metric converts without
# a custom --map, while plain embed+projection checkpoints stay minimal.
OPTIONAL_MAP = {
    "attn_w": ["attn_w", "frame_attn.weight", "attn.weight",
               "frame_scorer.weight"],
    "m_sim": ["m_sim", "bilinear.weight", "sim.weight", "M"],
}


def _to_numpy_dict(state_dict: dict) -> dict:
    """torch tensors (or arrays) -> host numpy arrays, one place to extend."""
    return {k: np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)
            for k, v in state_dict.items()}


def convert_state_dict(state_dict: dict, key_map: dict | None = None,
                       expect: dict | None = None) -> dict:
    """torch state_dict (tensors or arrays) -> {word_emb, w_v, b_v} numpy."""
    key_map = key_map or DEFAULT_MAP
    flat = _to_numpy_dict(state_dict)
    out = {}
    for ours, candidates in key_map.items():
        found = None
        for c in candidates:
            if c in flat:
                found = flat[c]
                break
        if found is None:
            raise KeyError(
                f"no source key for {ours!r}; tried {candidates}; "
                f"checkpoint has {sorted(flat)[:20]}...")
        if ours == "w_v" and found.ndim == 2 and c != "w_v":
            # torch Linear stores [out, in] = [E, D]; ours is [D, E].
            # Always transpose torch-named sources — a max(shape) heuristic
            # would silently pick the wrong orientation for square matrices.
            found = found.T
        out[ours] = found.astype(np.float32)
    for ours, candidates in OPTIONAL_MAP.items():
        for c in candidates:
            if c in flat:
                v = np.asarray(flat[c], np.float32)
                # a [1,E]/[E,1] torch Linear scorer weight -> our flat [E]
                out[ours] = v.reshape(-1) if ours == "attn_w" else v
                break
    if expect:
        for k, shape in expect.items():
            if tuple(out[k].shape) != tuple(shape):
                raise ValueError(f"{k}: shape {out[k].shape} != expected {shape}")
    return out


def convert_pth(pth_path: str, out_path: str | None = None,
                key_map: dict | None = None) -> dict:
    """Load a .pth file (weights_only) and convert; optionally save .npz."""
    import torch
    obj = torch.load(pth_path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    params = convert_state_dict(obj, key_map)
    if out_path:
        np.savez(out_path, **params)
    return params


def load_converted(npz_path: str) -> dict:
    import jax.numpy as jnp
    with np.load(npz_path) as z:
        return {k: jnp.asarray(z[k]) for k in z.files}


from nafae_tpu.models.detector.resnet import RESNET_BLOCKS  # noqa: E402

RESNET50_BLOCKS = RESNET_BLOCKS["resnet50"]    # conv2..conv4; conv5 (3) = head
RESNET101_BLOCKS = RESNET_BLOCKS["resnet101"]  # same split, 23-block conv4


def _resnet_blocks_of(flat: dict) -> tuple:
    """Infer the conv2..conv4 block counts from a torchvision-style state
    dict (resnet50 -> (3,4,6), resnet101 -> (3,4,23))."""
    blocks = []
    for stage in (1, 2, 3):
        n = 0
        while f"layer{stage}.{n}.conv1.weight" in flat:
            n += 1
        blocks.append(n)
    return tuple(blocks)


def convert_detector_resnet50(state_dict: dict, params: dict) -> dict:
    """Map a torchvision-style resnet50/resnet101 state_dict onto the
    detector params (depth auto-detected from the layer block counts).

    Covers the ResNetC4 backbone (conv1 + layer1-3) and the C5 RoI head
    (layer4); RPN/detection-head params are left as-is (they have no torch
    counterpart in a plain resnet checkpoint). Conv weights transpose
    [out,in,kh,kw] -> [kh,kw,in,out]; BN maps weight/bias/running_mean/
    running_var -> scale/bias/mean/var (FrozenBN). Returns a NEW params tree.
    """
    if "Bottleneck_0" not in params["params"].get("head", {}):
        # symmetric to the vgg16 guard: a resnet-lineage checkpoint aimed at
        # a vgg params tree must fail with the fix, not a KeyError
        raise ValueError(
            "checkpoint is the resnet lineage but the detector params "
            "tree is not — init the model with detector.backbone=resnet50 "
            "or resnet101 (and model.feat_dim=2048)")
    flat = _to_numpy_dict(state_dict)
    blocks = _resnet_blocks_of(flat)

    def conv(name):
        return np.transpose(flat[name + ".weight"], (2, 3, 1, 0))

    def bn(dst, name):
        dst["scale"] = flat[name + ".weight"].astype(np.float32)
        dst["bias"] = flat[name + ".bias"].astype(np.float32)
        dst["mean"] = flat[name + ".running_mean"].astype(np.float32)
        dst["var"] = flat[name + ".running_var"].astype(np.float32)

    out = jax.tree.map(np.array, params)   # np.array copies: a fresh tree
    bb = out["params"]["backbone"]
    n_total = sum(blocks)
    if (f"Bottleneck_{n_total - 1}" not in bb
            or f"Bottleneck_{n_total}" in bb):
        have = sum(1 for k in bb if k.startswith("Bottleneck_"))
        raise ValueError(
            f"checkpoint depth (blocks {blocks}, {n_total} bottlenecks) does "
            f"not match the detector params tree ({have} bottlenecks) — init "
            "the model with the matching detector.backbone "
            "(resnet50 = 13, resnet101 = 30)")
    bb["Conv_0"]["kernel"] = conv("conv1")
    bn(bb["FrozenBN_0"], "bn1")
    bi = 0
    for stage, n_blocks in enumerate(blocks, start=1):
        for b in range(n_blocks):
            src = f"layer{stage}.{b}"
            dst = bb[f"Bottleneck_{bi}"]
            _copy_bottleneck(dst, src, conv, bn, flat)
            bi += 1
    head = out["params"]["head"]
    for b in range(3):
        _copy_bottleneck(head[f"Bottleneck_{b}"], f"layer4.{b}", conv, bn,
                         flat)
    return jax.tree.map(jnp_asarray, out)


def _copy_bottleneck(dst, src, conv, bn, flat):
    for i in (0, 1, 2):
        dst[f"Conv_{i}"]["kernel"] = conv(f"{src}.conv{i + 1}")
        bn(dst[f"FrozenBN_{i}"], f"{src}.bn{i + 1}")
    if f"{src}.downsample.0.weight" in flat:
        dst["Conv_3"]["kernel"] = conv(f"{src}.downsample.0")
        bn(dst["FrozenBN_3"], f"{src}.downsample.1")


def convert_detector_vgg16(state_dict: dict, params: dict) -> dict:
    """Map a torchvision-style vgg16 state_dict onto the VGG detector params.

    Covers the VGG16Features backbone (features.{i} convs, the
    models/detector/vgg.py layer table) and the fc6/fc7 RoI head
    (classifier.0 / classifier.3). The fc6 weight flattens the 7x7x512 crop
    in torch (c,h,w) order while flax flattens (h,w,c) — the input axis is
    permuted so converted checkpoints are elementwise-equal (tested).
    RPN/detection-head params are left as-is. Returns a NEW params tree.
    """
    from nafae_tpu.models.detector.vgg import VGG16_CONV_LAYERS

    flat = _to_numpy_dict(state_dict)
    out = jax.tree.map(np.array, params)
    if "Dense_0" not in out["params"].get("head", {}):
        # the resnet head is Bottleneck_*, the vgg head is Dense_0/Dense_1 —
        # a lineage/params mismatch must not surface as a bare KeyError
        raise ValueError(
            "checkpoint is the vgg16 lineage but the detector params tree "
            "is not — init the model with detector.backbone=vgg16 (plus "
            "rpn_channels=512 and model.feat_dim=4096 for the fc7 features)")
    bb = out["params"]["backbone"]
    for i, (li, _) in enumerate(VGG16_CONV_LAYERS):
        src = f"features.{li}"
        bb[f"Conv_{i}"]["kernel"] = np.transpose(
            flat[src + ".weight"], (2, 3, 1, 0)).astype(np.float32)
        bb[f"Conv_{i}"]["bias"] = flat[src + ".bias"].astype(np.float32)
    head = out["params"]["head"]
    w6 = flat["classifier.0.weight"]                # [4096, 512*7*7] (c,h,w)
    w6 = (w6.reshape(4096, 512, 7, 7).transpose(0, 2, 3, 1)  # -> (h,w,c)
          .reshape(4096, -1).T)                     # -> [7*7*512, 4096]
    head["Dense_0"]["kernel"] = w6.astype(np.float32)
    head["Dense_0"]["bias"] = flat["classifier.0.bias"].astype(np.float32)
    head["Dense_1"]["kernel"] = flat["classifier.3.weight"].T.astype(
        np.float32)
    head["Dense_1"]["bias"] = flat["classifier.3.bias"].astype(np.float32)
    return jax.tree.map(jnp_asarray, out)


# faster-rcnn.pytorch lineage (SURVEY.md L136-139: the reference's external
# detector repo): RCNN_base wraps conv1+bn1+layer1-3, RCNN_top wraps layer4.
FASTER_RCNN_BASE_RENAMES = {
    "RCNN_base.0.": "conv1.",
    "RCNN_base.1.": "bn1.",
    "RCNN_base.4.": "layer1.",
    "RCNN_base.5.": "layer2.",
    "RCNN_base.6.": "layer3.",
    "RCNN_top.0.": "layer4.",
}


def anchor_permutation(num_scales: int, num_ratios: int) -> np.ndarray:
    """perm[a_ours] = source anchor index, mapping the faster-rcnn.pytorch
    ratio-major per-cell anchor order (a = ratio*nS + scale) onto ours
    (anchors.generate_anchors: scale-major, a = scale*nR + ratio)."""
    perm = np.empty(num_scales * num_ratios, np.int64)
    for s in range(num_scales):
        for r in range(num_ratios):
            perm[s * num_ratios + r] = r * num_scales + s
    return perm


def convert_faster_rcnn(state_dict: dict, params: dict,
                        num_scales: int = 5, num_ratios: int = 3,
                        bbox_stds=(0.1, 0.1, 0.2, 0.2),
                        bbox_means=(0.0, 0.0, 0.0, 0.0)) -> dict:
    """Full faster-rcnn.pytorch-lineage .pth -> detector params.

    Beyond the backbone/C5 of convert_detector_resnet50, maps:
      * RPN: RCNN_rpn.RPN_Conv (3x3) -> rpn/Conv_0; the 2A-channel
        bg/fg-softmax RPN_cls_score folds to our A-channel single-logit
        objectness as (fg - bg) per anchor — sigmoid(fg-bg) equals the
        source softmax fg probability exactly, so proposal *ranking* is
        bit-identical; RCNN_rpn.RPN_bbox_pred -> rpn/Conv_2. Per-cell
        anchor channels are permuted from the source's ratio-major order
        to our scale-major order (anchor_permutation).
      * Detection head (if the model has one): RCNN_cls_score -> det_head/
        cls, RCNN_bbox_pred -> det_head/reg with the lineage's
        BBOX_NORMALIZE stds/means folded into the weights (the torch code
        denormalizes predictions at test time; ours applies deltas raw).

    The RPN conv in this lineage is 512-wide: init the model with
    DetectorConfig(rpn_channels=512). Source anchors differ from ours only
    by integer rounding of the base boxes (sub-pixel).

    Backbone lineage is auto-detected: RCNN_base.0.weight shaped
    [64,3,3,3] (a 3x3 conv on RGB) is the vgg16 variant (RCNN_base =
    vgg.features[:-1], RCNN_top.{0,3} = fc6/fc7) — init the model with
    DetectorConfig(backbone="vgg16", rpn_channels=512).
    """
    flat = _normalize_sd(_to_numpy_dict(state_dict))
    if flat["RCNN_base.0.weight"].shape == (64, 3, 3, 3):      # vgg16 lineage
        tv = {}
        for k, v in flat.items():
            if k.startswith("RCNN_base."):
                tv["features." + k[len("RCNN_base."):]] = v
            elif k.startswith("RCNN_top."):                    # 0=fc6, 3=fc7
                tv["classifier." + k[len("RCNN_top."):]] = v
        out = convert_detector_vgg16(tv, params)
    else:
        tv = {}
        for k, v in flat.items():
            for src, dst in FASTER_RCNN_BASE_RENAMES.items():
                if k.startswith(src):
                    tv[dst + k[len(src):]] = v
                    break
        out = convert_detector_resnet50(tv, params)
    out = jax.tree.map(np.array, out)
    a = num_scales * num_ratios
    perm = anchor_permutation(num_scales, num_ratios)

    def conv_w(name):   # torch [out,in,kh,kw] -> flax [kh,kw,in,out]
        return np.transpose(flat[name + ".weight"], (2, 3, 1, 0))

    rpn = out["params"]["rpn"]
    rpn["Conv_0"]["kernel"] = conv_w("RCNN_rpn.RPN_Conv")
    rpn["Conv_0"]["bias"] = flat["RCNN_rpn.RPN_Conv.bias"].astype(np.float32)
    # cls: channels 0..A-1 are bg, A..2A-1 fg (the lineage's view(B,2,·,W))
    wc = conv_w("RCNN_rpn.RPN_cls_score")                   # [1,1,C,2A]
    bc = flat["RCNN_rpn.RPN_cls_score.bias"]
    rpn["Conv_1"]["kernel"] = (wc[..., a + perm] - wc[..., perm]).astype(
        np.float32)
    rpn["Conv_1"]["bias"] = (bc[a + perm] - bc[perm]).astype(np.float32)
    # bbox: 4A channels = A anchor-major groups of (dx,dy,dw,dh)
    wd = conv_w("RCNN_rpn.RPN_bbox_pred")                   # [1,1,C,4A]
    bd = flat["RCNN_rpn.RPN_bbox_pred.bias"]
    sh = wd.shape[:-1]
    wd = wd.reshape(*sh, a, 4)[..., perm, :].reshape(*sh, 4 * a)
    rpn["Conv_2"]["kernel"] = wd.astype(np.float32)
    rpn["Conv_2"]["bias"] = bd.reshape(a, 4)[perm].reshape(-1).astype(
        np.float32)

    det = out["params"].get("det_head")
    if det is not None and "RCNN_cls_score.weight" in flat:
        det["cls"]["kernel"] = flat["RCNN_cls_score.weight"].T.astype(
            np.float32)                                     # [2048, C+1]
        det["cls"]["bias"] = flat["RCNN_cls_score.bias"].astype(np.float32)
        wr = flat["RCNN_bbox_pred.weight"]                  # [(C+1)*4, 2048]
        br = flat["RCNN_bbox_pred.bias"]
        stds = np.tile(np.asarray(bbox_stds, np.float32), wr.shape[0] // 4)
        means = np.tile(np.asarray(bbox_means, np.float32), wr.shape[0] // 4)
        det["reg"]["kernel"] = (wr * stds[:, None]).T.astype(np.float32)
        det["reg"]["bias"] = (br * stds + means).astype(np.float32)
    return jax.tree.map(jnp_asarray, out)


def _normalize_sd(flat: dict) -> dict:
    """Strip DataParallel 'module.' prefixes."""
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in flat.items()}


def load_detector_weights(pth_path: str, params: dict,
                          num_scales: int = 5, num_ratios: int = 3) -> dict:
    """Load a detector .pth and dispatch on its lineage.

    faster-rcnn.pytorch checkpoints (RCNN_base.* keys, usually nested under
    'model') get the full conversion incl. RPN + detection head (resnet or
    vgg16 backbone, auto-detected); plain torchvision resnet50/vgg16 state
    dicts seed only the backbone + RoI head.
    """
    import torch
    obj = torch.load(pth_path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict):
        for nest in ("model", "state_dict"):
            if nest in obj and isinstance(obj[nest], dict):
                obj = obj[nest]
                break
    flat = _normalize_sd(_to_numpy_dict(obj))
    if any(k.startswith("RCNN_base.") for k in flat):
        return convert_faster_rcnn(flat, params, num_scales, num_ratios)
    if "features.0.weight" in flat:        # torchvision vgg16
        return convert_detector_vgg16(flat, params)
    return convert_detector_resnet50(flat, params)


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


import jax  # noqa: E402  (tree mapping in the detector converter)


def main(argv=None):
    import argparse
    p = argparse.ArgumentParser("nafae_tpu.utils.torch_convert")
    p.add_argument("pth")
    p.add_argument("out", help="output .npz")
    p.add_argument("--map", default=None, help="JSON key map override")
    args = p.parse_args(argv)
    key_map = json.loads(args.map) if args.map else None
    params = convert_pth(args.pth, args.out, key_map)
    print(json.dumps({k: list(v.shape) for k, v in params.items()}))


if __name__ == "__main__":
    main()
