"""Feature extraction: video -> sampled frames -> Faster R-CNN RoI features.

Replaces the reference's offline `tools/extract_*.py` + external CUDA
detector (SURVEY.md L205-213). Two modes:

* CLI (this file): decode each annotated segment (native C++ OpenCV workers,
  Python fallback), run the jitted detector, write per-segment .npz + an
  index.jsonl consumable by SegmentDataset — i.e. produce the exact on-disk
  layout the training/eval pipelines read.
* Inline (extract_frames_fn): returns a jitted frames->features function for
  the end-to-end config-5 path where features never leave HBM.

Annotations: segments.jsonl, one JSON per line:
  {"id": ..., "video": <path>, "sentence": ..., "split": ...,
   "start": <sec, optional>, "end": <sec, optional>}

Detector weights are random-initialized unless --ckpt provides converted
torch weights (utils/torch_convert.py); the pipeline structure is identical.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax
import jax.numpy as jnp

from nafae_tpu.config import Config
from nafae_tpu.data.vocab import Vocab


def decode_segment(video_path: str, frame_rate: float, max_frames: int,
                   image_size: int, start: float = 0.0,
                   end: float = -1.0) -> np.ndarray:
    """[n, S, S, 3] float32 RGB frames; native decoder with cv2 fallback.

    start/end (seconds) trim to the annotated segment — YouCook2-style
    videos hold many segments each (end <= 0 reads to EOF)."""
    try:
        from nafae_tpu.utils.native_io import decode_video, load_library
        load_library()   # the module import always succeeds (pure Python);
        #                  the build/dlopen fails at CALL time — probe it
        #                  here so "toolchain unavailable" actually reaches
        #                  the cv2 fallback instead of crashing below
    except Exception:
        decode_video = None   # native lib absent/misbuilt -> cv2 fallback
    if decode_video is not None:
        # a real decode error must propagate: silently mixing decoders
        # inside one dataset would break frame-selection reproducibility
        return decode_video(video_path, frame_rate, max_frames, image_size,
                            start=start, end=end)
    import cv2
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        raise IOError(f"cannot open {video_path}")
    # degenerate-rate clamps MUST match the native decoder
    # (nafae_native.cpp decode_video_seg) or the two backends select
    # different frames for the same annotation: fps <= 1e-3 -> 25.0 (not
    # just falsy-0), sample_fps <= 0 -> 1.0
    fps = cap.get(cv2.CAP_PROP_FPS)
    if not fps or fps <= 1e-3:
        fps = 25.0
    # int(x + 0.5) matches the native decoder's static_cast<long>(x + 0.5)
    # (Python round() is banker's rounding — would pick a different frame at
    # exact .5 boundaries and break native/fallback reproducibility)
    first = int(start * fps + 0.5)
    if first > 0:
        cap.set(cv2.CAP_PROP_POS_FRAMES, first)
    last = int(end * fps + 0.5) if end > 0 else -1
    step = fps / (frame_rate if frame_rate > 0 else 1.0)
    frames, nxt, i = [], 0.0, 0
    while len(frames) < max_frames:
        if last >= 0 and first + i > last:
            break
        ok = cap.grab()
        if not ok:
            break
        if i + 1e-9 >= nxt:
            nxt += step
            ok, frame = cap.retrieve()
            if ok:
                frame = cv2.resize(frame, (image_size, image_size))
                frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB)
                              .astype(np.float32) / 255.0)
        i += 1
    cap.release()
    return np.stack(frames) if frames else np.zeros(
        (0, image_size, image_size, 3), np.float32)


def make_extract_fn(cfg: Config, params=None, key=None):
    """Returns (jitted frames->{boxes,feats,scores} fn, detector params).

    With cfg.detector.weights set (and no explicit params), the detector is
    seeded from the converted torch checkpoint — full RPN + heads for
    faster-rcnn.pytorch-lineage files, backbone/C5 for plain resnet50
    (utils/torch_convert.load_detector_weights)."""
    from nafae_tpu.models.detector.faster_rcnn import init_detector
    model, init_p = init_detector(key or jax.random.PRNGKey(0), cfg.detector)
    if params is None and cfg.detector.weights:
        from nafae_tpu.utils.torch_convert import load_detector_weights
        params = load_detector_weights(
            cfg.detector.weights, init_p,
            num_scales=len(cfg.detector.anchor_scales),
            num_ratios=len(cfg.detector.anchor_ratios))
        if cfg.detector.fold_bn:
            from nafae_tpu.models.detector.resnet import fold_frozen_bn
            params = fold_frozen_bn(params)
    params = params if params is not None else init_p
    fn = jax.jit(model.apply)
    return fn, params


def quantize_feats_np(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """numpy twin of ops/grounding.quantize_feats_int8 for extract-time
    storage: feats [T,R,D] -> (int8 [T,R,D], per-region scales f32 [T,R]).
    Same per-row symmetric scheme (s = max|f| / 127); np.round and
    jnp.round are both round-half-to-even, so the two quantizers agree
    bitwise on the same input."""
    f = feats.astype(np.float32)
    sf = np.maximum(np.abs(f).max(axis=-1), 1e-12) / 127.0      # [T,R]
    q = np.clip(np.round(f / sf[..., None]), -127, 127).astype(np.int8)
    return q, sf.astype(np.float32)


def extract_segments(cfg: Config, annotations: list[dict], out_dir: str,
                     params=None, vocab: Vocab | None = None,
                     frame_batch: int = 8, quantize: str = "") -> str:
    """Run the full extraction pipeline; returns the index.jsonl path.

    quantize="int8": store features as int8 + per-region scales (¼ the
    bytes on disk AND the wire format of the int8pre serving path —
    docs/PERF.md "r5 inference work"). SegmentDataset dequantizes by
    default, so the same extraction still serves f32 train/eval."""
    if quantize not in ("", "int8"):
        raise ValueError(f"quantize must be '' or 'int8', got {quantize!r}")
    from nafae_tpu.data.vocab import vocab_from_config
    vocab = vocab or vocab_from_config(cfg.data)
    os.makedirs(out_dir, exist_ok=True)
    fn, params = make_extract_fn(cfg, params)
    dc = cfg.detector
    index_path = os.path.join(out_dir, "index.jsonl")
    with open(index_path, "w") as idx:
        for ann in annotations:
            frames = decode_segment(ann["video"], dc.frame_rate,
                                    cfg.data.max_frames, dc.image_size,
                                    start=float(ann.get("start") or 0.0),
                                    end=float(ann.get("end") or -1.0))
            t = frames.shape[0]
            if t == 0:
                continue
            boxes, feats, rvalid = [], [], []
            for lo in range(0, t, frame_batch):
                real = min(frame_batch, t - lo)
                chunk = frames[lo:lo + real]
                if real < frame_batch:
                    chunk = np.concatenate(
                        [chunk, np.zeros((frame_batch - real,)
                                         + chunk.shape[1:], np.float32)])
                out = fn(params, jnp.asarray(chunk))
                boxes.append(np.asarray(out["boxes"])[:real])
                feats.append(np.asarray(out["feats"])[:real])
                rvalid.append(np.asarray(out["region_valid"])[:real])
            word_ids = np.asarray(
                vocab.extract(ann["sentence"], cfg.data.max_words),
                np.int32)
            name = str(ann["id"])
            arrays = {
                "boxes": np.concatenate(boxes).astype(np.float32),
                "region_mask": np.concatenate(rvalid).astype(np.float32),
                "word_ids": word_ids,
            }
            if quantize == "int8":
                q, sf = quantize_feats_np(np.concatenate(feats))
                arrays["feats"], arrays["feats_scale"] = q, sf
            else:
                arrays["feats"] = np.concatenate(feats).astype(np.float16)
            np.savez(os.path.join(out_dir, name + ".npz"), **arrays)
            idx.write(json.dumps({
                "id": name, "file": name + ".npz", "num_frames": t,
                "num_words": int(word_ids.size),
                "split": ann.get("split", "train"),
            }) + "\n")
    return index_path


def main(argv=None):
    import argparse

    from nafae_tpu.config import load_config

    p = argparse.ArgumentParser("nafae_tpu.extract")
    p.add_argument("--preset", default="config5")
    p.add_argument("--config", default=None)
    p.add_argument("--override", nargs="*", action="extend",
                   default=None)   # repeated flags ACCUMULATE: the
                                   # config scripts pass their own
                                   # --override before the user's

    p.add_argument("--annotations",
                   help="segments.jsonl (id, video, sentence, split)")
    p.add_argument("--youcook2-json",
                   help="official youcookii_annotations_trainval.json")
    p.add_argument("--video-dir", default=".",
                   help="video directory for --youcook2-json")
    p.add_argument("--video-ext", default=".mp4",
                   help="video filename extension for --youcook2-json/"
                        "--robowatch-json (the release ids carry none)")
    p.add_argument("--subset", default=None,
                   help="train|val|test filter for --youcook2-json")
    p.add_argument("--yc2bb-json",
                   help="YouCook2-BB box annotations: merge GT into --out "
                        "after extraction (enables eval)")
    p.add_argument("--robowatch-json",
                   help="authors' RoboWatch transfer annotations: derive the "
                        "segment list (if --annotations/--youcook2-json "
                        "absent) AND merge GT into --out after extraction "
                        "(BASELINE config 5 transfer eval)")
    p.add_argument("--ckpt", default=None,
                   help="torch detector .pth to convert and load "
                        "(faster-rcnn.pytorch lineage or torchvision "
                        "resnet50; shorthand for detector.weights)")
    p.add_argument("--quantize", default="", choices=["", "int8"],
                   help="int8: store features quantized (int8 + per-region "
                        "scales, ¼ the bytes; the int8pre serving format — "
                        "SegmentDataset dequantizes by default so train/f32 "
                        "eval read the same files)")
    p.add_argument("--strict", action="store_true",
                   help="annotation parsers raise SchemaError on unknown/"
                        "missing fields instead of skipping (run official "
                        "files through this once to surface schema drift)")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)
    from nafae_tpu.utils import cli_startup
    cli_startup()
    cfg = load_config(args.config, args.preset, args.override or [])
    if args.ckpt:
        cfg.detector.weights = args.ckpt
    if args.youcook2_json:
        from nafae_tpu.data.annotations import segments_from_youcook2
        anns = segments_from_youcook2(args.youcook2_json, args.video_dir,
                                      ext=args.video_ext,
                                      subset=args.subset,
                                      strict=args.strict)
    elif args.annotations:
        with open(args.annotations) as f:
            anns = [json.loads(ln) for ln in f if ln.strip()]
    elif args.robowatch_json:
        from nafae_tpu.data.annotations import segments_from_robowatch
        anns = segments_from_robowatch(args.robowatch_json, args.video_dir,
                                       ext=args.video_ext,
                                       strict=args.strict)
    else:
        p.error("one of --annotations / --youcook2-json / --robowatch-json "
                "is required")
    index = extract_segments(cfg, anns, args.out, quantize=args.quantize)
    result = {"index": index, "segments": len(anns)}
    gt = None
    from nafae_tpu.data.vocab import vocab_from_config
    vocab = vocab_from_config(cfg.data)
    if args.yc2bb_json:
        from nafae_tpu.data.annotations import gt_from_youcook2bb
        gt = gt_from_youcook2bb(args.yc2bb_json, vocab=vocab,
                                max_words=cfg.data.max_words,
                                max_frames=cfg.data.max_frames,
                                strict=args.strict)
    elif args.robowatch_json:
        from nafae_tpu.data.annotations import gt_from_robowatch
        gt = gt_from_robowatch(args.robowatch_json, vocab=vocab,
                               max_words=cfg.data.max_words,
                               max_frames=cfg.data.max_frames,
                               strict=args.strict)
    if gt is not None:
        from nafae_tpu.data.annotations import merge_gt_into_features
        result["gt_merged"] = merge_gt_into_features(
            args.out, gt, image_size=cfg.detector.image_size)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
