"""Parsers for the official YouCook2 / YouCook2-BoundingBox annotation files.

Bridges a reference user's data to this pipeline (SURVEY.md L97/L131: the
reference parses segment annotations + the 67-class vocabulary):

* youcookii_annotations_trainval.json (YouCook2 release):
    {"database": {video_id: {"duration": float, "subset": "training"|...,
        "annotations": [{"id": int, "segment": [start,end], "sentence": str}]}}}
  -> extract-CLI segment dicts (nafae_tpu.extract).

* yc2_bb annotations (YouCook2-BoundingBox release, val/test only):
    {"database": {video_id: {"rwidth": int, "rheight": int,
        "segments": {seg_id: {"objects": [{"label": str,
            "boxes": [{"x1","y1","x2","y2","outside","occluded"} per frame]}]}}}}}
  -> per-segment GT tensors merged into extracted .npz feature files.

* RoboWatch transfer annotations (NAFAE authors' release, SURVEY.md L132):
  box annotations over RoboWatch videos for cross-dataset transfer eval
  (BASELINE config 5). Parsed leniently: both the YC2-BB-style "database"
  wrapper and a bare {video: ...} mapping are accepted, and a video without
  a "segments" dict is treated as one whole-video segment.

The reference mount was empty at build time (SURVEY provenance warning), so
these schemas are reconstructed from the public releases' documentation;
parsers are lenient (missing keys skip rather than crash) and fully covered
by schema-fixture tests.
"""

from __future__ import annotations

import json
import os

import numpy as np

from nafae_tpu.data.vocab import Vocab

_SUBSET_TO_SPLIT = {"training": "train", "validation": "val", "testing": "test"}


def segments_from_youcook2(ann_path: str, video_dir: str,
                           ext: str = ".mp4",
                           subset: str | None = None) -> list[dict]:
    """YouCook2 annotations -> extract-CLI segment list."""
    with open(ann_path) as f:
        db = json.load(f)["database"]
    out = []
    for vid, meta in sorted(db.items()):
        split = _SUBSET_TO_SPLIT.get(meta.get("subset", ""), "train")
        if subset and split != subset:
            continue
        video = os.path.join(video_dir, vid + ext)
        for ann in meta.get("annotations", []):
            seg = ann.get("segment", [None, None])
            out.append({
                "id": f"{vid}_{ann.get('id', len(out))}",
                "video": video,
                "sentence": ann.get("sentence", ""),
                "split": split,
                "start": seg[0],
                "end": seg[1],
            })
    return out


def gt_from_youcook2bb(bb_path: str, vocab: Vocab | None = None,
                       max_words: int = 8, max_frames: int = 20) -> dict:
    """YouCook2-BB annotations -> {segment_id: {gt_boxes, gt_mask, word_ids}}.

    gt_boxes [K, T, 4] xyxy NORMALIZED to [0,1] via the release's annotation
    resolution (per-video rwidth/rheight) when present — predicted boxes live
    in the detector's square image_size space, so the two coordinate systems
    must be reconciled before IoU (merge_gt_into_features rescales by the
    extraction image size). Without rwidth/rheight the raw coordinates are
    kept and "normalized" is False. gt_mask [K, T] = 1 where the object is
    visible (not outside) and a box exists; word_ids [K] from the 67-class
    vocab (unknown labels skipped). Multiple instances of one class occupy
    separate K slots (per-annotation-track protocol).
    """
    vocab = vocab or Vocab()
    with open(bb_path) as f:
        db = json.load(f)["database"]
    out = {}
    for vid, meta in sorted(db.items()):
        scale = _resolution_scale(meta)
        for seg_id, seg in sorted(meta.get("segments", {}).items()):
            g = _objects_gt(seg.get("objects", []), vocab, max_words,
                            max_frames, scale)
            if g is not None:
                out[f"{vid}_{seg_id}"] = g
    return out


def _resolution_scale(meta: dict) -> np.ndarray | None:
    """Per-video [w,h,w,h] normalizer from the annotation resolution."""
    rw = float(meta.get("rwidth", 0) or 0)
    rh = float(meta.get("rheight", 0) or 0)
    return (np.asarray([rw, rh, rw, rh], np.float32)
            if rw > 0 and rh > 0 else None)


def _objects_gt(objects: list, vocab: Vocab, max_words: int, max_frames: int,
                scale: np.ndarray | None) -> dict | None:
    """Object tracks -> {gt_boxes, gt_mask, word_ids, normalized} or None.

    Shared by the YC2-BB and RoboWatch parsers (identical per-track layout).
    Boxes may be {'x1','y1','x2','y2','outside'} dicts or bare
    [x1,y1,x2,y2(,outside)] lists (lenient across release variants).
    """
    gt_boxes = np.zeros((max_words, max_frames, 4), np.float32)
    gt_mask = np.zeros((max_words, max_frames), np.float32)
    word_ids = []
    for obj in objects:
        cls = vocab.lookup(str(obj.get("label", "")))
        if cls is None or len(word_ids) >= max_words:
            continue
        k = len(word_ids)
        word_ids.append(cls)
        for t, box in enumerate(obj.get("boxes", [])[:max_frames]):
            coords = _box_coords(box)
            if coords is None:
                continue
            gt_boxes[k, t] = coords
            gt_mask[k, t] = 1.0
    if not word_ids:
        return None
    if scale is not None:
        gt_boxes = gt_boxes / scale
    return {"gt_boxes": gt_boxes, "gt_mask": gt_mask,
            "word_ids": np.asarray(word_ids, np.int32),
            "normalized": scale is not None}


def _box_coords(box) -> tuple | None:
    """One per-frame box entry -> (x1,y1,x2,y2) or None (absent/outside)."""
    if not box:
        return None
    if isinstance(box, dict):
        if box.get("outside", 0):
            return None
        coords = (box.get("x1"), box.get("y1"), box.get("x2"), box.get("y2"))
    elif isinstance(box, (list, tuple)) and len(box) >= 4:
        if len(box) >= 5 and box[4]:          # trailing outside flag
            return None
        coords = tuple(box[:4])
    else:
        return None
    return None if None in coords else coords


def segments_from_robowatch(ann_path: str, video_dir: str,
                            ext: str = ".mp4") -> list[dict]:
    """RoboWatch transfer annotations -> extract-CLI segment list (eval-only).

    SURVEY.md L132: the NAFAE authors annotated a RoboWatch subset with boxes
    for cross-dataset transfer (BASELINE config 5). Schema handled leniently
    (the release itself was unavailable at build time): an optional
    "database" wrapper, per-video optional "segments" (otherwise the whole
    video is one segment), optional "segment"/"sentence" keys. Without a
    sentence the object labels are joined so word extraction still yields
    the annotated classes. All segments land in the "val" split.
    """
    with open(ann_path) as f:
        raw = json.load(f)
    db = raw.get("database", raw)
    out = []
    for vid, meta in sorted(db.items()):
        segments = meta.get("segments") or {"0": meta}
        if not isinstance(segments, dict):   # e.g. a list release variant
            segments = {str(i): s for i, s in enumerate(segments)}
        for seg_id, seg in sorted(segments.items()):
            # `or` (not a .get default): a present-but-null "segment" must
            # also fall back, per the lenient-parsing contract
            span = seg.get("segment") or [None, None]
            sentence = seg.get("sentence") or " ".join(
                str(o.get("label", "")) for o in seg.get("objects") or [])
            out.append({
                "id": f"{vid}_{seg_id}",
                "video": os.path.join(video_dir, vid + ext),
                "sentence": sentence,
                "split": "val",
                "start": span[0],
                "end": span[1],
            })
    return out


def gt_from_robowatch(ann_path: str, vocab: Vocab | None = None,
                      max_words: int = 8, max_frames: int = 20) -> dict:
    """RoboWatch transfer annotations -> GT dict (gt_from_youcook2bb contract).

    Same per-track tensor layout as YC2-BB; accepts the "database" wrapper or
    a bare mapping, per-video "segments" or a flat whole-video object list,
    and dict- or list-form boxes. Merge with merge_gt_into_features.
    """
    vocab = vocab or Vocab()
    with open(ann_path) as f:
        raw = json.load(f)
    db = raw.get("database", raw)
    out = {}
    for vid, meta in sorted(db.items()):
        scale = _resolution_scale(meta)
        segments = meta.get("segments") or {"0": meta}
        for seg_id, seg in sorted(segments.items()):
            g = _objects_gt(seg.get("objects", []), vocab, max_words,
                            max_frames, scale)
            if g is not None:
                out[f"{vid}_{seg_id}"] = g
    return out


def merge_gt_into_features(feature_dir: str, gt: dict,
                           image_size: int | None = None) -> int:
    """Write GT tensors into extracted .npz segment files (in place).

    Matches by segment id; also overwrites word_ids with the BB labels so
    eval classes == annotation classes. Normalized GT boxes (see
    gt_from_youcook2bb) require image_size — the extraction frame size — to
    rescale into the prediction coordinate space (the extract CLI passes
    cfg.detector.image_size). Returns #segments updated. The index.jsonl is
    untouched (same files, new keys)."""
    index_path = os.path.join(feature_dir, "index.jsonl")
    with open(index_path) as f:
        index = [json.loads(ln) for ln in f if ln.strip()]
    updated = 0
    for meta in index:
        g = gt.get(meta["id"])
        if g is None:
            continue
        path = os.path.join(feature_dir, meta["file"])
        with np.load(path) as z:
            data = {k: z[k] for k in z.files}
        t = data["feats"].shape[0]
        k = len(g["word_ids"])
        boxes = g["gt_boxes"][:k]
        if g.get("normalized"):
            if not image_size:
                # inferring the frame size from predicted-box extents is
                # silently wrong (zero/under-reach collapses or shrinks GT)
                raise ValueError(
                    "merge_gt_into_features: GT boxes are normalized "
                    "(annotation rwidth/rheight present) — pass image_size "
                    "(the extraction detector.image_size)")
            boxes = boxes * float(image_size)
        data["word_ids"] = g["word_ids"]
        data["gt_boxes"] = _fit(boxes, (k, t, 4))
        data["gt_mask"] = _fit(g["gt_mask"][:k], (k, t))
        np.savez(path, **data)
        updated += 1
    return updated


def _fit(arr: np.ndarray, shape: tuple) -> np.ndarray:
    """Crop/zero-pad arr to `shape`."""
    out = np.zeros(shape, arr.dtype)
    sl = tuple(slice(0, min(a, b)) for a, b in zip(arr.shape, shape))
    out[sl] = arr[sl]
    return out
