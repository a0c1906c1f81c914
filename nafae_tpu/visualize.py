"""Grounding visualization: render the argmax-similarity region per word.

The reference lineage ships demo scripts that draw each query word's
predicted box on the sampled frames (the qualitative figures in the NAFAE
paper come from exactly the eval argmax path, SURVEY.md L190-199). This is
the rebuild's equivalent:

  python -m nafae_tpu visualize --preset config1 \
      --override data.root=feats train.ckpt_dir=ckpt --out viz/

* always writes `viz/predictions.jsonl` — one record per (segment, word,
  frame): predicted box + similarity score (+ GT box / IoU / hit when the
  dataset has GT);
* renders annotated JPEGs per frame. Without video access the boxes are
  drawn on a neutral canvas (the feature files carry no pixels); pass
  --annotations segments.jsonl (the extract-CLI input, id -> video path)
  to draw onto the real decoded frames.

Green box = hit (IoU > thresh), red = miss, white = no GT; thin gray = GT.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from nafae_tpu.config import Config
from nafae_tpu.ops import grounding as G

_COLORS = {"hit": (80, 200, 80), "miss": (60, 60, 230), "nogt": (255, 255, 255)}


def _iou_np(a, b) -> float:
    """Host-side scalar IoU, same semantics as ops.iou.box_iou (xyxy,
    degenerate boxes -> 0). Numpy on purpose: one jnp call per JSONL record
    costs 3-12 ms of device dispatch each on the tunneled TPU backend."""
    lt = np.maximum(a[:2], b[:2])
    rb = np.minimum(a[2:], b[2:])
    wh = np.clip(rb - lt, 0.0, None)
    inter = float(wh[0] * wh[1])
    area_a = max(a[2] - a[0], 0.0) * max(a[3] - a[1], 0.0)
    area_b = max(b[2] - b[0], 0.0) * max(b[3] - b[1], 0.0)
    union = float(area_a + area_b - inter)
    return inter / max(union, 1e-12) if union > 0 else 0.0


def predict_segment(params: dict, sample: dict) -> dict:
    """Argmax-region predictions for one padded sample (the eval path's
    argmax, SURVEY.md L196-197). Returns arrays keyed r_star/score [K,T]."""
    w_emb = G.embed_words(jnp.asarray(sample["word_ids"][None]),
                          params["word_emb"], m_sim=params.get("m_sim"))
    v_emb = G.project_regions(jnp.asarray(sample["feats"][None],
                                          jnp.float32),
                              params["w_v"], params["b_v"])
    s = G.mask_regions(G.similarity_tensor(w_emb, v_emb),
                       jnp.asarray(sample["region_mask"][None])
                       if "region_mask" in sample else None)[0]  # [K,T,R]
    r_star = jnp.argmax(s, axis=-1)                              # [K,T]
    score = jnp.max(s, axis=-1)
    return {"r_star": np.asarray(r_star), "score": np.asarray(score)}


def segment_records(sample: dict, pred: dict, vocab, seg_id: str,
                    iou_thresh: float = 0.5) -> list[dict]:
    """Flatten one segment's predictions into JSONL records."""
    recs = []
    word_ids = sample["word_ids"]
    wm = sample["word_mask"]
    fm = sample["frame_mask"]
    boxes = sample["boxes"]                                      # [T,R,4]
    has_gt = "gt_boxes" in sample
    for k, wid in enumerate(word_ids):
        if wm[k] == 0:
            continue
        rm = sample.get("region_mask")
        for t in range(len(fm)):
            if fm[t] == 0:
                continue
            if rm is not None and not np.any(rm[t] > 0):
                # frame kept zero proposals: the argmax over all-NEG scores
                # would emit a degenerate region-0 [0,0,0,0] box at -1e9
                continue
            r = int(pred["r_star"][k, t])
            rec = {
                "segment": seg_id,
                "word": vocab.classes[int(wid)],
                "frame": t,
                "region": r,
                "box": [round(float(x), 2) for x in boxes[t, r]],
                "score": round(float(pred["score"][k, t]), 4),
            }
            if has_gt and sample["gt_mask"][k, t] > 0:
                gt = sample["gt_boxes"][k, t]
                i = _iou_np(boxes[t, r], gt)
                rec.update(gt_box=[round(float(x), 2) for x in gt],
                           iou=round(i, 4), hit=bool(i > iou_thresh))
            recs.append(rec)
    return recs


def render_frame(canvas: np.ndarray, frame_recs: list[dict]) -> np.ndarray:
    """Draw one frame's records onto an HxWx3 uint8 BGR canvas."""
    import cv2
    img = np.ascontiguousarray(canvas)
    for rec in frame_recs:
        if "gt_box" in rec:
            x0, y0, x1, y1 = (int(round(v)) for v in rec["gt_box"])
            cv2.rectangle(img, (x0, y0), (x1, y1), (180, 180, 180), 1)
        color = _COLORS["nogt" if "hit" not in rec
                        else ("hit" if rec["hit"] else "miss")]
        x0, y0, x1, y1 = (int(round(v)) for v in rec["box"])
        cv2.rectangle(img, (x0, y0), (x1, y1), color, 2)
        cv2.putText(img, f'{rec["word"]} {rec["score"]:.2f}',
                    (x0 + 2, max(y0 - 4, 10)), cv2.FONT_HERSHEY_SIMPLEX,
                    0.45, color, 1, cv2.LINE_AA)
    return img


def _canvas_size(recs: list[dict], default: int = 640) -> int:
    hi = 0.0
    for r in recs:
        hi = max(hi, *r["box"], *(r.get("gt_box") or [0]))
    return max(64, min(4096, int(np.ceil(hi)))) if hi > 0 else default


def visualize_config(cfg: Config, out_dir: str, params: dict,
                     split: str = "val", num_segments: int = 8,
                     annotations: str = "", iou_thresh: float = 0.5,
                     render: bool = True) -> str:
    """Run the tool; returns the predictions.jsonl path."""
    from nafae_tpu.data import SegmentDataset

    try:
        ds = SegmentDataset(cfg.data.root, split, cfg.data.max_frames,
                            cfg.data.num_regions, cfg.data.feat_dim,
                            cfg.data.max_words, with_gt=True)
        if len(ds):
            ds[0]   # the constructor only reads index.jsonl — loading one
                    # sample is what actually probes for gt_boxes in the
                    # feature archives (KeyError on GT-less datasets)
    except (KeyError, OSError):
        ds = SegmentDataset(cfg.data.root, split, cfg.data.max_frames,
                            cfg.data.num_regions, cfg.data.feat_dim,
                            cfg.data.max_words, with_gt=False)
    videos = {}
    if annotations:
        with open(annotations) as f:
            for ln in f:
                ann = json.loads(ln)
                videos[str(ann["id"])] = ann
    from nafae_tpu.data.vocab import vocab_from_config
    vocab = vocab_from_config(cfg.data)
    os.makedirs(out_dir, exist_ok=True)
    jsonl_path = os.path.join(out_dir, "predictions.jsonl")
    n = min(num_segments, len(ds))
    with open(jsonl_path, "w") as out:
        for i in range(n):
            sample = ds[i]
            seg_id = str(ds.index[i].get("id", i))
            recs = segment_records(sample, predict_segment(params, sample),
                                   vocab, seg_id, iou_thresh)
            for r in recs:
                out.write(json.dumps(r) + "\n")
            if not render or not recs:
                continue
            frames = None
            if seg_id in videos:
                from nafae_tpu.extract import decode_segment
                ann = videos[seg_id]
                frames = decode_segment(
                    ann["video"], cfg.detector.frame_rate,
                    cfg.data.max_frames, cfg.detector.image_size,
                    start=float(ann.get("start") or 0.0),
                    end=float(ann.get("end") or -1.0))
            import cv2
            size = _canvas_size(recs, cfg.detector.image_size)
            seg_dir = os.path.join(out_dir, seg_id)
            os.makedirs(seg_dir, exist_ok=True)
            for t in sorted({r["frame"] for r in recs}):
                if frames is not None and t < len(frames):
                    canvas = cv2.cvtColor(
                        (frames[t] * 255).clip(0, 255).astype(np.uint8),
                        cv2.COLOR_RGB2BGR)
                else:
                    canvas = np.full((size, size, 3), 40, np.uint8)
                img = render_frame(canvas,
                                   [r for r in recs if r["frame"] == t])
                cv2.imwrite(os.path.join(seg_dir, f"frame{t:03d}.jpg"), img)
    return jsonl_path


def _load_params(cfg: Config, checkpoint: str | None):
    from nafae_tpu.utils.checkpoint import load_eval_params
    params = load_eval_params(cfg, checkpoint)
    if params is None:
        raise FileNotFoundError(
            f"no checkpoint found in {checkpoint or cfg.train.ckpt_dir!r}")
    return params


def main(argv=None):
    import argparse

    from nafae_tpu.config import load_config

    p = argparse.ArgumentParser("nafae_tpu.visualize")
    p.add_argument("--preset", default="config1")
    p.add_argument("--config", default=None)
    p.add_argument("--override", nargs="*", action="extend",
                   default=None)   # repeated flags ACCUMULATE: the
                                   # config scripts pass their own
                                   # --override before the user's

    p.add_argument("--split", default="val")
    p.add_argument("--checkpoint", default=None,
                   help="orbax ckpt dir or converted .npz (default: "
                        "train.ckpt_dir)")
    p.add_argument("--out", default="viz")
    p.add_argument("--num-segments", type=int, default=8)
    p.add_argument("--annotations", default="",
                   help="segments.jsonl with video paths — draw onto real "
                        "decoded frames instead of a neutral canvas")
    p.add_argument("--iou-thresh", type=float, default=0.5)
    p.add_argument("--no-render", action="store_true",
                   help="predictions.jsonl only, no images")
    args = p.parse_args(argv)
    from nafae_tpu.utils import cli_startup
    cli_startup()
    cfg = load_config(args.config, args.preset, args.override or [])
    path = visualize_config(cfg, args.out, _load_params(cfg, args.checkpoint),
                            split=args.split,
                            num_segments=args.num_segments,
                            annotations=args.annotations,
                            iou_thresh=args.iou_thresh,
                            render=not args.no_render)
    with open(path) as f:
        n = sum(1 for _ in f)
    print(json.dumps({"predictions": path, "records": n,
                      "out_dir": args.out}))
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
