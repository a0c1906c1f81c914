#!/bin/sh
# BASELINE config 5: end-to-end — decode videos and run the frozen detector
# INLINE inside the train step (no feature files for training), then
# transfer-eval on box annotations (eval still extracts the val split once,
# because the metric needs the per-region boxes + merged GT on disk).
#
# Required env:
#   TRAIN_ANNOTATIONS  segments.jsonl for training videos
#   EVAL_ANNOTATIONS   segments.jsonl for eval videos
#   EVAL_BB_JSON       YouCook2-BB-style box annotations for the eval split
# Optional: DATA_ROOT (default data/robowatch), DETECTOR_WEIGHTS (.pth)
set -e
ROOT="${DATA_ROOT:-data/robowatch}"
python -m nafae_tpu.extract --annotations "${EVAL_ANNOTATIONS:?set EVAL_ANNOTATIONS}" \
    --yc2bb-json "${EVAL_BB_JSON:?set EVAL_BB_JSON (eval needs GT boxes)}" \
    --out "$ROOT/val"
python -m nafae_tpu.train --preset config5 --override data.root="$ROOT" \
    data.from_videos=true \
    data.annotations="${TRAIN_ANNOTATIONS:?set TRAIN_ANNOTATIONS}" \
    ${DETECTOR_WEIGHTS:+detector.weights="$DETECTOR_WEIGHTS"} "$@"
# same extra overrides as training so ckpt_dir/shape settings line up
python -m nafae_tpu.evaluate --preset config5 --override data.root="$ROOT" "$@"
