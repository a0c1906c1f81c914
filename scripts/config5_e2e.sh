#!/bin/sh
# BASELINE config 5: end-to-end — decode videos, extract features inline,
# train with all losses, transfer-eval on box annotations.
#
# Required env:
#   TRAIN_ANNOTATIONS  segments.jsonl for training videos
#   EVAL_ANNOTATIONS   segments.jsonl for eval videos
#   EVAL_BB_JSON       YouCook2-BB-style box annotations for the eval split
# Optional: DATA_ROOT (default data/robowatch)
set -e
ROOT="${DATA_ROOT:-data/robowatch}"
nafae-extract --annotations "${TRAIN_ANNOTATIONS:?set TRAIN_ANNOTATIONS}" \
    --out "$ROOT/train"
nafae-extract --annotations "${EVAL_ANNOTATIONS:?set EVAL_ANNOTATIONS}" \
    --yc2bb-json "${EVAL_BB_JSON:?set EVAL_BB_JSON (eval needs GT boxes)}" \
    --out "$ROOT/val"
nafae-train --preset config5 --override data.root="$ROOT" "$@"
nafae-eval --preset config5 --override data.root="$ROOT"
