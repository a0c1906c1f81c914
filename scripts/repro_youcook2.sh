#!/bin/bash
# One-command official-data rehearsal (SURVEY.md §4.1-4.3; VERDICT r2 #5):
# the full reference pipeline — strict-parsed official annotations ->
# offline feature extraction -> config-4 training -> per-class eval ->
# rendered grounding visualizations — as ONE command.
#
#   scripts/repro_youcook2.sh \
#       youcookii_annotations_trainval.json \   # YouCook2 release
#       yc2_bb_val_annotations.json \           # YouCook2-BB release (val)
#       /path/to/videos /path/to/out \
#       [extra --override key=val ...]          # appended to train/eval
#
# Env:
#   DETECTOR_PTH  — torch Faster R-CNN .pth to convert (faster-rcnn.pytorch
#                   lineage, resnet or vgg16 auto-detected); random-init
#                   detector otherwise (pipeline rehearsal, not paper parity)
#   EXTRACT_OVERRIDES — space-separated key=val overrides for the two
#                   extract stages. A vgg16-lineage DETECTOR_PTH needs
#                   EXTRACT_OVERRIDES="detector.backbone=vgg16
#                   detector.rpn_channels=512 model.feat_dim=4096"
#                   (and model.feat_dim=4096 in the trailing train/eval
#                   overrides) — the converter errors with this hint if
#                   forgotten.
#   TRAIN_PRESET  — training preset (default config4)
#
# Every stage parses annotations with --strict: schema drift in the official
# files fails HERE, loudly, instead of silently dropping segments.
set -euo pipefail

YC2_JSON=${1:?youcookii_annotations_trainval.json}
BB_JSON=${2:?yc2_bb val annotations json}
VIDEO_DIR=${3:?video directory}
OUT=${4:?output directory}
shift 4
PRESET=${TRAIN_PRESET:-config4}
CKPT_ARGS=()
[ -n "${DETECTOR_PTH:-}" ] && CKPT_ARGS=(--ckpt "$DETECTOR_PTH")
EX_OV=()
# shellcheck disable=SC2206  # word-splitting the override list is the point
[ -n "${EXTRACT_OVERRIDES:-}" ] && EX_OV=(--override $EXTRACT_OVERRIDES)

mkdir -p "$OUT"

echo "== [1/5] extract train features (strict parse)" >&2
python -m nafae_tpu extract --preset config5 \
    --youcook2-json "$YC2_JSON" --video-dir "$VIDEO_DIR" --subset train \
    --strict "${CKPT_ARGS[@]}" "${EX_OV[@]}" --out "$OUT/feats/train"

echo "== [2/5] extract val features + merge YC2-BB GT (strict parse)" >&2
python -m nafae_tpu extract --preset config5 \
    --youcook2-json "$YC2_JSON" --video-dir "$VIDEO_DIR" --subset val \
    --yc2bb-json "$BB_JSON" --strict "${CKPT_ARGS[@]}" "${EX_OV[@]}" \
    --out "$OUT/feats/val"

echo "== [3/5] train ($PRESET)" >&2
python -m nafae_tpu train --preset "$PRESET" --override \
    "data.root=$OUT/feats" "train.ckpt_dir=$OUT/ckpt" "$@"

echo "== [4/5] eval (per-class)" >&2
python -m nafae_tpu eval --preset "$PRESET" --per-class --override \
    "data.root=$OUT/feats" "train.ckpt_dir=$OUT/ckpt" "$@" \
    | tee "$OUT/eval.json"

echo "== [5/5] visualize" >&2
python -m nafae_tpu visualize --preset "$PRESET" --out "$OUT/viz" --override \
    "data.root=$OUT/feats" "train.ckpt_dir=$OUT/ckpt" "$@"

echo "done: eval -> $OUT/eval.json, renders -> $OUT/viz" >&2
