#!/bin/sh
# BASELINE config 5: extract features inline from videos, then RoboWatch eval.
set -e
nafae-extract --annotations "${ANNOTATIONS:?set ANNOTATIONS=segments.jsonl}" --out "${DATA_ROOT:-data/robowatch}/train"
nafae-train --preset config5 --override data.root="${DATA_ROOT:-data/robowatch}" "$@"
nafae-eval --preset config5 --override data.root="${DATA_ROOT:-data/robowatch}"
