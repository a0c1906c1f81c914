#!/bin/sh
# Quickstart: the full train->eval loop on planted-signal synthetic data —
# no real videos or features needed. Accuracy should end well above the
# 1/classes chance level (the fixtures plant class-direction signal; see
# nafae_tpu/data/synthetic.py and tests/test_e2e.py golden numbers).
#
# Usage: scripts/quickstart_synthetic.sh [workdir]
#
# Uses `python -m nafae_tpu.*` so it works without installing the package
# (the nafae-train/eval console scripts need `pip install -e .`).
set -e
ROOT="${1:-/tmp/nafae_quickstart}"
python - "$ROOT" <<'EOF'
import sys
from nafae_tpu.data.synthetic import generate_synthetic_dataset
root = sys.argv[1]
generate_synthetic_dataset(root, "train", num_segments=64, feat_dim=128,
                           num_regions=8, min_frames=4, max_frames=10,
                           max_words=4, seed=0, class_pool=12)
generate_synthetic_dataset(root, "val", num_segments=24, feat_dim=128,
                           num_regions=8, min_frames=4, max_frames=10,
                           max_words=4, seed=1, class_pool=12)
print("synthetic dataset at", root)
EOF
OV="data.root=$ROOT data.feat_dim=128 model.feat_dim=128 data.batch_size=16 \
data.max_frames=10 data.num_regions=8 data.max_words=4 loss.num_clusters=12 \
train.ckpt_dir=$ROOT/ckpt"
python -m nafae_tpu.train --preset config4 --override $OV train.steps=600 \
    train.steps_per_call=10 train.log_every=100
python -m nafae_tpu.evaluate --preset config1 --per-class --override $OV
