#!/bin/sh
# BASELINE config 2: frame-wise MIL + ranking training (precomputed RoIs).
exec python -m nafae_tpu.train --preset config2 --override data.root="${DATA_ROOT:-data/youcook2}" "$@"
