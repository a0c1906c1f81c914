#!/bin/sh
# BASELINE config 1: YouCook2 val grounding eval from precomputed features.
exec python -m nafae_tpu.evaluate --preset config1 --override data.root="${DATA_ROOT:-data/youcook2}" "$@"
