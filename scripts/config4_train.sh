#!/bin/sh
# BASELINE config 4: + visual clustering loss (on-device k-means).
exec python -m nafae_tpu.train --preset config4 --override data.root="${DATA_ROOT:-data/youcook2}" "$@"
