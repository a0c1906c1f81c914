#!/bin/sh
# BASELINE config 3: + contextual similarity loss over neighboring frames.
exec python -m nafae_tpu.train --preset config3 --override data.root="${DATA_ROOT:-data/youcook2}" "$@"
