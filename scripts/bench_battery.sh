#!/bin/bash
# Full chip measurement battery: train (the headline metric, same program the
# driver's bench run measures — also warms the persistent compile cache),
# then the config-5 inline e2e step, then eval. One JSON line per mode lands
# in $OUT. Run this in the first healthy chip window after a tunnel outage
# (see .claude/skills/verify/SKILL.md) — the chip is exclusive, so never run
# it concurrently with another TPU process.
#
#   OUT=/tmp/bench_battery scripts/bench_battery.sh [modes...]
set -u
OUT=${OUT:-/tmp/bench_battery}
mkdir -p "$OUT"
cd "$(dirname "$0")/.." || exit 2
modes=("$@")
[ ${#modes[@]} -eq 0 ] && modes=(train e2e eval serve serve_int8pre)
for mode in "${modes[@]}"; do
  args=(--mode "$mode")
  # serve_int8pre = the offline-quantized serving form (a flag, not a mode)
  [ "$mode" = serve_int8pre ] && args=(--mode serve --quantize int8pre)
  JAX_PLATFORMS='' NAFAE_BENCH_DEADLINE="${NAFAE_BENCH_DEADLINE:-1380}" \
    timeout "${BENCH_TIMEOUT:-1500}" \
    python bench.py "${args[@]}" >"$OUT/$mode.json" 2>"$OUT/$mode.err"
  echo "$mode rc=$? $(cat "$OUT/$mode.json" 2>/dev/null | tail -1)"
done
