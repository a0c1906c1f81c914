#!/bin/bash
# Run a python script on the (exclusive, flaky-to-acquire) TPU chip.
#
#   scripts/tpu_run.sh my_job.py [args...]
#
# The tunneled chip refuses acquisition for minutes at a time; a process
# that loses it silently falls back to CPU. Convention: the job must check
# `jax.default_backend() == "tpu"` itself and exit with code 3 when the
# chip was not acquired — this wrapper then retries in a fresh process
# (a failed init is cached in-process, so retrying inside python is
# useless). Any other exit code (success or real failure) ends the loop.
# See CLAUDE.md "Hard-won environment rules" and docs/PERF.md.
set -u
ATTEMPTS="${TPU_RUN_ATTEMPTS:-40}"
SLEEP="${TPU_RUN_SLEEP:-75}"
# repo CLIs (train/eval/extract) honor this by exiting 3 on a non-TPU
# backend (nafae_tpu.utils.maybe_require_tpu); ad-hoc scripts check
# jax.default_backend() themselves. bench.py keeps its own retry loop.
export NAFAE_REQUIRE_TPU=1
for i in $(seq 1 "$ATTEMPTS"); do
  echo "[tpu_run] attempt $i/$ATTEMPTS $(date +%T)" >&2
  JAX_PLATFORMS='' python -u "$@"
  rc=$?
  if [ "$rc" -ne 3 ]; then exit "$rc"; fi
  sleep "$SLEEP"
done
echo "[tpu_run] chip not acquired after $ATTEMPTS attempts" >&2
exit 1
