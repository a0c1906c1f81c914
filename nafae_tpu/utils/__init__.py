import os
import sys


def maybe_require_tpu() -> None:
    """scripts/tpu_run.sh contract: with NAFAE_REQUIRE_TPU=1 in the env,
    exit code 3 when jax did not acquire the TPU, so the wrapper retries in
    a fresh process (a failed init is cached in-process). Without the env
    var this is a no-op — CPU runs (tests, dev boxes) are unaffected.

    Guards against the chip-loss failure mode: an exclusive chip that
    refuses acquisition makes jax fall back to CPU *silently*, and a
    training run would otherwise report CPU numbers as chip throughput.
    """
    if os.environ.get("NAFAE_REQUIRE_TPU") == "1":
        import jax
        if jax.default_backend() != "tpu":
            print("NAFAE_REQUIRE_TPU=1 but jax backend is "
                  f"{jax.default_backend()!r}; exiting 3 for the "
                  "tpu_run.sh retry loop", file=sys.stderr)
            sys.exit(3)
