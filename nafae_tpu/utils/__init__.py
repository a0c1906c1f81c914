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

    Hang mode: during tunnel outages backend init can BLOCK indefinitely
    instead of failing (observed 5h+). The wait releases the GIL, so a
    watchdog thread can still exit 3 after 240 s — keeping the tpu_run.sh
    retry contract alive for hangs, not just failures.
    """
    if os.environ.get("NAFAE_REQUIRE_TPU") == "1":
        require_tpu_or_exit3("NAFAE_REQUIRE_TPU=1")


def require_tpu_or_exit3(tool: str = "tool") -> None:
    """Unconditional form of the tpu_run.sh exit-3 contract, for
    measurement scripts that are meaningless off-chip (ab_kernels,
    ab_inline, profile_step). Same hang watchdog as maybe_require_tpu."""
    import threading
    done = threading.Event()

    def _watchdog():
        if not done.wait(240):
            print(f"{tool}: jax backend init hung "
                  ">240 s; exiting 3 for the tpu_run.sh retry loop",
                  file=sys.stderr)
            sys.stderr.flush()
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    backend = jax.default_backend()
    done.set()
    if backend != "tpu":
        print(f"{tool}: jax backend is "
              f"{backend!r}; exiting 3 for the "
              "tpu_run.sh retry loop", file=sys.stderr)
        sys.exit(3)


def enable_compilation_cache() -> None:
    """Persistent XLA compilation cache, shared across processes.

    Compiles on this host go through a remote-compile service and cost
    minutes even for small programs; every fresh process pays them again.
    The cache stores serialized executables under NAFAE_JAX_CACHE (default
    ~/.cache/nafae_jax_cache) so the second process with the same program
    skips the service entirely. Set NAFAE_JAX_CACHE=0 to disable.
    """
    path = os.environ.get("NAFAE_JAX_CACHE",
                          os.path.expanduser("~/.cache/nafae_jax_cache"))
    if path == "0":
        return
    import jax
    try:
        if jax.default_backend() == "cpu":
            # XLA:CPU AOT artifacts bake in the COMPILING machine's CPU
            # features — loading them on a different host warns about
            # possible SIGILL. CPU compiles are fast anyway; the cache
            # only pays for itself on the remote-compile TPU path.
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:      # cache is an optimization, never a blocker
        print(f"compilation cache disabled: {e}", file=sys.stderr)


def _configured_platforms():
    """Current jax_platforms CONFIG value (the boot snapshot of the env var
    unless something in-process overrode it). Separate function so tests can
    stub it — jax.config exposes it as an unpatchable class property."""
    import jax
    return jax.config.jax_platforms


def apply_platform_override() -> None:
    """Honor NAFAE_PLATFORM=cpu|tpu for CLI runs.

    The axon TPU plugin registers at interpreter boot and IGNORES the
    standard JAX_PLATFORMS env var, so on hosts with the plugin there is no
    environment-only way to keep a CLI off the (exclusive) chip. This knob
    applies the override the only way that works — jax.config.update after
    import — before any device is touched."""
    # The axon plugin registers its backend under the name "tpu", so a
    # literal JAX_PLATFORMS=axon (the default in some host shells) makes
    # jax backend init fail outright ("Backend 'axon' is not in the list
    # of known backends"). jax snapshots the env var into its config at
    # import, so clearing os.environ alone is too late — reset the config
    # value itself (and the env, for any subprocesses). Gate on the CONFIG
    # value, not just the env var: if something earlier in the process
    # (tests/conftest.py) already overrode the snapshot to "cpu", resetting
    # to None here would undo that and hang a CPU test run on TPU init.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "axon":
        os.environ["JAX_PLATFORMS"] = ""
        import jax
        if (_configured_platforms() or "").strip().lower() == "axon":
            jax.config.update("jax_platforms", None)
    plat = os.environ.get("NAFAE_PLATFORM", "").strip().lower()
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)


def cli_startup() -> None:
    """Common CLI preamble: apply NAFAE_PLATFORM, honor the tpu_run.sh
    exit-3 contract, then turn on the persistent compilation cache. Call
    first thing in every main()."""
    apply_platform_override()
    maybe_require_tpu()
    enable_compilation_cache()
