"""Benchmark: grounding training throughput (frames/sec/chip) vs torch-cpu reference.

Prints the headline JSON line {"metric", "value", "unit", "vs_baseline"}
first. A full train run (the driver's invocation) then also notarizes the
other three modes — one JSON line each for eval / serve / e2e (value,
step_us, flops_per_step, mfu, or an error field), still under the deadline
watchdog — and finally REPEATS the headline line, so a parser taking either
the first or the last JSON line of the tail reads the train metric
(VERDICT r3 #4). Single-mode and --quick runs print one line as before
(--battery / --no-battery overrides).

The reference (jshi31/NAFAE lineage) never published throughput, so per
BASELINE.md the baseline is self-measured: a *vectorized* torch-cpu
implementation of the identical train step (forward + backward + SGD on the
same shapes) — strictly faster than the reference's per-frame Python loops
(SURVEY.md L179), i.e. a conservative denominator for the >10x target.
The measured baseline is cached in .bench_baseline.json (keyed by shape).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import signal
import sys
import time

import numpy as np

# the axon TPU plugin registers its backend under the canonical name "tpu";
# JAX_PLATFORMS=axon (seen in some shells) makes jax abort at init. Clear it
# before any jax import so the bench always reaches the chip.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "axon":
    os.environ["JAX_PLATFORMS"] = ""

# ---------------------------------------------------------------------------
# Always-emit protocol: the driver records bench stdout and parses the last
# JSON line; a run killed mid-retry during a TPU-tunnel outage must still
# produce a parseable line (r2 lesson: BENCH_r02 recorded parsed=null after
# 40 min of watchdog re-execs). _PROGRESS carries the best measurement so
# far; SIGTERM/SIGINT (the driver's `timeout`) and watchdog exhaustion emit
# it (value=null + "error" if nothing was measured yet).
# ---------------------------------------------------------------------------
_PROGRESS = {
    "metric": "grounding_train_frames_per_sec_per_chip",
    "value": None,
    "unit": "frames/sec",
    "vs_baseline": None,
}
_EMITTED = False
_HEADLINE = None        # the emitted headline dict (re-printed after a battery)
_BATTERY_PENDING = []   # battery modes not yet printed (stubs on kill/deadline)

_MODE_METRICS = {
    "train": "grounding_train_frames_per_sec_per_chip",
    "eval": "grounding_eval_frames_per_sec_per_chip",
    "e2e": "inline_extract_train_frames_per_sec_per_chip",
    "serve": "grounding_serve_frames_per_sec_per_chip",
    # battery-only: the deployable offline-quantized serving form (docs/
    # PERF.md "r5 inference work" — int8 features + int8 weights, +30%)
    "serve_int8pre": "grounding_serve_int8pre_frames_per_sec_per_chip",
}


def _emit(extra=None, error=None):
    global _EMITTED, _HEADLINE
    if _EMITTED:
        return
    _EMITTED = True
    out = dict(_PROGRESS)
    out.pop("stage", None)
    base_fps = out.pop("_baseline_fps", None)
    if extra:
        out.update(extra)
    if out.get("vs_baseline") is None and out.get("value") and base_fps:
        out["vs_baseline"] = round(out["value"] / base_fps, 2)
    if error and out.get("value") is None:
        out["error"] = error
    _HEADLINE = out
    print(json.dumps(out))
    sys.stdout.flush()


def _emit_battery_line(mode, fields):
    """One notarization JSON line per non-headline mode (VERDICT r3 #4).
    Driver keys present on every line; "mode" disambiguates."""
    out = {"metric": _MODE_METRICS[mode], "mode": mode, "value": None,
           "unit": "frames/sec", "vs_baseline": None}
    out.update(fields)
    if mode in _BATTERY_PENDING:
        _BATTERY_PENDING.remove(mode)
    print(json.dumps(out))
    sys.stdout.flush()


def _finalize(error=None):
    """Emit everything still owed: the headline (if not yet out), stub lines
    for unmeasured battery modes, and — when a battery ran/was running — a
    final repeat of the headline line, so the driver's parsed record is the
    train metric whether it takes the FIRST or the LAST JSON line."""
    had_battery = bool(_BATTERY_PENDING)
    _emit(error=error)
    for m in list(_BATTERY_PENDING):
        _emit_battery_line(m, {"error": error or "not_measured"})
    if (had_battery or _BATTERY_FINAL_REPRINT) and _HEADLINE is not None:
        print(json.dumps(_HEADLINE))
        sys.stdout.flush()


_BATTERY_FINAL_REPRINT = False  # set once battery lines were printed


def _on_kill(signum, frame):
    _finalize(error=f"killed_by_signal_{signum}_during_"
                    + str(_PROGRESS.get("stage", "init")))
    os._exit(1)


# Cumulative self-deadline across watchdog re-execs (the TERM handler above
# cannot run while the main thread is blocked inside backend-init C code —
# only a thread can emit then). _NAFAE_BENCH_T0 survives os.execv so the
# clock spans the whole retry chain, not one process.
_DEADLINE = float(os.environ.get("NAFAE_BENCH_DEADLINE", "1380"))


def _deadline_thread():
    import threading
    t0 = float(os.environ.setdefault("_NAFAE_BENCH_T0", str(time.time())))

    def run():
        remain = _DEADLINE - (time.time() - t0)
        if remain > 0:
            time.sleep(remain)
        _finalize(error="deadline_" + str(_PROGRESS.get("stage", "init")))
        os._exit(1)

    threading.Thread(target=run, daemon=True).start()


# Arm the kill handlers and deadline only when bench IS the program: the
# A/B and profiling tools import this module for its harness helpers, and a
# library import must not hijack Ctrl-C or hard-exit a long cache-cold
# profiling session at the bench's deadline (r3 review finding). os.execv
# re-runs the script as __main__, so the re-exec chain stays guarded.
if __name__ == "__main__":
    signal.signal(signal.SIGTERM, _on_kill)
    signal.signal(signal.SIGINT, _on_kill)
    _deadline_thread()


def _require_tpu():
    """The tunneled chip can refuse acquisition for minutes after its last
    release ("No hardware is found" → silent CPU fallback, which would make
    the bench report CPU numbers as chip throughput). A failed init is
    cached in-process, so retry by re-exec'ing this script, bounded.
    CPU runs must be explicit: NAFAE_BENCH_ALLOW_CPU=1.

    Outage mode: backend init can also HANG outright (observed: a 5h+
    tunnel outage blocked jax.devices() indefinitely instead of failing).
    The hang is a GIL-released network wait, so a watchdog thread can
    still run — after 240 s it counts the attempt and re-execs."""
    import threading
    done = threading.Event()
    tries = int(os.environ.get("_NAFAE_BENCH_TRIES", "0"))
    # short leash on the first attempts so more retries fit inside the
    # driver's timeout; a healthy acquisition completes well under 120 s
    patience = 120 if tries < 3 else 240

    def _watchdog():
        if done.wait(patience):
            return
        print(f"bench: TPU init hung >{patience} s (attempt {tries + 1}/25); "
              "re-exec", file=sys.stderr)
        sys.stderr.flush()
        if tries >= 25:
            _emit(error="tpu_init_hung")
            os._exit(1)
        os.environ["_NAFAE_BENCH_TRIES"] = str(tries + 1)
        time.sleep(75)
        os.execv(sys.executable, [sys.executable] + sys.argv)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax
    backend = jax.default_backend()
    done.set()
    if backend == "tpu":
        return
    if os.environ.get("NAFAE_BENCH_ALLOW_CPU") == "1":
        print("bench: WARNING measuring on CPU backend", file=sys.stderr)
        return
    if tries >= 25:
        print("bench: TPU unavailable after retries; pass "
              "NAFAE_BENCH_ALLOW_CPU=1 to measure on CPU", file=sys.stderr)
        _emit(error="tpu_unavailable")
        sys.exit(1)
    print(f"bench: TPU not acquired (attempt {tries + 1}/25); "
          "retrying in 75 s", file=sys.stderr)
    time.sleep(75)
    os.environ["_NAFAE_BENCH_TRIES"] = str(tries + 1)
    os.execv(sys.executable, [sys.executable] + sys.argv)

SHAPES = dict(B=32, T=20, R=20, D=2048, E=256, K=8, V=67, KC=67, W=3)
QUICK = dict(B=8, T=8, R=8, D=256, E=64, K=4, V=67, KC=16, W=2)
BASELINE_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              ".bench_baseline.json")

# TPU v5e (v5 lite) peak: 197 TFLOP/s bf16, 819 GB/s HBM (docs/PERF.md
# roofline). Override for other chips via NAFAE_PEAK_FLOPS.
PEAK_FLOPS = float(os.environ.get("NAFAE_PEAK_FLOPS", 197e12))


def train_step_flops(s):
    """Analytic matmul FLOPs per config-4 train step (fwd+bwd+update).

    Counts the MXU terms only (2·M·N·K per matmul; elementwise/VPU work is
    <2% at these shapes). Derivation per term in docs/PERF.md "Roofline".
    Cross-checked against XLA cost_analysis (body counted once) — see
    tests/test_bench.py.
    """
    B, T, R, D, E = s["B"], s["T"], s["R"], s["D"], s["E"]
    K, KC, W = s["K"], s["KC"], s["W"]
    proj = 4 * B * T * R * D * E       # fwd 2MNK + dW 2MNK (feats: no grad)
    cross = 12 * B * B * K * T * R * E  # s and ŝ cross einsums, fwd + 2-grad bwd
    ctx = 32 * B * T * W * R * R * E    # logits+mix fwd (8BTwR²E) × (1+2+1 remat)
    select = 6 * B * K * T * R * E      # one-hot select einsum, fwd+bwd
    kmeans = 6 * B * K * T * KC * E     # assignment sims, fwd+bwd
    return proj + cross + ctx + select + kmeans


def eval_step_flops(s):
    """Projection + similarity + the one-hot argmax-box select einsum
    (grounding_hits, bktr,btrc->bktc — r4's gather replacement IS a matmul,
    so it belongs in the denominator). IoU itself is elementwise."""
    B, T, R, D, E, K = s["B"], s["T"], s["R"], s["D"], s["E"], s["K"]
    return (2 * B * T * R * D * E + 2 * B * K * T * R * E
            + 2 * B * K * T * R * 4)


def serve_step_flops(s):
    """MXU FLOPs of the serving program (make_ground_fn at the bench's
    config1 preset), counted term by term (VERDICT r4 #5 — the recorded
    serve MFU carries its own denominator, not eval's):

      projection      2·B·T·R·D·E
      similarity      2·B·K·T·R·E
      one-hot box sel 2·B·K·T·R·4   (einsum bktr,btrc->bktc)

    — the same three matmul terms as eval (the serve-only extras:
    frame-attention softmax/β, argmax, max scores, video score are
    VPU/elementwise with zero matmul FLOPs; eval's extra IoU is too).
    The counts coincide BY DERIVATION now, not by borrowing (VERDICT r4
    #5). Cross-checked against XLA cost_analysis of the compiled program
    in tests/test_bench.py::test_analytic_flops_match_cost_analysis."""
    return eval_step_flops(s)


_LAST_PROGRAM = None   # (jitted multi, args) of the last measured program


def cost_analysis_flops(jitted, *args):
    """Module FLOPs from XLA's cost analysis. XLA counts a while-loop body
    ONCE regardless of trip count, so for a scan-of-steps program the module
    total ≈ one step's FLOPs (plus a small prologue) — no division by
    steps_per_call. Returns None when the backend doesn't support it."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        f = float(ca["flops"])
        return f if f > 0 else None
    except Exception:
        return None


def make_batch(s, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "feats": rng.randn(s["B"], s["T"], s["R"], s["D"]).astype(np.float32),
        "boxes": np.abs(rng.rand(s["B"], s["T"], s["R"], 4)).astype(np.float32),
        "word_ids": rng.randint(0, s["V"], (s["B"], s["K"])).astype(np.int32),
        "frame_mask": np.ones((s["B"], s["T"]), np.float32),
        "word_mask": np.ones((s["B"], s["K"]), np.float32),
        "region_mask": np.ones((s["B"], s["T"], s["R"]), np.float32),
        "segment_id": np.arange(s["B"], dtype=np.int32),
    }


def bench_jax(s, iters=256, warmup=1, kernels="auto", dtype="bfloat16",
              steps_per_call=256, repeats=4, extra_overrides=()):
    import jax

    from nafae_tpu.config import load_config
    from nafae_tpu.train import TrainState, make_optimizer, make_train_step

    if dtype == "bfloat16" and jax.default_backend() == "cpu":
        # the CPU backend's DotThunk cannot execute bf16 x bf16 -> f32;
        # CPU runs (NAFAE_BENCH_ALLOW_CPU smoke) measure f32 instead
        dtype = "float32"
    cfg = load_config(preset_name="config4", overrides=[
        f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
        f"data.batch_size={s['B']}", f"loss.num_clusters={s['KC']}",
        f"loss.ctx_window={s['W']}", "loss.kmeans_interval=100",
        f"train.kernels={kernels}",
        f"model.dtype={dtype}", "model.matmul_precision=default",
    ] + list(extra_overrides))
    batch = {k: jax.device_put(v) for k, v in make_batch(s).items()}
    step = make_train_step(cfg, make_optimizer(cfg))
    # --iters below steps_per_call means "run fewer steps", not "floor to
    # 256 anyway": shrink the per-call scan so short runs stay short
    steps_per_call = max(1, min(steps_per_call, iters))

    # Timing protocol: scan steps_per_call optimizer steps inside ONE XLA
    # execution (per-call overhead on this host is a fixed ~30 ms tunnel
    # round-trip — per-call python-loop timing measures the tunnel, not the
    # chip; 256 steps/call amortizes it to <0.2 ms/step), then bound the
    # computation with a real device->host fetch of a value that depends on
    # the LAST step's optimizer update (b_v, 1 KB — jax.block_until_ready
    # does NOT block on the axon backend, and fetching the full 2 MB w_v
    # costs ~70 ms over the tunnel). Within-process device-busy tracing
    # agrees with this protocol to ~8% (docs/PERF.md).
    from nafae_tpu.train import jit_compiler_options

    @functools.partial(jax.jit, compiler_options=jit_compiler_options(cfg))
    def multi(state, batch):
        def body(st, _):
            st, metrics = step(st, batch)
            return st, metrics["loss"]
        return jax.lax.scan(body, state, None, length=steps_per_call)

    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    _PROGRESS["stage"] = "compile"
    state, losses = multi(state, batch)          # compile + first warm call
    for _ in range(max(0, warmup - 1)):
        state, losses = multi(state, batch)
    loss = float(losses[-1])
    ncalls = max(1, iters // steps_per_call)
    # best-of-k: this host's chip-rate varies >2x between measurement
    # windows (tunnel contention); the fastest repeat is the least-polluted
    # estimate of device throughput. Each repeat updates _PROGRESS so a
    # kill mid-run still reports the best completed measurement.
    _PROGRESS["stage"] = "measure"
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(ncalls):
            state, losses = multi(state, batch)
        float(np.asarray(state.params["b_v"])[0])
        best = min(best, time.perf_counter() - t0)
        _PROGRESS["value"] = round(
            s["B"] * s["T"] * ncalls * steps_per_call / best, 1)
    dt = best / (ncalls * steps_per_call)
    global _LAST_PROGRAM
    _LAST_PROGRAM = (multi, (state, batch))     # for cost_analysis in main()
    return s["B"] * s["T"] / dt, dt, loss


def bench_jax_eval(s, iters=256, steps_per_call=256):
    """Grounding inference throughput: similarity + argmax + IoU hits."""
    import jax
    import jax.numpy as jnp

    steps_per_call = max(1, min(steps_per_call, iters))  # same floor as bench_jax

    from nafae_tpu.config import load_config
    from nafae_tpu.models.grounding import init_params
    from nafae_tpu.ops import grounding as Gr
    from nafae_tpu.ops.iou import grounding_hits

    cfg = load_config(preset_name="config1", overrides=[
        f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}"])
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    b = make_batch(s)
    gt_boxes = np.zeros((s["B"], s["K"], s["T"], 4), np.float32)
    gt_mask = np.ones((s["B"], s["K"], s["T"]), np.float32)
    feats = jax.device_put(b["feats"])

    @jax.jit
    def evals(params, feats):
        def body(acc, _):
            # EVERY op in the body must DEPEND on the carry or XLA's
            # loop-invariant code motion hoists it out of the scan and the
            # timing amortizes it over steps_per_call (the r3 lesson: the
            # projection — 13.4 of the 13.5 GFLOPs — depended only on the
            # loop-invariant feats+params and was hoisted in the serve
            # variant, yielding an impossible MFU=1.01). The never-taken
            # selects below (acc >= 0 always) are data-dependent on acc:
            # wid guards the word path, the w_v perturbation guards the
            # projection matmul (costs one 2 MB broadcast-add, ~5 us —
            # unlike perturbing feats, which would add a 107 MB round-trip).
            wid = jnp.asarray(b["word_ids"])
            wid = jnp.where(acc < -1.0, wid + 1, wid)
            eps = jnp.where(acc < -1.0, 1.0, 0.0)
            with Gr.matmul_precision("default"):
                w = Gr.embed_words(wid, params["word_emb"])
                v = Gr.project_regions(feats,
                                       params["w_v"] + eps.astype(
                                           params["w_v"].dtype),
                                       params["b_v"],
                                       dtype=jnp.bfloat16)
                sim = Gr.similarity_tensor(w, v, dtype=jnp.bfloat16)
                correct, gm = grounding_hits(sim, jnp.asarray(b["boxes"]),
                                             jnp.asarray(gt_boxes),
                                             jnp.asarray(gt_mask))
            return acc + jnp.sum(correct), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), None,
                              length=steps_per_call)
        return acc

    _PROGRESS["stage"] = "compile"
    acc = evals(params, feats)
    float(acc)
    ncalls = max(1, iters // steps_per_call)
    _PROGRESS["stage"] = "measure"
    best = float("inf")
    for _ in range(4):          # best-of-k, same rationale as bench_jax
        t0 = time.perf_counter()
        for _ in range(ncalls):
            acc = evals(params, feats)
        float(acc)
        best = min(best, time.perf_counter() - t0)
        _PROGRESS["value"] = round(
            s["B"] * s["T"] * ncalls * steps_per_call / best, 1)
    dt = best / (ncalls * steps_per_call)
    return s["B"] * s["T"] / dt, dt


def make_inline_setup(overrides=(), b=2, t=8, image_size=320,
                      steps_per_call=64, seed=0):
    """Shared config-5 INLINE harness (bench --mode e2e, scripts/ab_inline,
    scripts/profile_step): returns (cfg, device batch, jitted scan-spc
    `multi(state, batch)`). One definition so the measured program and
    batch cannot drift between the bench and the A/B/profiling tools.

    Defaults encode the production knobs (see docs/PERF.md r2 for the
    A/Bs): bf16 model + bf16 detector activations (626 -> 477 us/step),
    full-pool greedy NMS in the row-parallel Pallas kernel via the preset
    (no pre-NMS sort, 463 -> 386 us/step). `overrides` append last, so a
    variant can flip any of them.

    Hoisting guard (r3 measurement correction): the detector consumes only
    `batch["frames"]` + frozen params — both loop-invariant across the scan
    — so XLA hoisted the ENTIRE detector forward out of the multi-step loop
    and every "inline" rate before r3 amortized one detector pass over
    steps_per_call steps (verified on CPU: spc=1 79 ms/call vs spc=32
    150 ms/call; an honest spc=32 would be ~32x). Real training sees new
    frames every step, so the body below perturbs the frames by a
    data-dependent never-taken select on the carried params — XLA cannot
    prove it zero, the detector stays inside the loop, and the added work
    is one elementwise add on [B,T,H,W,3].
    """
    import jax
    import jax.numpy as jnp

    from nafae_tpu.config import load_config
    from nafae_tpu.models.detector.faster_rcnn import init_detector
    from nafae_tpu.train import make_optimizer, make_train_step

    cfg = load_config(preset_name="config5", overrides=[
        f"data.batch_size={b}", f"data.max_frames={t}",
        f"detector.image_size={image_size}",
        "loss.kmeans_interval=100", "train.kernels=auto",
        "model.dtype=bfloat16", "model.matmul_precision=default",
        "detector.dtype=bfloat16",
    ] + list(overrides))
    rng = np.random.RandomState(seed)
    batch = {
        "frames": rng.rand(b, t, image_size, image_size, 3).astype(np.float32),
        "word_ids": rng.randint(0, 67, (b, 4)).astype(np.int32),
        "frame_mask": np.ones((b, t), np.float32),
        "word_mask": np.ones((b, 4), np.float32),
        "segment_id": np.arange(b, dtype=np.int32),
    }
    batch = {k: jax.device_put(v) for k, v in batch.items()}
    det_model, det_params = init_detector(jax.random.PRNGKey(0), cfg.detector)
    step = make_train_step(cfg, make_optimizer(cfg),
                           extractor=(det_model.apply, det_params))
    from nafae_tpu.train import jit_compiler_options

    @functools.partial(jax.jit, compiler_options=jit_compiler_options(cfg))
    def multi(state, batch):
        def body(st, _):
            # never-taken (params stay finite), but data-dependent on the
            # carry: defeats loop-invariant code motion of the detector
            eps = jnp.where(jnp.isnan(st.params["b_v"][0]), 1.0, 0.0)
            bt = dict(batch)
            bt["frames"] = batch["frames"] + eps.astype(batch["frames"].dtype)
            st, metrics = step(st, bt)
            return st, metrics["loss"]
        return jax.lax.scan(body, state, None, length=steps_per_call)

    return cfg, batch, multi


def measure_inline(cfg, batch, multi, steps_per_call, ncalls=1, repeats=4):
    """Best-of-`repeats` timing of `ncalls` multi() calls, bounded by a
    real device->host fetch (the scan protocol — see bench_jax's timing
    notes). Returns (sec/step, last loss)."""
    import jax

    from nafae_tpu.train import TrainState

    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    _PROGRESS["stage"] = "compile"
    state, losses = multi(state, batch)          # compile + warm
    _PROGRESS["stage"] = "measure"
    best = float("inf")
    nframes = int(batch["frames"].shape[0] * batch["frames"].shape[1])
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(ncalls):
            state, losses = multi(state, batch)
        float(np.asarray(state.params["b_v"])[0])
        best = min(best, time.perf_counter() - t0)
        _PROGRESS["value"] = round(
            nframes * ncalls * steps_per_call / best, 1)
    global _LAST_PROGRAM
    _LAST_PROGRAM = (multi, (state, batch))
    return best / (ncalls * steps_per_call), float(losses[-1])


def bench_inline(iters=1024, steps_per_call=256, image_size=320, b=2, t=8,
                 kernels="auto"):
    """Config-5 inline step: frames -> frozen Faster R-CNN -> fused losses,
    one XLA program (the BASELINE north star's "feature+loss fused" form).
    Synthetic frames stand in for decoded video; decode runs in loader
    workers off the measured path. Returns frames/sec/chip."""
    steps_per_call = max(1, min(steps_per_call, iters))
    cfg, batch, multi = make_inline_setup(
        overrides=[f"train.kernels={kernels}"], b=b, t=t,
        image_size=image_size, steps_per_call=steps_per_call)
    dt, loss = measure_inline(cfg, batch, multi, steps_per_call,
                              ncalls=max(1, iters // steps_per_call))
    return b * t / dt, dt, loss


def bench_torch(s, iters=3, warmup=1):
    """Vectorized torch-cpu train step on the same shapes (the baseline)."""
    import torch

    torch.manual_seed(0)
    b = make_batch(s)
    feats = torch.from_numpy(b["feats"])
    wid = torch.from_numpy(b["word_ids"]).long()
    emb = torch.randn(s["V"], s["E"], requires_grad=True)
    w_v = torch.randn(s["D"], s["E"], requires_grad=True)
    b_v = torch.zeros(s["E"], requires_grad=True)
    centers = torch.nn.functional.normalize(torch.randn(s["KC"], s["E"]), dim=1)
    opt = torch.optim.SGD([emb, w_v, b_v], lr=1e-3)
    offsets = [o for o in range(-s["W"], s["W"] + 1) if o != 0]
    t_idx = torch.arange(s["T"])

    def step():
        opt.zero_grad()
        w = torch.nn.functional.normalize(emb[wid], dim=-1)          # [B,K,E]
        v = torch.nn.functional.normalize(feats @ w_v + b_v, dim=-1)  # [B,T,R,E]
        sim = torch.einsum("bke,btre->bktr", w, v)
        rows = torch.einsum("jke,itre->ijktr", w, v)                 # [B,B,K,T,R]
        a = rows.max(dim=-1).values
        g = a.mean(dim=2)                                            # [B,B,T]
        beta = torch.softmax(g / 0.1, dim=-1)
        smat = (beta.unsqueeze(2) * a).sum(-1).mean(-1)              # [B,B]
        pos = smat.diagonal()
        off = 1.0 - torch.eye(s["B"])
        l_rank = ((torch.relu(0.1 + smat - pos[:, None]) * off).sum()
                  + (torch.relu(0.1 + smat - pos[None, :]) * off).sum()
                  ) / (s["B"] * (s["B"] - 1))
        # context loss
        shat_acc = 0.0
        for o in offsets:
            idx = (t_idx + o).clamp(0, s["T"] - 1)
            aff = torch.einsum("btre,btse->btrs", v, v[:, idx])
            alpha = torch.softmax(aff / 0.1, dim=-1)
            shat_acc = shat_acc + torch.einsum("btrs,bkts->bktr", alpha,
                                               sim[:, :, idx])
        shat = shat_acc / len(offsets)
        l_ctx = ((sim - shat.detach()) ** 2).mean()
        # cluster loss
        r_star = sim.argmax(dim=-1)                                  # [B,K,T]
        f = torch.gather(
            v.unsqueeze(1).expand(-1, s["K"], -1, -1, -1), 3,
            r_star[..., None, None].expand(-1, -1, -1, 1, s["E"]))[..., 0, :]
        assign = (f @ centers.t()).argmax(-1)
        l_clu = ((f - centers[assign].detach()) ** 2).sum(-1).mean()
        loss = l_rank + l_ctx + l_clu
        loss.backward()
        opt.step()
        return float(loss.detach())

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return s["B"] * s["T"] / dt, dt


def get_baseline(s, remeasure=False, cached_only=False):
    key = "x".join(str(s[k]) for k in sorted(s))
    cache = {}
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as fh:
            cache = json.load(fh)
    if key in cache and not remeasure:
        return cache[key]
    if cached_only:
        return None
    fps, dt = bench_torch(s)
    cache[key] = {"frames_per_sec": fps, "step_sec": dt}
    try:
        with open(BASELINE_CACHE, "w") as fh:
            json.dump(cache, fh, indent=2)
    except OSError:
        pass
    return cache[key]


def _guarded_serve_scan(call, b, wkey, steps_per_call, all_outputs=True):
    """ONE definition of the serving-bench measurement guards, shared by
    the live-jit (make_serve_program) and AOT-artifact
    (make_artifact_serve_program) builders — each guard has caught a real
    measurement hole before (r3 region-only DCE, r4 LICM hoisting; docs/
    PERF.md), so a future guard fix must reach every program builder at
    once. `call(p, feats, wid) -> out dict` closes over the rest of the
    batch. Guards: (a) LICM — never-taken selects on the int carry
    perturb the word ids AND the projection weight, so nothing in the
    body is loop-invariant; (b) DCE — EVERY serving output reduces into
    the carry (all_outputs=False reproduces the r3 hole for A/B only)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def serves(params, feats):
        def body(acc, _):
            wid = jnp.asarray(b["word_ids"])
            wid = jnp.where(acc < -1, wid + 1, wid)
            eps = jnp.where(acc < -1, 1.0, 0.0)
            p = dict(params)
            p[wkey] = params[wkey] + eps.astype(params[wkey].dtype)
            out = call(p, feats, wid)
            r = jnp.sum(out["region"])
            if all_outputs:
                live = (jnp.sum(out["box"]) + jnp.sum(out["beta"])
                        + jnp.sum(out["score"]) + jnp.sum(out["video_score"]))
                r = r + live.astype(jnp.int32)
            return acc + r, None
        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.int32), None,
                              length=steps_per_call)
        return acc

    return serves


def _time_serves(serves, params, feats, frames_per_step, iters,
                 steps_per_call):
    """Shared compile + best-of-4 scan timing for the serve programs,
    bounded by a real device->host fetch (see bench_jax's notes).
    Returns sec/step."""
    _PROGRESS["stage"] = "compile"
    int(serves(params, feats))
    ncalls = max(1, iters // steps_per_call)
    _PROGRESS["stage"] = "measure"
    best = float("inf")
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(ncalls):
            acc = serves(params, feats)
        int(acc)                      # real device->host fetch bounds it
        best = min(best, time.perf_counter() - t0)
        _PROGRESS["value"] = round(
            frames_per_step * ncalls * steps_per_call / best, 1)
    return best / (ncalls * steps_per_call)


def make_serve_program(s, steps_per_call, all_outputs=True, quantize=None):
    """The guarded serving-bench program: (jitted serves, params, feats).
    Factored out so tests can inspect the optimized HLO for the two
    measurement-integrity guards (carry-dependence vs LICM, all-outputs
    reduction vs DCE). all_outputs=False reproduces the r3 DCE hole
    (region-only reduction) for within-process A/B quantification only.
    quantize="int8": the int8-COMPUTE serving program (model.quantize=int8;
    the LICM guard perturbs the int8 weights so the quantized dot stays
    carry-dependent — perturbing only the f32 scale would leave the dot
    itself hoistable, since it consumes loop-invariant q and feats)."""
    import jax
    import jax.numpy as jnp

    from nafae_tpu.config import load_config
    from nafae_tpu.models.grounding import init_params
    from nafae_tpu.serve import make_ground_fn

    cfg = load_config(preset_name="config1", overrides=[
        f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
        "model.dtype=bfloat16", "model.matmul_precision=default"]
        + (["model.quantize=int8"] if quantize in ("int8", "int8pre")
           else []))
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    if quantize in ("int8", "int8pre"):
        from nafae_tpu.ops.grounding import quantize_params_int8
        params = quantize_params_int8(params)
    fn = make_ground_fn(cfg)
    b = make_batch(s)
    feats_scale = None
    if quantize == "int8pre":
        # the OFFLINE int8 feature path: features stored/transferred int8
        # (extract-once), so the serving program reads 1/4 the HBM bytes
        # AND runs the int8 MXU dot — quantization cost paid off-path
        from nafae_tpu.ops.grounding import quantize_feats_int8
        qf, sf = quantize_feats_int8(jnp.asarray(b["feats"]))
        feats = jax.device_put(qf)
        feats_scale = jax.device_put(sf)
    else:
        feats = jax.device_put(b["feats"])
    wkey = "w_v.q8" if quantize in ("int8", "int8pre") else "w_v"

    def call(p, fts, wid):
        return fn(p, fts, jnp.asarray(b["boxes"]), wid,
                  jnp.asarray(b["frame_mask"]),
                  jnp.asarray(b["word_mask"]),
                  jnp.asarray(b["region_mask"]),
                  feats_scale=feats_scale)

    serves = _guarded_serve_scan(call, b, wkey, steps_per_call,
                                 all_outputs=all_outputs)
    return serves, params, feats


def make_artifact_serve_program(artifact_dir, steps_per_call):
    """The guarded serving-bench program over an AOT-exported artifact
    (VERDICT r4 #4: every recorded serve number measured the live-jit
    path; this measures the StableHLO program a deployment host runs).
    Same LICM guard (carry-dependent w_v perturbation) and DCE guard
    (all outputs reduced into the carry) as make_serve_program. Returns
    (serves, params, feats, s) with s derived from the artifact manifest
    so flops/MFU use the artifact's own shapes. An int8pre artifact
    (manifest model.compute_quantize == "int8pre") is fed its own calling
    convention: pre-quantized int8 features + per-region scales."""
    import jax
    import jax.numpy as jnp

    from nafae_tpu.serve import load_exported

    call, man = load_exported(artifact_dir)
    exported, params = call.exported, call.params
    s = dict(B=man["batch_size"], T=man["max_frames"],
             R=man["num_regions"], D=man["feat_dim"], K=man["max_words"],
             E=man["model"]["embed_dim"], V=man["model"]["vocab_size"],
             KC=67, W=3)
    b = make_batch(s)
    # surfaced in the emitted record so an int8pre-artifact measurement is
    # distinguishable from an f32 one by more than its directory path
    s["COMPUTE_QUANTIZE"] = man["model"].get("compute_quantize") or None
    if s["COMPUTE_QUANTIZE"] == "int8pre":
        from nafae_tpu.ops.grounding import quantize_feats_int8
        qf, sf = quantize_feats_int8(jnp.asarray(b["feats"]))
        feats = jax.device_put(qf)
        # the exported calling convention takes [B,T,R] scales (the wire
        # format); quantize_feats_int8 returns [B,T,R,1]
        extra = (jax.device_put(sf[..., 0]),)
    else:
        feats = jax.device_put(b["feats"])
        extra = ()
    wkey = "w_v.q8" if "w_v.q8" in params else "w_v"

    def call(p, fts, wid):
        return exported.call(p, fts, jnp.asarray(b["boxes"]), wid,
                             jnp.asarray(b["frame_mask"]),
                             jnp.asarray(b["word_mask"]),
                             jnp.asarray(b["region_mask"]), *extra)

    serves = _guarded_serve_scan(call, b, wkey, steps_per_call)
    return serves, params, feats, s


def bench_artifact_serve(artifact_dir, iters=256, steps_per_call=256):
    """Serving throughput of the AOT artifact (bench --mode serve
    --artifact DIR). Returns (fps, dt, s)."""
    steps_per_call = max(1, min(steps_per_call, iters))
    serves, params, feats, s = make_artifact_serve_program(
        artifact_dir, steps_per_call)
    dt = _time_serves(serves, params, feats, s["B"] * s["T"], iters,
                      steps_per_call)
    return s["B"] * s["T"] / dt, dt, s


def bench_jax_serve(s, iters=256, steps_per_call=256, quantize=None):
    """Serving throughput: the nafae_tpu.serve program (similarity +
    argmax region + one-hot box select + frame attention/β + scores),
    bf16 compute — the per-batch work GroundingServer/the AOT artifact
    does, minus host JSON. Same scan + carry-dependence + best-of-4
    protocol as bench_jax_eval, plus the all-outputs DCE guard (see
    make_serve_program). quantize: None | "int8" (dynamic) | "int8pre"
    (offline-quantized features)."""
    steps_per_call = max(1, min(steps_per_call, iters))
    serves, params, feats = make_serve_program(s, steps_per_call,
                                               quantize=quantize)
    dt = _time_serves(serves, params, feats, s["B"] * s["T"], iters,
                      steps_per_call)
    return s["B"] * s["T"] / dt, dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    # 2048 iters at steps_per_call=256 = 8 scan calls per timing, so the
    # ~30 ms tunnel round-trip of the bounding fetch amortizes to ~15
    # us/step (1024 -> ~29, 256 -> ~117 — measurement, not compute). The
    # scan length (and thus the compiled program) is unchanged; the extra
    # wall cost is ~4 s across the best-of-4 repeats.
    p.add_argument("--iters", type=int, default=2048)
    p.add_argument("--kernels", choices=("auto", "pallas", "jnp"),
                   default="auto",
                   help="kernel routing: auto = XLA cross path + Pallas "
                        "banded ctx (measured-best mix); pallas = both "
                        "fused kernels; jnp = pure-XLA")
    p.add_argument("--no-pallas", action="store_true",
                   help="alias for --kernels jnp")
    p.add_argument("--remeasure-baseline", action="store_true")
    p.add_argument("--mode", choices=("train", "eval", "e2e", "serve"),
                   default="train",
                   help="e2e = config-5 inline step (frames -> frozen "
                        "detector -> fused losses in one XLA program); "
                        "serve = the nafae_tpu.serve inference program")
    p.add_argument("--quantize", dest="serve_quantize", default=None,
                   choices=("int8", "int8pre"),
                   help="with --mode serve: measure the int8-COMPUTE "
                        "program (dynamic activation quantization) or the "
                        "offline pre-quantized-features form (int8pre)")
    p.add_argument("--artifact", default=None, metavar="DIR",
                   help="with --mode serve: measure the AOT-exported "
                        "artifact in DIR (nafae-serve --export) instead of "
                        "the live-jit program; shapes/FLOPs come from the "
                        "artifact manifest")
    p.add_argument("--battery", dest="battery", action="store_true",
                   default=None,
                   help="after the train headline, also measure + emit one "
                        "JSON line per other mode (eval/serve/serve_int8pre/"
                        "e2e), then repeat the headline as the final line — "
                        "the driver's BENCH artifact notarizes all five "
                        "modes (default: on for full train runs, off for "
                        "--quick)")
    p.add_argument("--no-battery", dest="battery", action="store_false")
    args = p.parse_args()
    s = QUICK if args.quick else SHAPES
    _PROGRESS["metric"] = _MODE_METRICS[args.mode]
    if args.mode == "serve" and args.serve_quantize == "int8pre":
        # standalone confirmation runs (bench_battery.sh serve_int8pre)
        # must share the in-process battery line's metric name, not the
        # bf16 serve one it would otherwise be conflated with
        _PROGRESS["metric"] = _MODE_METRICS["serve_int8pre"]
    # honor NAFAE_PLATFORM=cpu for off-chip smoke runs (pair with
    # NAFAE_BENCH_ALLOW_CPU=1): without the config-level override, the
    # first jax import below initializes the TPU backend — which HANGS for
    # hours during tunnel outages even when the caller wanted CPU
    from nafae_tpu.utils import apply_platform_override
    apply_platform_override()
    _PROGRESS["stage"] = "tpu_acquire"
    _require_tpu()
    import jax
    on_tpu = jax.default_backend() == "tpu"
    from nafae_tpu.utils import enable_compilation_cache
    enable_compilation_cache()

    def _mfu(flops, dt):
        if flops is None or not on_tpu:
            return None
        return round(flops / dt / PEAK_FLOPS, 4)

    if args.mode == "serve":
        if args.artifact:
            if args.serve_quantize:
                p.error("--quantize has no effect with --artifact: the "
                        "artifact's manifest fixes its compute form "
                        "(export with model.quantize=... instead)")
            fps, dt, s_art = bench_artifact_serve(args.artifact,
                                                  iters=args.iters)
            aq = s_art.get("COMPUTE_QUANTIZE")
            if aq == "int8pre":
                _PROGRESS["metric"] = _MODE_METRICS["serve_int8pre"]
            _emit({
                "value": round(fps, 1),
                "vs_baseline": None,
                "step_us": round(dt * 1e6, 1),
                "flops_per_step": serve_step_flops(s_art),
                "mfu": _mfu(serve_step_flops(s_art), dt),
                "artifact": args.artifact,
                **({"quantize": aq} if aq else {}),
            })
            return
        fps, dt = bench_jax_serve(s, iters=args.iters,
                                  quantize=args.serve_quantize)
        out = {
            "value": round(fps, 1),
            "vs_baseline": None,
            "step_us": round(dt * 1e6, 1),
            "flops_per_step": serve_step_flops(s),
            "mfu": _mfu(serve_step_flops(s), dt),
        }
        if args.serve_quantize:
            # MFU against the bf16 peak over the SAME analytic FLOPs —
            # comparable to the f32/bf16 serve number, not re-rated to
            # the int8 peak (report the quantize mode so the reader knows)
            out["quantize"] = args.serve_quantize
        _emit(out)
        return

    if args.mode == "eval":
        fps, dt = bench_jax_eval(s, iters=args.iters)
        _emit({
            "value": round(fps, 1),
            "vs_baseline": None,
            "step_us": round(dt * 1e6, 1),
            "flops_per_step": eval_step_flops(s),
            "mfu": _mfu(eval_step_flops(s), dt),
        })
        return

    if args.mode == "e2e":
        kw = dict(iters=args.iters)
        if args.no_pallas or args.kernels != "auto":
            kw["kernels"] = "jnp" if args.no_pallas else args.kernels
        if args.quick:
            kw.update(image_size=128, b=1, t=4, steps_per_call=16)
        fps, dt, loss = bench_inline(**kw)
        # detector conv FLOPs come from XLA's cost analysis of the measured
        # program (scan body counted once ≈ one step) — too fiddly to
        # hand-count across the backbone
        flops = (cost_analysis_flops(_LAST_PROGRAM[0], *_LAST_PROGRAM[1])
                 if _LAST_PROGRAM else None)
        _emit({
            "value": round(fps, 1),
            "vs_baseline": None,
            "step_us": round(dt * 1e6, 1),
            "flops_per_step": flops,
            "mfu": _mfu(flops, dt),
        })
        return

    # torch baseline first when cached (instant) so a kill mid-measurement
    # can still report vs_baseline; fresh measurement happens after the jax
    # number exists
    base = get_baseline(s, remeasure=args.remeasure_baseline,
                        cached_only=True)
    if base:
        _PROGRESS["_baseline_fps"] = base["frames_per_sec"]
    fps, dt, loss = bench_jax(s, iters=args.iters,
                              kernels="jnp" if args.no_pallas
                              else args.kernels)
    if base is None:
        _PROGRESS["stage"] = "torch_baseline"
        base = get_baseline(s, remeasure=args.remeasure_baseline)
    flops = train_step_flops(s)
    _emit({
        "value": round(fps, 1),
        "vs_baseline": round(fps / base["frames_per_sec"], 2),
        "step_us": round(dt * 1e6, 1),
        "flops_per_step": flops,
        "mfu": _mfu(flops, dt),
    })

    # ---- four-mode notarization battery (VERDICT r3 #4) -------------------
    # The headline above is out; now measure the other three modes in THIS
    # process (still under the deadline watchdog — _finalize prints stub
    # lines for anything unmeasured) and repeat the headline as the final
    # line so the driver's parsed record stays the train metric whichever
    # end of the tail it reads.
    global _BATTERY_FINAL_REPRINT
    battery = args.battery if args.battery is not None else not args.quick
    if battery:
        _BATTERY_PENDING.extend(["eval", "serve", "serve_int8pre", "e2e"])
        _BATTERY_FINAL_REPRINT = True
        for mode in ("eval", "serve", "serve_int8pre"):
            _PROGRESS["stage"] = f"battery_{mode}"
            try:
                if mode == "eval":
                    bfps, bdt = bench_jax_eval(s, iters=args.iters)
                    bflops = eval_step_flops(s)
                    extra = {}
                else:
                    q = "int8pre" if mode == "serve_int8pre" else None
                    bfps, bdt = bench_jax_serve(s, iters=args.iters,
                                                quantize=q)
                    # int8pre MFU stays rated against the bf16 peak over
                    # the same analytic FLOPs (comparable to the bf16
                    # serve line; see --quantize help)
                    bflops = serve_step_flops(s)
                    extra = {"quantize": q} if q else {}
                _emit_battery_line(mode, {
                    "value": round(bfps, 1),
                    "step_us": round(bdt * 1e6, 1),
                    "flops_per_step": bflops,
                    "mfu": _mfu(bflops, bdt), **extra})
            except Exception as e:
                _emit_battery_line(mode, {"error": f"{type(e).__name__}: {e}"})
        _PROGRESS["stage"] = "battery_e2e"
        try:
            kw = dict(iters=min(args.iters, 1024))
            if args.quick:
                kw.update(image_size=64, b=1, t=2, steps_per_call=4)
            bfps, bdt, _ = bench_inline(**kw)
            bflops = (cost_analysis_flops(_LAST_PROGRAM[0], *_LAST_PROGRAM[1])
                      if _LAST_PROGRAM else None)
            _emit_battery_line("e2e", {
                "value": round(bfps, 1),
                "step_us": round(bdt * 1e6, 1),
                "flops_per_step": bflops,
                "mfu": _mfu(bflops, bdt)})
        except Exception as e:
            _emit_battery_line("e2e", {"error": f"{type(e).__name__}: {e}"})
        print(json.dumps(_HEADLINE))
        sys.stdout.flush()


if __name__ == "__main__":
    main()
    # the axon client's interpreter-exit teardown can hang after the chip
    # was used (observed: JSON printed, process alive minutes later). The
    # bench holds no state worth cleaning up — exit hard once the result
    # is out.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(0)
