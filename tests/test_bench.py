"""Smoke tests for bench.py — the driver-run benchmark contract.

These run the real bench code paths at tiny shapes on CPU: the train
bench (scan protocol + baseline cache), the eval bench, the inline
config-5 bench, and the JSON output shape of main().
"""

import json
import os
import subprocess
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
import bench


def test_bench_jax_quick_runs():
    fps, dt, loss = bench.bench_jax(bench.QUICK, iters=2, steps_per_call=2,
                                    repeats=1)
    assert fps > 0 and dt > 0
    assert np.isfinite(loss)


def test_bench_eval_quick_runs():
    fps, dt = bench.bench_jax_eval(bench.QUICK, iters=2, steps_per_call=2)
    assert fps > 0 and dt > 0


def test_bench_inline_quick_runs():
    fps, dt, loss = bench.bench_inline(iters=1, steps_per_call=1,
                                       image_size=64, b=1, t=2)
    assert fps > 0
    assert np.isfinite(loss)


def test_serve_bench_outputs_survive_dce():
    """The serve-bench program must still CONTAIN the serving outputs'
    work after XLA optimization (r4 correction: reducing only
    out['region'] let dead-code elimination drop the box selection, the
    beta softmax and the scores — the 'serve' number was really
    sim+argmax only). Tripwire: the optimized HLO keeps the softmax
    (exp/divide) and at least the box-select contraction."""
    serves, params, feats = bench.make_serve_program(bench.QUICK,
                                                     steps_per_call=2)
    hlo = serves.lower(params, feats).compile().as_text()
    body = [l for l in hlo.splitlines() if " = " in l]
    n_exp = sum("exp" in l.split(" = ", 1)[1][:40] for l in body)
    n_div = sum("divide" in l.split(" = ", 1)[1][:40] for l in body)
    assert n_exp >= 1 and n_div >= 1, (n_exp, n_div)  # beta softmax alive
    n_dot = sum(("dot(" in l.split(" = ", 1)[1][:40]
                 or "dot." in l.split(" = ", 1)[1][:40]
                 or "convolution" in l.split(" = ", 1)[1][:60])
                for l in body)
    # projection + similarity + one-hot box select >= 3 contractions
    assert n_dot >= 3, n_dot


def test_artifact_serve_bench_guarded(tmp_path):
    """bench --mode serve --artifact: the guarded program over the
    deserialized StableHLO artifact must (a) keep the serving outputs
    alive after optimization (DCE guard) and (b) run, with shapes taken
    from the artifact manifest."""
    import jax

    from nafae_tpu.config import load_config
    from nafae_tpu.models.grounding import init_params
    from nafae_tpu.serve import export_grounding

    s = bench.QUICK
    cfg = load_config(preset_name="config1", overrides=[
        f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
        f"data.batch_size={s['B']}", f"data.max_frames={s['T']}",
        f"data.num_regions={s['R']}", f"data.feat_dim={s['D']}",
        f"data.max_words={s['K']}"])
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    d = export_grounding(cfg, params, str(tmp_path / "art"))
    serves, aparams, feats, s_art = bench.make_artifact_serve_program(d, 2)
    assert s_art["B"] == s["B"] and s_art["D"] == s["D"]
    hlo = serves.lower(aparams, feats).compile().as_text()
    body = [l for l in hlo.splitlines() if " = " in l]
    n_exp = sum("exp" in l.split(" = ", 1)[1][:40] for l in body)
    n_div = sum("divide" in l.split(" = ", 1)[1][:40] for l in body)
    assert n_exp >= 1 and n_div >= 1, (n_exp, n_div)   # beta softmax alive
    fps, dt, _ = bench.bench_artifact_serve(d, iters=4, steps_per_call=2)
    assert fps > 0 and dt > 0


def test_artifact_serve_bench_int8pre(tmp_path):
    """bench --mode serve --artifact on an int8pre-exported artifact: the
    manifest's compute_quantize drives the int8-feats + per-region-scales
    calling convention (the deployable +30% serving form must be
    benchable as the artifact a host actually runs, not just live-jit)."""
    import jax

    from nafae_tpu.config import load_config
    from nafae_tpu.models.grounding import init_params
    from nafae_tpu.serve import export_grounding

    s = bench.QUICK
    cfg = load_config(preset_name="config1", overrides=[
        f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
        "model.quantize=int8pre",
        f"data.batch_size={s['B']}", f"data.max_frames={s['T']}",
        f"data.num_regions={s['R']}", f"data.feat_dim={s['D']}",
        f"data.max_words={s['K']}"])
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    d = export_grounding(cfg, params, str(tmp_path / "i8p_art"))
    serves, aparams, feats, s_art = bench.make_artifact_serve_program(d, 2)
    assert feats.dtype == jax.numpy.int8          # artifact wire format
    assert "w_v.q8" in aparams
    hlo = serves.lower(aparams, feats).compile().as_text()
    body = [l for l in hlo.splitlines() if " = " in l]
    n_exp = sum("exp" in l.split(" = ", 1)[1][:40] for l in body)
    assert n_exp >= 1, n_exp                       # beta softmax alive
    fps, dt, _ = bench.bench_artifact_serve(d, iters=4, steps_per_call=2)
    assert fps > 0 and dt > 0


def test_analytic_flops_match_cost_analysis():
    """The analytic flops_per_step counts bench reports (the train/eval/
    serve MFU denominators) must track XLA's own cost_analysis of the
    compiled programs — every term is derived, none borrowed (VERDICT r4
    #5: serve now carries its own denominator incl. the one-hot box-select
    contraction). XLA additionally counts elementwise/VPU FLOPs the
    analytic model deliberately excludes, so the ratio sits slightly
    above 1 (measured on CPU at QUICK shapes: train 1.008, eval 1.011,
    serve 1.023)."""
    import jax
    import jax.numpy as jnp

    s = bench.QUICK

    # --- serve (the full make_serve_program, scan body counted once) ----
    serves, params, feats = bench.make_serve_program(s, steps_per_call=2)
    ca = bench.cost_analysis_flops(serves, params, feats)
    if ca is None:
        import pytest
        pytest.skip("backend does not expose cost_analysis")
    assert 0.95 <= ca / bench.serve_step_flops(s) <= 1.15, ca

    # --- eval (projection + similarity + grounding_hits) ----------------
    from nafae_tpu.config import load_config
    from nafae_tpu.models.grounding import init_params
    from nafae_tpu.ops import grounding as Gr
    from nafae_tpu.ops.iou import grounding_hits

    cfg = load_config(preset_name="config1", overrides=[
        f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}"])
    eparams = init_params(jax.random.PRNGKey(0), cfg.model)
    b = bench.make_batch(s)
    gt_boxes = np.zeros((s["B"], s["K"], s["T"], 4), np.float32)
    gt_mask = np.ones((s["B"], s["K"], s["T"]), np.float32)

    @jax.jit
    def ev(p, feats):
        w = Gr.embed_words(jnp.asarray(b["word_ids"]), p["word_emb"])
        v = Gr.project_regions(feats, p["w_v"], p["b_v"])
        sim = Gr.similarity_tensor(w, v)
        correct, _ = grounding_hits(sim, jnp.asarray(b["boxes"]),
                                    jnp.asarray(gt_boxes),
                                    jnp.asarray(gt_mask))
        return jnp.sum(correct)

    ca_e = bench.cost_analysis_flops(ev, eparams, jnp.asarray(b["feats"]))
    assert 0.95 <= ca_e / bench.eval_step_flops(s) <= 1.15, ca_e

    # --- train (full config-4 step, jnp kernels — the CPU-compilable
    # route; the analytic remat factors assume the same graph) -----------
    from nafae_tpu.train import TrainState, make_optimizer, make_train_step

    cfg4 = load_config(preset_name="config4", overrides=[
        f"model.feat_dim={s['D']}", f"model.embed_dim={s['E']}",
        f"data.batch_size={s['B']}", f"loss.num_clusters={s['KC']}",
        f"loss.ctx_window={s['W']}", "loss.kmeans_interval=100",
        "train.kernels=jnp"])
    step = make_train_step(cfg4, make_optimizer(cfg4))
    state = TrainState.create(jax.random.PRNGKey(0), cfg4)
    batch = {k: jnp.asarray(v) for k, v in bench.make_batch(s).items()}
    ca_t = bench.cost_analysis_flops(jax.jit(step), state, batch)
    assert 0.95 <= ca_t / bench.train_step_flops(s) <= 1.15, ca_t


def test_bench_torch_baseline_and_cache(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "BASELINE_CACHE",
                        str(tmp_path / "cache.json"))
    base = bench.get_baseline(bench.QUICK)
    assert base["frames_per_sec"] > 0
    # second call reads the cache (mutate the file to prove it)
    with open(bench.BASELINE_CACHE) as fh:
        cache = json.load(fh)
    key = next(iter(cache))
    cache[key]["frames_per_sec"] = 123.0
    with open(bench.BASELINE_CACHE, "w") as fh:
        json.dump(cache, fh)
    assert bench.get_baseline(bench.QUICK)["frames_per_sec"] == 123.0


def test_bench_main_json_contract():
    """`python bench.py --quick` prints ONE JSON line with the driver's
    required keys (metric/value/unit/vs_baseline)."""
    env = dict(os.environ)
    env["NAFAE_BENCH_ALLOW_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, "-c",
         # force CPU the only way that works under the axon plugin (config
         # update after import); redirect the baseline cache out of the repo
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys, tempfile, os;"
         "sys.argv=['bench.py','--quick','--iters','2','--kernels','jnp'];"
         "import bench;"
         "bench.BASELINE_CACHE=os.path.join(tempfile.mkdtemp(),'c.json');"
         "bench.main()"],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."), timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    # the 4 driver keys are required; extra perf fields (mfu, flops,
    # step_us) are allowed
    assert {"metric", "value", "unit", "vs_baseline"} <= set(out)
    assert out["value"] > 0
    assert out["flops_per_step"] > 0
    assert out["mfu"] is None  # CPU run: MFU only reported on TPU


def test_bench_battery_notarizes_all_modes():
    """A train run with --battery emits: headline, one line per other mode
    (eval/serve/serve_int8pre/e2e with value or error), then the headline
    REPEATED — so the driver's parsed record is the train metric whether it
    takes the first or the last JSON line of the tail (VERDICT r3 #4; the
    int8pre line notarizes the r5 deployable-quantized serving form)."""
    env = dict(os.environ)
    env["NAFAE_BENCH_ALLOW_CPU"] = "1"
    r = subprocess.run(
        [sys.executable, "-c",
         "import jax; jax.config.update('jax_platforms','cpu');"
         "import sys, tempfile, os;"
         "sys.argv=['bench.py','--quick','--iters','2','--kernels','jnp',"
         "'--battery'];"
         "import bench;"
         "bench.BASELINE_CACHE=os.path.join(tempfile.mkdtemp(),'c.json');"
         "bench.main()"],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."), timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    lines = [json.loads(l) for l in r.stdout.strip().splitlines()
             if l.startswith("{")]
    assert len(lines) == 6, lines
    assert lines[0] == lines[-1]                       # headline repeated
    assert lines[0]["metric"] == "grounding_train_frames_per_sec_per_chip"
    by_mode = {l["mode"]: l for l in lines[1:5]}
    assert set(by_mode) == {"eval", "serve", "serve_int8pre", "e2e"}
    assert by_mode["serve_int8pre"].get("quantize") == "int8pre" \
        or "error" in by_mode["serve_int8pre"]
    for mode, l in by_mode.items():
        assert {"metric", "value", "unit", "vs_baseline"} <= set(l), mode
        assert (l["value"] and l["value"] > 0) or "error" in l, l


def test_bench_emits_error_json_on_deadline():
    """A bench killed by its own deadline (the outage backstop: the driver's
    SIGTERM cannot interrupt a GIL-held C call, so a watchdog thread emits)
    still prints ONE parseable JSON line with the driver keys + an error."""
    env = dict(os.environ)
    env["NAFAE_BENCH_ALLOW_CPU"] = "1"
    env["NAFAE_BENCH_DEADLINE"] = "4"
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "bench.py", "--quick"],
        capture_output=True, text=True, env=env,
        cwd=os.path.join(os.path.dirname(__file__), ".."), timeout=120)
    line = [l for l in r.stdout.strip().splitlines() if l.startswith("{")][-1]
    out = json.loads(line)
    assert {"metric", "value", "unit", "vs_baseline"} <= set(out)
    # nothing measured in 4s -> value null + error recorded
    assert out["value"] is None
    assert "error" in out


def test_inline_scan_not_hoisted():
    """The frozen detector's inputs are loop-invariant across the bench
    scan; without the carry-dependent frames guard XLA hoists the whole
    detector out of the loop and the 'inline' rate measures one detector
    pass amortized over steps_per_call (the r2 108k-f/s inflation). With
    the guard, scanning 8x the steps must cost several times more."""
    import time as _time

    import jax

    from nafae_tpu.train import TrainState

    times = {}
    for spc in (1, 8):
        cfg, batch, multi = bench.make_inline_setup(
            b=1, t=2, image_size=64, steps_per_call=spc,
            overrides=["detector.image_size=64",
                       "detector.num_proposals=4",
                       "detector.rpn_pre_nms_topk=16"])
        state = TrainState.create(jax.random.PRNGKey(0), cfg)
        st, losses = multi(state, batch)
        jax.block_until_ready(losses)
        best = float("inf")
        for _ in range(3):
            t0 = _time.perf_counter()
            st, losses = multi(st, batch)
            jax.block_until_ready(losses)
            best = min(best, _time.perf_counter() - t0)
        times[spc] = best
    # hoisted: ratio ~1.9 at these shapes; honest: ~8. Threshold well apart.
    assert times[8] / times[1] > 3.5, times


def test_inline_jit_carries_compiler_options(monkeypatch):
    """make_inline_setup's outer jit must route through
    train.jit_compiler_options (the r5 scoped-VMEM knob) exactly like
    bench_jax does — otherwise `train.scoped_vmem_kib` silently does
    nothing for the inline/e2e program (scripts/ab_scoped.py)."""
    import nafae_tpu.train as T

    seen = []
    real = T.jit_compiler_options
    monkeypatch.setattr(T, "jit_compiler_options",
                        lambda cfg: seen.append(cfg) or real(cfg))
    bench.make_inline_setup(
        b=1, t=2, image_size=64,
        overrides=["detector.image_size=64", "detector.num_proposals=4",
                   "detector.rpn_pre_nms_topk=16",
                   "train.scoped_vmem_kib=65536"])
    assert len(seen) == 1 and seen[0].train.scoped_vmem_kib == 65536
