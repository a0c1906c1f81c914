"""Training integration tests: DP parity, loss decrease, accuracy improvement,
checkpoint resume (SURVEY.md §5 items 3-5)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafae_tpu.config import load_config
from nafae_tpu.data import BatchLoader, SegmentDataset
from nafae_tpu.parallel import make_mesh
from nafae_tpu.train import TrainState, build_train_fn, fit

OV = ["data.feat_dim=64", "model.feat_dim=64", "model.embed_dim=32",
      "data.batch_size=8", "data.max_frames=8", "data.num_regions=6",
      "data.max_words=3", "loss.num_clusters=8", "loss.kmeans_interval=5",
      "train.warmup_steps=5", "train.log_every=1000", "train.ckpt_every=1000000",
      "train.eval_every=1000000"]


def _cfg(synth_root, preset="config4", extra=()):
    return load_config(preset_name=preset,
                       overrides=OV + [f"data.root={synth_root}"] + list(extra))


def _first_batch(synth_root, cfg):
    ds = SegmentDataset(synth_root, "train", cfg.data.max_frames,
                        cfg.data.num_regions, cfg.data.feat_dim,
                        cfg.data.max_words)
    return next(iter(BatchLoader(ds, cfg.data.batch_size, shuffle=True, seed=0)))


def test_dp_matches_single_device(synth_root):
    """8-device shard_map step == single-device step, bitwise-close."""
    cfg = _cfg(synth_root)
    batch = _first_batch(synth_root, cfg)
    s1, m1 = build_train_fn(cfg, None)(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    s8, m8 = build_train_fn(cfg, make_mesh())(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m8[k]),
                                   rtol=2e-4, atol=1e-5)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s8.params[k]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(s1.centers), np.asarray(s8.centers),
                               atol=1e-5)


def test_dp_collectives_stay_small(synth_root):
    """Communication audit of the compiled 8-device DP step: the design
    claim is that only the word embeddings and the score diagonal cross
    ICI (plus grad/k-means psums) — never region/feature tensors. Parse
    the optimized HLO's collective ops and bound each one's payload:
    per-device feats here are 1x8x6x2048 f32 = 393 KB, so a 128 KB cap
    fails loudly if a refactor ever all-gathers activations. At the real
    D=2048/T=20/R=20 shapes the guarded mistake would be ~13 MB/step."""
    cfg = _cfg(synth_root, extra=["data.feat_dim=2048", "model.feat_dim=2048"])
    rng = np.random.RandomState(0)
    b, t, r, k = 8, 8, 6, 3
    batch = {
        "feats": rng.randn(b, t, r, 2048).astype(np.float32),
        "boxes": np.abs(rng.rand(b, t, r, 4)).astype(np.float32),
        "word_ids": rng.randint(0, 67, (b, k)).astype(np.int32),
        "frame_mask": np.ones((b, t), np.float32),
        "word_mask": np.ones((b, k), np.float32),
        "region_mask": np.ones((b, t, r), np.float32),
        "segment_id": np.arange(b, dtype=np.int32),
    }
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    fn = build_train_fn(cfg, make_mesh())
    txt = fn.lower(state, batch).compile().as_text()
    from nafae_tpu.utils.profiling import collective_payloads
    entries = collective_payloads(txt)
    # cap: above the legit DP param-grad psums (w_v [2048,32] f32
    # = 262 KB is inherent to data parallelism) and far below a
    # region-feature gather (13 MB here)
    offenders = [(op, shapes[:80], payload) for op, shapes, payload
                 in entries if payload > 1024 * 1024]
    seen = len(entries)
    assert seen >= 5, f"only {seen} collectives found — really sharded?"
    assert not offenders, (
        f"oversized collectives in the DP step: {offenders}")


def test_loss_decreases(synth_root, tmp_path):
    cfg = _cfg(synth_root, extra=[f"train.ckpt_dir={tmp_path}/ck",
                                  "train.steps=30", "train.lr=0.003"])
    logs = []
    cfg2 = _cfg(synth_root, extra=[f"train.ckpt_dir={tmp_path}/ck",
                                   "train.steps=30", "train.lr=0.003",
                                   "train.log_every=5"])
    _, _ = fit(cfg2, log_fn=logs.append)
    assert len(logs) >= 4
    first, last = logs[0]["loss"], logs[-1]["loss"]
    assert last < first, f"loss did not decrease: {first} -> {last}"


def test_training_improves_box_accuracy(synth_root, tmp_path):
    from nafae_tpu.evaluate import evaluate_config
    cfg = _cfg(synth_root, preset="config2",
               extra=[f"train.ckpt_dir={tmp_path}/ck2", "train.steps=800",
                      "train.lr=0.02", "train.warmup_steps=20",
                      "loss.margin=0.5", "model.frame_attn_temp=1.0"])
    state0 = TrainState.create(jax.random.PRNGKey(0), cfg)
    before = evaluate_config(cfg, params=state0.params)["box_acc_micro"]
    state, _ = fit(cfg)
    after = evaluate_config(cfg, params=state.params)["box_acc_micro"]
    assert after > before + 0.2, f"accuracy {before:.3f} -> {after:.3f}"


def test_checkpoint_resume(synth_root, tmp_path):
    from nafae_tpu.utils.checkpoint import CheckpointManager
    cfg = _cfg(synth_root, extra=[f"train.ckpt_dir={tmp_path}/ck3",
                                  "train.steps=4"])
    state, _ = fit(cfg)
    assert int(state.step) == 4
    # restore into a fresh template
    template = TrainState.create(jax.random.PRNGKey(42), cfg)
    mgr = CheckpointManager(cfg.train.ckpt_dir)
    restored = mgr.restore_latest(template)
    assert restored is not None and int(restored.step) == 4
    for k in state.params:
        np.testing.assert_allclose(np.asarray(restored.params[k]),
                                   np.asarray(state.params[k]), atol=1e-7)
    # resuming continues from step 4
    cfg2 = _cfg(synth_root, extra=[f"train.ckpt_dir={tmp_path}/ck3",
                                   "train.steps=6"])
    state2, _ = fit(cfg2)
    assert int(state2.step) == 6


def test_eval_discriminates(synth_root):
    """Planted-signal oracle params score high; random params score ~0."""
    from nafae_tpu.data.synthetic import _class_directions
    from nafae_tpu.evaluate import evaluate_config
    cfg = _cfg(synth_root, preset="config1")
    state = TrainState.create(jax.random.PRNGKey(1), cfg)
    rnd = evaluate_config(cfg, params=state.params)
    dirs = _class_directions(67, 64)
    w = dirs.T[:, :32].astype(np.float32)
    oracle = {"word_emb": jnp.asarray(dirs @ w), "w_v": jnp.asarray(w),
              "b_v": jnp.zeros(32)}
    good = evaluate_config(cfg, params=oracle)
    assert good["box_acc_micro"] > 0.7
    assert good["box_acc_micro"] > rnd["box_acc_micro"] + 0.4
    assert good["num_annotations"] == rnd["num_annotations"] > 0
    assert 0 < good["num_classes_seen"] <= 67


def test_flax_wrapper_matches_functional(synth_root):
    """GroundingModel (flax) == ground_forward with the same params."""
    import jax.numpy as jnp

    from nafae_tpu.models.grounding import GroundingModel
    from nafae_tpu.ops.grounding import ground_forward
    cfg = _cfg(synth_root)
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 4, 6, 64).astype(np.float32))
    wid = jnp.asarray(rng.randint(0, 67, (2, 3)))
    fm, wm = jnp.ones((2, 4)), jnp.ones((2, 3))
    model = GroundingModel(cfg.model, ctx_window=2)
    variables = model.init(jax.random.PRNGKey(0), feats, wid, fm, wm)
    out_flax = model.apply(variables, feats, wid, fm, wm)
    out_fn = ground_forward(variables["params"], feats, wid, fm, wm,
                            temp=cfg.model.frame_attn_temp,
                            pool=cfg.model.frame_pool, ctx_window=2)
    np.testing.assert_allclose(np.asarray(out_flax["score"]),
                               np.asarray(out_fn["score"]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out_flax["s"]),
                               np.asarray(out_fn["s"]), rtol=1e-6)


def test_training_with_frame_buckets(synth_root, tmp_path):
    """Multi-bucket training runs (one jit specialization per bucket)."""
    cfg = _cfg(synth_root, extra=[f"train.ckpt_dir={tmp_path}/bk",
                                  "train.steps=6", "data.frame_buckets=[4,8]"])
    state, metrics = fit(cfg)
    assert int(state.step) == 6
    assert np.isfinite(float(metrics["loss"]))


def test_device_cache_training(synth_root, tmp_path):
    """HBM-resident dataset path trains and matches the loss trend."""
    cfg = _cfg(synth_root, extra=[f"train.ckpt_dir={tmp_path}/dc",
                                  "train.steps=8", "train.device_cache=true",
                                  "train.steps_per_call=2"])
    state, metrics = fit(cfg)
    assert int(state.step) == 8
    assert np.isfinite(float(metrics["loss"]))


def test_device_cache_exact_step_target(synth_root, tmp_path):
    """steps not a multiple of steps_per_call: the cached path's last call
    shrinks its scan to the remainder instead of overshooting (r2 review
    fix), and a rerun on a completed dir trains zero extra steps."""
    cfg = _cfg(synth_root, extra=[f"train.ckpt_dir={tmp_path}/dt",
                                  "train.steps=7", "train.device_cache=true",
                                  "train.steps_per_call=3"])
    state, _ = fit(cfg)
    assert int(state.step) == 7
    state2, _ = fit(cfg)    # already complete: restore and do nothing
    assert int(state2.step) == 7


def test_fit_reaches_exact_target_with_partial_group(synth_root, tmp_path):
    """steps not a multiple of steps_per_call: the tail applies the leftover
    yielded batches one-by-one so fit() reaches exactly cfg.train.steps —
    and a resume from the flush boundary makes progress instead of spinning."""
    cfg = _cfg(synth_root, extra=["train.steps=10", "train.steps_per_call=4",
                                  f"train.ckpt_dir={tmp_path}/pt"])
    state, _ = fit(cfg)
    assert int(state.step) == 10
    cfg2 = _cfg(synth_root, extra=["train.steps=13", "train.steps_per_call=4",
                                   f"train.ckpt_dir={tmp_path}/pt"])
    state2, _ = fit(cfg2)     # resumes from 10, must reach 13 (not spin at 10)
    assert int(state2.step) == 13
    # re-running a completed dir must train ZERO extra steps (r2 review
    # fix: the spc==1 apply path used to run one step before checking)
    cfg3 = _cfg(synth_root, extra=["train.steps=13", "train.steps_per_call=1",
                                   f"train.ckpt_dir={tmp_path}/pt"])
    state3, _ = fit(cfg3)
    assert int(state3.step) == 13


def test_device_cache_resume_continues_index_stream(synth_root, tmp_path):
    """Interrupted device_cache run == uninterrupted run: the on-device
    index stream fast-forwards past the checkpointed position on resume."""
    base = ["train.device_cache=true", "train.steps_per_call=2",
            "train.ckpt_every=4"]
    cfg_full = _cfg(synth_root, extra=base + ["train.steps=8",
                                              f"train.ckpt_dir={tmp_path}/f"])
    s_full, _ = fit(cfg_full)
    cfg_half = _cfg(synth_root, extra=base + ["train.steps=4",
                                              f"train.ckpt_dir={tmp_path}/h"])
    fit(cfg_half)
    cfg_rest = _cfg(synth_root, extra=base + ["train.steps=8",
                                              f"train.ckpt_dir={tmp_path}/h"])
    s_rest, _ = fit(cfg_rest)
    assert int(s_rest.step) == 8
    for k in s_full.params:
        np.testing.assert_allclose(np.asarray(s_rest.params[k]),
                                   np.asarray(s_full.params[k]), atol=1e-6,
                                   err_msg=k)


def test_device_cache_mesh_matches_single_device(synth_root, tmp_path):
    """device_cache under a DP×SP mesh == the single-device cached run
    (same seed -> same on-device index sequence -> same updates)."""
    from nafae_tpu.parallel import make_mesh
    extra = ["train.steps=6", "train.device_cache=true",
             "train.steps_per_call=3"]
    cfg1 = _cfg(synth_root, extra=extra + [f"train.ckpt_dir={tmp_path}/dc1"])
    s1, m1 = fit(cfg1)
    cfg2 = _cfg(synth_root, extra=extra + [f"train.ckpt_dir={tmp_path}/dc2",
                                           "mesh.data_axis=4",
                                           "mesh.frame_axis=2"])
    mesh = make_mesh(4, 2)
    s2, m2 = fit(cfg2, mesh=mesh)
    assert int(s2.step) == 6
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=3e-4, atol=1e-5, err_msg=k)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s2.params[k]), atol=2e-6,
                                   err_msg=k)


def test_tail_loop_fires_eval_once_per_interval(synth_root, tmp_path):
    """The stride-1 tail must not re-fire eval/ckpt on consecutive steps
    (the old `% max(every, spc) < spc` window test ran a full val eval up
    to spc times in a row at the end of a run)."""
    calls = []
    cfg = _cfg(synth_root, extra=[
        "train.steps=12", "train.steps_per_call=8", "train.eval_every=10",
        "train.log_every=1000", "train.ckpt_every=1000000",
        f"train.ckpt_dir={tmp_path}/tl"])
    state, _ = fit(cfg, eval_fn=lambda s: calls.append(int(s.step)))
    assert int(state.step) == 12
    assert calls == [10], calls     # exactly one firing, at the interval



def test_opt_flat_matches_tree_optimizer(synth_root):
    """train.OPT_FLAT (optax.flatten over one raveled vector) applies the
    same clip+adamw update as the per-leaf tree form: elementwise math is
    identical, only the global-norm reduction order differs, so params
    after two steps agree to f32 reduction tolerance."""
    import nafae_tpu.train as TR
    cfg = _cfg(synth_root)
    batch = _first_batch(synth_root, cfg)

    def run(flag):
        old = TR.OPT_FLAT
        TR.OPT_FLAT = flag
        try:
            step = build_train_fn(cfg, None)
            st = TrainState.create(jax.random.PRNGKey(0), cfg)
            for _ in range(2):
                st, m = step(st, batch)
            return st, m
        finally:
            TR.OPT_FLAT = old

    s0, m0 = run(False)
    s1, m1 = run(True)
    # the flag engaged: adam moments live in ONE raveled [P] vector
    nparams = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(s0.params))
    flat_leaves = [l for l in jax.tree.leaves(s1.opt_state)
                   if getattr(l, "shape", None) == (nparams,)]
    assert flat_leaves, "OPT_FLAT did not flatten the optimizer state"
    assert jax.tree.structure(s0.params) == jax.tree.structure(s1.params)
    for k in s0.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s0.params[k]), atol=1e-6,
                                   err_msg=k)
    np.testing.assert_allclose(float(m1["loss"]), float(m0["loss"]),
                               rtol=1e-5)


def test_scoped_vmem_knob_is_math_neutral(synth_root):
    """train.scoped_vmem_kib only changes compiler options (TPU) and the
    ctx-kernel gate envelope — never the math. On CPU the option is
    dropped (the backend rejects unknown flags) and the train step must be
    bitwise identical to the default config's."""
    from nafae_tpu.train import build_train_fn, jit_compiler_options
    base = load_config(preset_name="config3", overrides=[
        "data.feat_dim=64", "model.feat_dim=64", "model.embed_dim=16",
        "data.batch_size=4", "data.max_frames=8", "train.steps=1",
        f"data.root={synth_root}"])
    knob = load_config(preset_name="config3", overrides=[
        "data.feat_dim=64", "model.feat_dim=64", "model.embed_dim=16",
        "data.batch_size=4", "data.max_frames=8", "train.steps=1",
        "train.scoped_vmem_kib=65536", f"data.root={synth_root}"])
    assert jit_compiler_options(base) is None
    assert jit_compiler_options(knob) is None        # CPU: dropped
    import numpy as np

    from nafae_tpu.data import BatchLoader, SegmentDataset
    ds = SegmentDataset(synth_root, "train", 8, 6, 64, 3)
    batch = next(iter(BatchLoader(ds, 4, shuffle=False).epoch(0)))
    outs = []
    for cfg in (base, knob):
        state = TrainState.create(jax.random.PRNGKey(0), cfg)
        st, metrics = build_train_fn(cfg)(state, batch)
        outs.append(float(metrics["loss"]))
    assert outs[0] == outs[1], outs


def test_jit_compiler_options_tpu_content(monkeypatch):
    """On a TPU backend the knob becomes the XLA scoped-VMEM flag."""
    import nafae_tpu.train as T
    cfg = load_config(preset_name="config2",
                      overrides=["train.scoped_vmem_kib=65536"])
    monkeypatch.setattr(T.jax, "default_backend", lambda: "tpu")
    assert T.jit_compiler_options(cfg) == {
        "xla_tpu_scoped_vmem_limit_kib": "65536"}
