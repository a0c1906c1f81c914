"""Oracle parity for every docs/MATH.md [CHOICE] variant (VERDICT r2 #3).

Each [CHOICE] point is config-switchable so reaching reference parity (when
the mount appears) is a hyperparameter sweep, not a rewrite:

- model.frame_pool="learned": linear scorer on pooled region embeddings
- model.similarity: cosine | bilinear (learned M [E,E], identity init)
- loss.ctx_target: stopgrad | live | symmetric (same value, different grads)
- loss.rank_norm: pairs | hinges | batch
- loss.kmeans_ema: tested in test_ops.py::test_kmeans_ema

Values AND gradients are cross-checked against the torch oracle.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nafae_tpu.ops import grounding as G
from nafae_tpu.ops import losses as L
from tests import oracle_torch as O
from tests.test_oracle_parity import B, K, R, T, make_inputs, to_torch


def _learned_params(seed=3):
    params, feats, word_ids, fm, wm = make_inputs(seed=seed)
    rng = np.random.RandomState(seed + 100)
    params["attn_w"] = rng.randn(params["b_v"].shape[0]).astype(np.float32) * 0.2
    return params, feats, word_ids, fm, wm


def test_learned_pool_forward_matches_oracle():
    params, feats, word_ids, fm, wm = _learned_params()
    jout = G.ground_forward(params, jnp.asarray(feats), jnp.asarray(word_ids),
                            jnp.asarray(fm), jnp.asarray(wm),
                            temp=0.1, pool="learned")
    tout = O.forward({k: to_torch(v) for k, v in params.items()},
                     to_torch(feats), to_torch(word_ids), to_torch(fm),
                     to_torch(wm), temp=0.1, pool="learned")
    np.testing.assert_allclose(np.asarray(jout["beta"]), tout["beta"].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout["score"]), tout["score"].numpy(),
                               rtol=1e-4, atol=1e-5)


def test_learned_pool_gradients_match_oracle():
    """d(Σ score)/d{attn_w, w_v} : jax.grad vs torch autograd."""
    params, feats, word_ids, fm, wm = _learned_params(seed=4)

    def jloss(p):
        out = G.ground_forward(p, jnp.asarray(feats), jnp.asarray(word_ids),
                               jnp.asarray(fm), jnp.asarray(wm),
                               temp=0.1, pool="learned")
        return jnp.sum(out["score"])

    jgrad = jax.grad(jloss)({k: jnp.asarray(v) for k, v in params.items()})

    tparams = {k: to_torch(v).clone().requires_grad_(True)
               for k, v in params.items()}
    tout = O.forward(tparams, to_torch(feats), to_torch(word_ids),
                     to_torch(fm), to_torch(wm), temp=0.1, pool="learned")
    tout["score"].sum().backward()
    for k in ("attn_w", "w_v", "word_emb"):
        np.testing.assert_allclose(np.asarray(jgrad[k]),
                                   tparams[k].grad.numpy(),
                                   rtol=1e-3, atol=1e-5, err_msg=k)


def test_learned_pool_cross_scores_matches_oracle():
    params, feats, word_ids, fm, wm = _learned_params(seed=5)
    w_emb = G.embed_words(jnp.asarray(word_ids), jnp.asarray(params["word_emb"]))
    v_emb = G.project_regions(jnp.asarray(feats), jnp.asarray(params["w_v"]),
                              jnp.asarray(params["b_v"]))
    g = G.learned_frame_logits(v_emb, jnp.asarray(fm), None,
                               jnp.asarray(params["attn_w"]))
    rows = G.cross_scores(w_emb, jnp.asarray(wm), v_emb, jnp.asarray(fm),
                          temp=0.1, pool="learned", frame_logits=g)
    tmat = O.cross_scores({k: to_torch(v) for k, v in params.items()},
                          to_torch(feats), to_torch(word_ids), to_torch(fm),
                          to_torch(wm), temp=0.1, pool="learned")
    np.testing.assert_allclose(np.asarray(rows), tmat.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("target", ["stopgrad", "live", "symmetric"])
def test_ctx_target_values_and_grads_match_oracle(target):
    """All three targets share the VALUE (s−ŝ)²; gradients differ per mode.
    jax.grad wrt (s, ŝ) vs torch autograd through the oracle's .detach()."""
    rng = np.random.RandomState(7)
    s = rng.randn(B, K, T, R).astype(np.float32)
    shat = rng.randn(B, K, T, R).astype(np.float32)
    _, _, _, fm, wm = make_inputs(seed=7)
    nbr_valid = np.ones((B, T, 2), np.float32)
    nbr_valid[0, :2] = 0.0                      # some frames lack neighbors

    def jloss(s_, shat_):
        return L.context_loss(s_, shat_, jnp.asarray(wm), jnp.asarray(fm),
                              jnp.asarray(nbr_valid), target=target)

    jval = jloss(jnp.asarray(s), jnp.asarray(shat))
    jg_s, jg_h = jax.grad(jloss, argnums=(0, 1))(jnp.asarray(s),
                                                 jnp.asarray(shat))

    ts = to_torch(s).clone().requires_grad_(True)
    th = to_torch(shat).clone().requires_grad_(True)
    tval = O.context_loss(ts, th, to_torch(wm), to_torch(fm),
                          to_torch(nbr_valid), target=target)
    tval.backward()
    np.testing.assert_allclose(float(jval), float(tval.detach()), rtol=1e-5)
    tg_h = (th.grad.numpy() if th.grad is not None
            else np.zeros_like(shat))   # stopgrad: torch records no grad fn
    np.testing.assert_allclose(np.asarray(jg_s), ts.grad.numpy(),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(jg_h), tg_h,
                               rtol=1e-4, atol=1e-6)
    # mode semantics: stopgrad leaves ŝ gradient-free; the others do not
    if target == "stopgrad":
        assert float(jnp.abs(jg_h).max()) == 0.0
    else:
        assert float(jnp.abs(jg_h).max()) > 0.0


def test_ctx_target_values_identical_across_modes():
    rng = np.random.RandomState(8)
    s = jnp.asarray(rng.randn(2, 3, 4, 5).astype(np.float32))
    shat = jnp.asarray(rng.randn(2, 3, 4, 5).astype(np.float32))
    vals = [float(jnp.sum(L.ctx_squared_error(s, shat, t)))
            for t in ("stopgrad", "live", "symmetric")]
    np.testing.assert_allclose(vals[0], vals[1], rtol=1e-6)
    np.testing.assert_allclose(vals[0], vals[2], rtol=1e-6)


@pytest.mark.parametrize("norm", ["pairs", "hinges", "batch"])
def test_rank_norm_matches_oracle(norm):
    rng = np.random.RandomState(9)
    mat = rng.randn(5, 5).astype(np.float32)
    jval = L.ranking_loss(jnp.asarray(mat), margin=0.2, norm=norm)
    tval = O.ranking_loss(to_torch(mat), margin=0.2, norm=norm)
    np.testing.assert_allclose(float(jval), float(tval), rtol=1e-6)
    # row-shard form (single shard) agrees
    from nafae_tpu.parallel.sharding import ranking_loss_rows
    rv = ranking_loss_rows(jnp.asarray(mat), jnp.diagonal(jnp.asarray(mat)),
                           0, 0.2, norm=norm)
    np.testing.assert_allclose(float(rv), float(jval), rtol=1e-6)


def test_train_step_learned_pool_runs(synth_root):
    """End-to-end: a config-4 step with frame_pool=learned trains the new
    attn params (nonzero update) and matches the 8-device mesh run."""
    from nafae_tpu.config import load_config
    from nafae_tpu.parallel import make_mesh
    from nafae_tpu.train import TrainState, build_train_fn
    from tests.test_train import OV, _first_batch

    # warmup_steps=0: OV's warmup makes the first step's LR exactly 0, so
    # "params moved" would never hold
    cfg = load_config(preset_name="config4", overrides=OV + [
        f"data.root={synth_root}", "model.frame_pool=learned",
        "train.warmup_steps=0"])
    batch = _first_batch(synth_root, cfg)
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    assert "attn_w" in state.params
    attn_w0 = np.asarray(state.params["attn_w"])   # read before donation
    s1, m1 = build_train_fn(cfg, None)(state, batch)
    assert np.isfinite(float(m1["loss"]))
    assert np.abs(np.asarray(s1.params["attn_w"]) - attn_w0).max() > 0.0
    s8, m8 = build_train_fn(cfg, make_mesh())(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4, atol=1e-5)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s8.params[k]), atol=1e-6,
                                   err_msg=k)


def test_train_step_learned_pool_dp_sp_mesh(synth_root):
    """frame_pool=learned under a DP×SP (4×2) mesh: the per-LOCAL-frame
    learned logits must flow through sp_video_scores' online softmax and
    reproduce the single-device step exactly (loss + all params, incl.
    attn_w's gradient path through the frame shards)."""
    from nafae_tpu.config import load_config
    from nafae_tpu.parallel import make_mesh
    from nafae_tpu.train import TrainState, build_train_fn
    from tests.test_train import OV, _first_batch

    cfg = load_config(preset_name="config4", overrides=OV + [
        f"data.root={synth_root}", "model.frame_pool=learned",
        "train.warmup_steps=0", "mesh.frame_axis=2"])
    batch = _first_batch(synth_root, cfg)
    s1, m1 = build_train_fn(cfg, None)(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    mesh = make_mesh(4, 2, devices=jax.devices()[:8])
    s2, m2 = build_train_fn(cfg, mesh)(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=2e-4, atol=1e-5)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s2.params[k]), atol=1e-6,
                                   err_msg=k)


def test_train_step_ctx_target_and_rank_norm_variants(synth_root):
    """Variant flags change gradients/scale but keep the step finite; the
    stopgrad/live distinction shows up in the params after one step."""
    from nafae_tpu.config import load_config
    from nafae_tpu.train import TrainState, build_train_fn
    from tests.test_train import OV, _first_batch

    outs = {}
    for tgt in ("stopgrad", "live"):
        # sgd, not adam: adam's first step is -lr·sign(g) and the two
        # targets' gradients differ in magnitude, not sign
        cfg = load_config(preset_name="config4", overrides=OV + [
            f"data.root={synth_root}", f"loss.ctx_target={tgt}",
            "loss.rank_norm=hinges", "train.optimizer=sgd",
            "train.grad_clip=0.0", "train.warmup_steps=0"])
        batch = _first_batch(synth_root, cfg)
        s1, m1 = build_train_fn(cfg, None)(
            TrainState.create(jax.random.PRNGKey(0), cfg), batch)
        assert np.isfinite(float(m1["loss"]))
        outs[tgt] = np.asarray(s1.params["w_v"])
    # same loss VALUE; different gradient -> different updated params
    assert np.abs(outs["stopgrad"] - outs["live"]).max() > 0.0


def _bilinear_params(seed=21):
    params, feats, word_ids, fm, wm = make_inputs(seed=seed)
    rng = np.random.RandomState(seed + 50)
    e = params["b_v"].shape[0]
    params["m_sim"] = (np.eye(e) + 0.3 * rng.randn(e, e)).astype(np.float32)
    return params, feats, word_ids, fm, wm


def test_bilinear_similarity_matches_oracle():
    """model.similarity=bilinear (MATH.md step 3 [CHOICE]): values AND
    gradients of the full forward vs the torch oracle."""
    params, feats, word_ids, fm, wm = _bilinear_params()

    jout = G.ground_forward(params, jnp.asarray(feats), jnp.asarray(word_ids),
                            jnp.asarray(fm), jnp.asarray(wm),
                            temp=0.1, pool="attention", ctx_window=2)
    tout = O.forward({k: to_torch(v) for k, v in params.items()},
                     to_torch(feats), to_torch(word_ids), to_torch(fm),
                     to_torch(wm), temp=0.1, pool="attention", ctx_window=2)
    for k in ("s", "shat", "score", "beta"):
        np.testing.assert_allclose(np.asarray(jout[k]), tout[k].numpy(),
                                   rtol=1e-4, atol=1e-5, err_msg=k)

    def jloss(p):
        out = G.ground_forward(p, jnp.asarray(feats), jnp.asarray(word_ids),
                               jnp.asarray(fm), jnp.asarray(wm),
                               temp=0.1, pool="attention")
        return jnp.sum(out["score"])

    jgrad = jax.grad(jloss)({k: jnp.asarray(v) for k, v in params.items()})
    tparams = {k: to_torch(v).clone().requires_grad_(True)
               for k, v in params.items()}
    tout = O.forward(tparams, to_torch(feats), to_torch(word_ids),
                     to_torch(fm), to_torch(wm), temp=0.1, pool="attention")
    tout["score"].sum().backward()
    for k in ("m_sim", "w_v", "word_emb"):
        np.testing.assert_allclose(np.asarray(jgrad[k]),
                                   tparams[k].grad.numpy(),
                                   rtol=1e-3, atol=1e-5, err_msg=k)


def test_bilinear_identity_equals_cosine():
    """Identity m_sim reproduces the cosine form (the init contract:
    a bilinear model starts exactly at cosine)."""
    params, feats, word_ids, fm, wm = make_inputs(seed=22)
    base = G.ground_forward(params, jnp.asarray(feats),
                            jnp.asarray(word_ids), jnp.asarray(fm),
                            jnp.asarray(wm), temp=0.1, pool="attention")
    params_i = dict(params)
    params_i["m_sim"] = np.eye(params["b_v"].shape[0], dtype=np.float32)
    bi = G.ground_forward(params_i, jnp.asarray(feats),
                          jnp.asarray(word_ids), jnp.asarray(fm),
                          jnp.asarray(wm), temp=0.1, pool="attention")
    np.testing.assert_allclose(np.asarray(bi["score"]),
                               np.asarray(base["score"]), rtol=1e-6,
                               atol=1e-7)


def test_train_step_bilinear_runs_and_matches_mesh(synth_root):
    """config-4 step with similarity=bilinear: m_sim exists (identity
    init), gets a nonzero update, and the 8-device DP mesh run matches
    the single-device run exactly."""
    from nafae_tpu.config import load_config
    from nafae_tpu.parallel import make_mesh
    from nafae_tpu.train import TrainState, build_train_fn
    from tests.test_train import OV, _first_batch

    cfg = load_config(preset_name="config4", overrides=OV + [
        f"data.root={synth_root}", "model.similarity=bilinear",
        "train.warmup_steps=0"])
    batch = _first_batch(synth_root, cfg)
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    m0 = np.asarray(state.params["m_sim"])
    np.testing.assert_allclose(m0, np.eye(m0.shape[0]))   # identity init
    s1, m1 = build_train_fn(cfg, None)(state, batch)
    assert np.isfinite(float(m1["loss"]))
    assert np.abs(np.asarray(s1.params["m_sim"]) - m0).max() > 0.0
    s8, m8 = build_train_fn(cfg, make_mesh())(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               rtol=2e-4, atol=1e-5)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s8.params[k]), atol=1e-6,
                                   err_msg=k)


def test_choice_flag_typos_fail_fast():
    """Typo'd [CHOICE] flags must raise at init, not silently train the
    default variant (frame_attention treats every non-'mean' pool as
    attention, so a typo would otherwise mislabel a sweep)."""
    from nafae_tpu.config import ModelConfig
    from nafae_tpu.models.grounding import GroundingModel, init_params

    for bad in (ModelConfig(frame_pool="contxt"),
                ModelConfig(similarity="bilinearr")):
        with pytest.raises(ValueError, match="unknown model"):
            init_params(jax.random.PRNGKey(0), bad)
        with pytest.raises(ValueError, match="unknown model"):
            GroundingModel(bad).init(
                jax.random.PRNGKey(0),
                np.zeros((1, 2, 3, bad.feat_dim), np.float32),
                np.zeros((1, 2), np.int32), np.ones((1, 2), np.float32),
                np.ones((1, 2), np.float32))


def test_train_all_variants_together_loss_decreases(synth_root):
    """Integration: every [CHOICE] flag flipped at once (bilinear + learned
    pool + symmetric ctx target + hinge norm + kmeans EMA) still trains —
    loss decreases over 30 steps and all variant params move."""
    import itertools

    from nafae_tpu.config import load_config
    from nafae_tpu.data import BatchLoader, SegmentDataset
    from nafae_tpu.train import TrainState, build_train_fn
    from tests.test_train import OV

    cfg = load_config(preset_name="config4", overrides=OV + [
        f"data.root={synth_root}", "model.similarity=bilinear",
        "model.frame_pool=learned", "loss.ctx_target=symmetric",
        "loss.rank_norm=hinges", "loss.kmeans_ema=0.2",
        "train.warmup_steps=0"])
    ds = SegmentDataset(synth_root, "train", cfg.data.max_frames,
                        cfg.data.num_regions, cfg.data.feat_dim,
                        cfg.data.max_words)
    batches = itertools.chain.from_iterable(
        BatchLoader(ds, cfg.data.batch_size, shuffle=True, seed=e)
        for e in range(10))
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    p0 = {k: np.asarray(v) for k, v in state.params.items()}
    fn = build_train_fn(cfg, None)
    first = None
    for _, batch in zip(range(30), batches):
        state, metrics = fn(state, batch)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert np.isfinite(last) and last < first, (first, last)
    for k in ("m_sim", "attn_w", "w_v", "word_emb"):
        assert np.abs(np.asarray(state.params[k]) - p0[k]).max() > 0.0, k
