"""Sequence-parallel (frame-sharded) tests: halo exchange, online softmax,
and full train-step equality vs the single-device run (SURVEY.md §5 item 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from nafae_tpu.config import load_config
from nafae_tpu.data import BatchLoader, SegmentDataset
from nafae_tpu.parallel import make_mesh
from nafae_tpu.parallel.sp import halo_exchange, sp_video_scores
from nafae_tpu.train import TrainState, build_train_fn

OV = ["data.feat_dim=64", "model.feat_dim=64", "model.embed_dim=32",
      "data.batch_size=8", "data.max_frames=8", "data.num_regions=6",
      "data.max_words=3", "loss.num_clusters=8", "loss.kmeans_interval=5",
      "train.warmup_steps=5", "train.log_every=1000", "train.ckpt_every=1000000",
      "train.eval_every=1000000", "loss.ctx_window=3"]


def _frame_mesh(data, frame):
    return make_mesh(data, frame, devices=jax.devices()[:data * frame])


def test_halo_exchange_matches_concat():
    mesh = _frame_mesh(1, 4)
    x = jnp.arange(4 * 8 * 3, dtype=jnp.float32).reshape(4, 8, 3)

    def body(x_local):
        return halo_exchange(x_local, 2, "frame")

    out = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(None, "frame"),
        out_specs=P(None, "frame")))(x)
    # reassemble: each shard's extended block is [2 halo | 2 local | 2 halo]
    out = np.asarray(out).reshape(4, 4, 6, 3)   # [B, shard, w+Tl+w, C] blocks
    xs = np.asarray(x).reshape(4, 4, 2, 3)      # [B, shard, Tl, C]
    for s in range(4):
        np.testing.assert_array_equal(out[:, s, 2:4], xs[:, s])
        if s > 0:
            np.testing.assert_array_equal(out[:, s, 0:2], xs[:, s - 1])
        else:
            np.testing.assert_array_equal(out[:, s, 0:2], 0.0)
        if s < 3:
            np.testing.assert_array_equal(out[:, s, 4:6], xs[:, s + 1])
        else:
            np.testing.assert_array_equal(out[:, s, 4:6], 0.0)


def test_sp_online_softmax_matches_local():
    from nafae_tpu.ops.grounding import video_scores
    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(4, 3, 8).astype(np.float32))
    wm = jnp.asarray((rng.rand(4, 3) > 0.2).astype(np.float32))
    fm = jnp.asarray((rng.rand(4, 8) > 0.2).astype(np.float32))
    s_ref, _ = video_scores(a, wm, fm, 0.5, "attention")
    mesh = _frame_mesh(1, 4)

    def body(a_l, fm_l):
        s, _ = sp_video_scores(a_l, wm, fm_l, 0.5, "attention", "frame")
        return s

    s_sp = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=(P(None, None, "frame"), P(None, "frame")),
        out_specs=P()))(a, fm)
    np.testing.assert_allclose(np.asarray(s_sp), np.asarray(s_ref),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("mesh_shape,window", [((4, 2), 3), ((2, 2), 3),
                                               ((1, 4), 2)])
def test_sp_train_step_matches_single_device(synth_root, mesh_shape, window):
    """DP×SP shard_map step == single-device step (config4: all losses)."""
    data, frame = mesh_shape
    cfg = load_config(preset_name="config4",
                      overrides=OV + [f"data.root={synth_root}",
                                      f"mesh.data_axis={data}",
                                      f"mesh.frame_axis={frame}",
                                      f"loss.ctx_window={window}"])
    ds = SegmentDataset(synth_root, "train", cfg.data.max_frames,
                        cfg.data.num_regions, cfg.data.feat_dim,
                        cfg.data.max_words)
    batch = next(iter(BatchLoader(ds, cfg.data.batch_size, shuffle=True,
                                  seed=0)))
    s1, m1 = build_train_fn(cfg, None)(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    mesh = _frame_mesh(data, frame)
    s2, m2 = build_train_fn(cfg, mesh)(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=3e-4, atol=1e-5, err_msg=k)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s2.params[k]), atol=2e-6,
                                   err_msg=k)
    np.testing.assert_allclose(np.asarray(s1.centers), np.asarray(s2.centers),
                               atol=1e-5)


def test_sp_train_step_ragged_region_mask(synth_root):
    """DP×SP step == single-device with a RAGGED region mask (random holes):
    the mask must survive the frame-axis sharding + ctx halo exchange."""
    cfg = load_config(preset_name="config4",
                      overrides=OV + [f"data.root={synth_root}",
                                      "mesh.data_axis=2",
                                      "mesh.frame_axis=2"])
    ds = SegmentDataset(synth_root, "train", cfg.data.max_frames,
                        cfg.data.num_regions, cfg.data.feat_dim,
                        cfg.data.max_words)
    batch = dict(next(iter(BatchLoader(ds, cfg.data.batch_size, shuffle=True,
                                       seed=0))))
    rng = np.random.RandomState(5)
    holes = (rng.rand(*batch["region_mask"].shape) > 0.3).astype(np.float32)
    holes[:, :, 0] = 1.0                       # keep >=1 region per frame
    batch["region_mask"] = batch["region_mask"] * holes
    s1, m1 = build_train_fn(cfg, None)(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    s2, m2 = build_train_fn(cfg, _frame_mesh(2, 2))(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=3e-4, atol=1e-5, err_msg=k)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s2.params[k]), atol=2e-6,
                                   err_msg=k)


@pytest.mark.parametrize("mesh_shape", [(4, 1), (2, 2)])
def test_mesh_train_step_with_pallas_kernels(synth_root, mesh_shape):
    """Meshed step with use_pallas=true == single-device jnp step: the fused
    cross_mil kernel under a DP shard_map (4,1) and the fused ctx kernel
    through sp_cross_scores' ctx_impl plumbing under DP×SP (2,2)."""
    data, frame = mesh_shape
    cfg_jnp = load_config(preset_name="config4",
                          overrides=OV + [f"data.root={synth_root}"])
    cfg_pal = load_config(preset_name="config4",
                          overrides=OV + [f"data.root={synth_root}",
                                          f"mesh.data_axis={data}",
                                          f"mesh.frame_axis={frame}",
                                          "train.use_pallas=true"])
    ds = SegmentDataset(synth_root, "train", cfg_jnp.data.max_frames,
                        cfg_jnp.data.num_regions, cfg_jnp.data.feat_dim,
                        cfg_jnp.data.max_words)
    batch = next(iter(BatchLoader(ds, cfg_jnp.data.batch_size, shuffle=True,
                                  seed=0)))
    s1, m1 = build_train_fn(cfg_jnp, None)(
        TrainState.create(jax.random.PRNGKey(0), cfg_jnp), batch)
    s2, m2 = build_train_fn(cfg_pal, _frame_mesh(data, frame))(
        TrainState.create(jax.random.PRNGKey(0), cfg_pal), batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=3e-4, atol=1e-5, err_msg=k)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s2.params[k]), atol=5e-6,
                                   err_msg=k)


@pytest.mark.parametrize("shards,window", [(8, 3), (4, 5), (8, 8)])
def test_halo_exchange_multihop(shards, window):
    """window > T_local: the ppermute chain must deliver exactly the frames
    a single-device zero-padded window would see (zeros past the ends)."""
    mesh = _frame_mesh(1, shards)
    t, c = 8, 3
    tl = t // shards
    x = jnp.arange(2 * t * c, dtype=jnp.float32).reshape(2, t, c)

    def body(x_local):
        return halo_exchange(x_local, window, "frame")

    out = np.asarray(jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(None, "frame"),
        out_specs=P(None, "frame")))(x))
    out = out.reshape(2, shards, window + tl + window, c)
    xp = np.pad(np.asarray(x), ((0, 0), (window, window), (0, 0)))
    for s in range(shards):
        np.testing.assert_array_equal(
            out[:, s], xp[:, s * tl:s * tl + window + tl + window],
            err_msg=f"shard {s}")


def test_sp_train_step_window_wider_than_shard(synth_root):
    """Full DP×SP train step at mesh (1,8): T=8 ⇒ T_local=1 < ctx_window=3,
    driving the multi-hop halo through every ctx consumer (context_mix,
    region_affinity, context_similarity). Must equal the single-device run."""
    cfg = load_config(preset_name="config4",
                      overrides=OV + [f"data.root={synth_root}",
                                      "mesh.data_axis=1",
                                      "mesh.frame_axis=8"])
    ds = SegmentDataset(synth_root, "train", cfg.data.max_frames,
                        cfg.data.num_regions, cfg.data.feat_dim,
                        cfg.data.max_words)
    batch = next(iter(BatchLoader(ds, cfg.data.batch_size, shuffle=True,
                                  seed=0)))
    s1, m1 = build_train_fn(cfg, None)(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    s2, m2 = build_train_fn(cfg, _frame_mesh(1, 8))(
        TrainState.create(jax.random.PRNGKey(0), cfg), batch)
    for k in m1:
        np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                   rtol=3e-4, atol=1e-5, err_msg=k)
    for k in s1.params:
        np.testing.assert_allclose(np.asarray(s1.params[k]),
                                   np.asarray(s2.params[k]), atol=2e-6,
                                   err_msg=k)


def test_proj_fused_mesh_grads_match_unfused():
    """project_regions_fused's custom backward must psum its param
    cotangents over the mesh axes the activations vary on (a non-custom
    backward gets that psum from shard_map's transpose automatically; the
    custom rule must emit it itself — caught r5 when the bf16 mesh step
    failed vma inference). f32 dtype so the dots execute on CPU."""
    from nafae_tpu.ops.grounding import project_regions, project_regions_fused

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(8, 4, 6, 16).astype(np.float32))
    w_v = jnp.asarray(rng.randn(16, 8).astype(np.float32))
    b_v = jnp.asarray(rng.randn(8).astype(np.float32))

    def loss_fused(w, b, f):
        return jnp.sum(project_regions_fused(f, w, b, jnp.float32) ** 2)

    def loss_ref(w, b, f):
        return jnp.sum(project_regions(f, w, b) ** 2)

    gw_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(w_v, b_v, feats)
    mesh = _frame_mesh(4, 2)
    fn = jax.jit(jax.shard_map(
        lambda w, b, f: jax.grad(loss_fused, argnums=(0, 1))(w, b, f),
        mesh=mesh,
        in_specs=(P(), P(), P("data", "frame")),
        out_specs=(P(), P())))
    gw, gb = fn(w_v, b_v, feats)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               rtol=2e-5, atol=2e-5)


def test_mesh_train_step_bf16_compiles(synth_root):
    """The PRODUCTION compute mode (bf16 + default precision — what bench.py
    measures single-device) must compile under the DP×SP mesh: r5 found it
    never had (every mesh test ran f32), and the PROJ_FUSED custom VJP was
    missing the param-cotangent psum, failing shard_map's vma inference.
    Compile-only: the CPU backend cannot EXECUTE bf16 dots (DotThunk), but
    vma inference and SPMD lowering — where the bug lived — run at compile."""
    cfg = load_config(preset_name="config4",
                      overrides=OV + [f"data.root={synth_root}",
                                      "mesh.data_axis=4",
                                      "mesh.frame_axis=2",
                                      "loss.kmeans_interval=1",
                                      "model.dtype=bfloat16",
                                      "model.matmul_precision=default"])
    ds = SegmentDataset(synth_root, "train", cfg.data.max_frames,
                        cfg.data.num_regions, cfg.data.feat_dim,
                        cfg.data.max_words)
    batch = next(iter(BatchLoader(ds, cfg.data.batch_size, shuffle=True,
                                  seed=0)))
    state = TrainState.create(jax.random.PRNGKey(0), cfg)
    fn = build_train_fn(cfg, _frame_mesh(4, 2))
    fn.lower(state, batch).compile()     # raises on the vma regression
