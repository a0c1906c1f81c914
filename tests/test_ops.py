"""Unit tests for ops: masking edge cases, k-means behavior, metric sanity."""

import numpy as np

import jax
import jax.numpy as jnp

from nafae_tpu.ops import grounding as G
from nafae_tpu.ops import losses as L
from nafae_tpu.ops.kmeans import (kmeans_assign, kmeans_init, kmeans_lloyd,
                                  kmeans_plusplus_init)
from nafae_tpu.ops.iou import box_iou, grounding_hits


def test_masked_frame_attention_ignores_invalid():
    g = jnp.array([[1.0, 100.0, 2.0]])
    fm = jnp.array([[1.0, 0.0, 1.0]])
    beta = G.frame_attention(g, fm, temp=1.0, pool="attention")
    assert float(beta[0, 1]) == 0.0
    np.testing.assert_allclose(float(jnp.sum(beta)), 1.0, rtol=1e-6)


def test_frame_mil_max_zeroes_invalid_frames():
    s = jnp.ones((1, 2, 3, 4)) * 5.0
    fm = jnp.array([[1.0, 1.0, 0.0]])
    a = G.frame_mil_max(s, fm)
    assert float(a[0, 0, 2]) == 0.0 and float(a[0, 0, 0]) == 5.0


def test_context_no_valid_neighbors_gives_zero_loss():
    # single valid frame -> no neighbors -> L_ctx must be 0
    rng = np.random.RandomState(0)
    v = G.l2_normalize(jnp.asarray(rng.randn(1, 4, 3, 8).astype(np.float32)))
    s = jnp.asarray(rng.randn(1, 2, 4, 3).astype(np.float32))
    fm = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    wm = jnp.ones((1, 2))
    alpha, nv = G.region_affinity(v, fm, window=2, temp=0.1)
    shat = G.context_similarity(s, alpha, nv)
    loss = L.context_loss(s, shat, wm, fm, nv)
    assert float(loss) == 0.0


def test_context_mix_matches_reference_formulation():
    """context_mix (dense band-matrix and per-offset paths) ==
    region_affinity_ext -> context_mixed_regions, with and without a region
    mask, ragged fm, including a valid frame whose regions are ALL masked
    (the uniform-softmax corner) — values and gradients."""
    rng = np.random.RandomState(3)
    B, T, R, E, w = 3, 7, 5, 16, 2
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm_np = (rng.rand(B, T) > 0.3).astype(np.float32)
    fm_np[0, 0] = 1.0
    fm = jnp.asarray(fm_np)
    v_ext = jnp.pad(v, ((0, 0), (w, w), (0, 0), (0, 0)))
    fm_ext = jnp.pad(fm, ((0, 0), (w, w)))
    rm_np = (rng.rand(B, T, R) > 0.4).astype(np.float32)
    rm_np[0, 0, :] = 0.0                 # valid frame, zero valid regions
    rm_ext = jnp.pad(jnp.asarray(rm_np), ((0, 0), (w, w), (0, 0)))
    for rme in (None, rm_ext):
        alpha, nv_ref = G.region_affinity_ext(v_ext, fm_ext, w, 0.1,
                                              rm_ext=rme)
        u_ref = G.context_mixed_regions(v_ext, alpha, nv_ref)
        for impl in ("dense", "offset"):
            u, nv = G.context_mix(v_ext, fm_ext, w, 0.1, rm_ext=rme,
                                  impl=impl)
            np.testing.assert_allclose(np.asarray(nv), np.asarray(nv_ref),
                                       rtol=0, atol=0, err_msg=impl)
            np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                       rtol=1e-5, atol=1e-6, err_msg=impl)
        g_ref = jax.grad(lambda ve: jnp.sum(jnp.sin(
            G.context_mixed_regions(
                ve, *G.region_affinity_ext(ve, fm_ext, w, 0.1, rm_ext=rme)
            ) * 1.3)))(v_ext)
        for impl in ("dense", "offset"):
            g = jax.grad(lambda ve: jnp.sum(jnp.sin(
                G.context_mix(ve, fm_ext, w, 0.1, rm_ext=rme,
                              impl=impl)[0] * 1.3)))(v_ext)
            np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                       rtol=1e-4, atol=1e-5, err_msg=impl)


def test_kmeans_recovers_planted_clusters():
    rng = np.random.RandomState(1)
    true = rng.randn(4, 16).astype(np.float32)
    true /= np.linalg.norm(true, axis=1, keepdims=True)
    pts = np.repeat(true, 64, axis=0) + 0.05 * rng.randn(256, 16).astype(np.float32)
    valid = np.ones(256, np.float32)
    c0 = kmeans_plusplus_init(jax.random.PRNGKey(0), jnp.asarray(pts),
                              jnp.asarray(valid), 4)
    c = kmeans_lloyd(jnp.asarray(pts), jnp.asarray(valid), c0, iters=20)
    # every true center should have a learned center within small cosine distance
    sims = np.asarray(c) @ true.T
    assert (sims.max(axis=0) > 0.98).all()


def test_kmeans_empty_cluster_kept():
    pts = jnp.ones((8, 4)) / 2.0
    valid = jnp.ones(8)
    c0 = kmeans_init(jax.random.PRNGKey(1), 3, 4)
    c = kmeans_lloyd(pts, valid, c0, iters=3)
    assert np.isfinite(np.asarray(c)).all()
    norms = np.linalg.norm(np.asarray(c), axis=1)
    np.testing.assert_allclose(norms, 1.0, rtol=1e-5)


def test_kmeans_plusplus_picks_normalized_valid_rows():
    """Every seeded center is the l2-normalization of some VALID candidate
    row; invalid rows are never drawn; distinct rows while enough exist."""
    rng = np.random.RandomState(7)
    f = rng.randn(24, 8).astype(np.float32)
    valid = np.zeros(24, np.float32)
    valid[[1, 3, 5, 7, 9, 11, 13, 15]] = 1.0
    c = np.asarray(kmeans_plusplus_init(jax.random.PRNGKey(2),
                                        jnp.asarray(f), jnp.asarray(valid),
                                        4))
    fn = f / np.linalg.norm(f, axis=1, keepdims=True)
    src = []
    for ci in c:
        d = np.abs(fn - ci).max(axis=1)
        i = int(d.argmin())
        assert d[i] < 1e-5             # a normalized candidate row
        assert valid[i] == 1.0, i      # never an invalid row
        src.append(i)
    assert len(set(src)) == 4          # distinct picks (d2=0 at a chosen row)


def test_kmeans_assign_shape():
    f = jnp.zeros((2, 3, 5, 8))
    c = kmeans_init(jax.random.PRNGKey(2), 6, 8)
    a = kmeans_assign(f, c)
    assert a.shape == (2, 3, 5) and a.dtype == jnp.int32 or a.dtype == jnp.int64


def test_kmeans_assign_mxu_dtype_matches_default():
    """kmeans_assign(dtype=...) — the transposed 2-D MXU dot form used by
    train.ASSIGN_MXU — returns the same assignments and the same lowest-c
    tie rule as the default einsum+argmax form (f32 exact; bf16 on data
    whose sims survive the cast)."""
    rng = np.random.RandomState(7)
    f = jnp.asarray(rng.randn(4, 9, 16).astype(np.float32))
    c = jnp.asarray(rng.randn(11, 16).astype(np.float32))
    base = kmeans_assign(f, c)
    np.testing.assert_array_equal(np.asarray(kmeans_assign(f, c, dtype=jnp.float32)),
                                  np.asarray(base))
    # bf16 comparison on margin-separated data (random near-ties can
    # legitimately flip under the cast): points sit on top of their center
    fm = jnp.take(c, base.reshape(-1) % c.shape[0], axis=0).reshape(f.shape)
    fm = fm + 0.01 * f
    bm = kmeans_assign(fm, c)
    np.testing.assert_array_equal(np.asarray(kmeans_assign(fm, c, dtype=jnp.bfloat16)),
                                  np.asarray(bm))
    # tie rule: duplicate centers -> identical sims -> lowest index wins
    cdup = jnp.concatenate([c[:1], c[:1], c], axis=0)
    fd = jnp.broadcast_to(c[0], (3, 16))
    for dt in (None, jnp.float32, jnp.bfloat16):
        a = kmeans_assign(fd, cdup, dtype=dt)
        np.testing.assert_array_equal(np.asarray(a), np.zeros(3, np.int64))


def test_argmax_regions_2d_bitwise_matches_argmax_of_s():
    """ops/grounding.argmax_regions_2d (train.ARGMAX_2D: the relayouted
    [R, B·K·T] selection argmax) is the SAME tensor reduced in a different
    layout — bitwise-identical indices to jnp.argmax(s, -1), including the
    masked-region NEG entries and the lowest-r tie rule."""
    rng = np.random.RandomState(11)
    B, K, T, R, E = 3, 5, 7, 6, 32
    w = jnp.asarray(rng.randn(B, K, E).astype(np.float32))
    v = jnp.asarray(rng.randn(B, T, R, E).astype(np.float32))
    rm_np = (rng.rand(B, T, R) > 0.3).astype(np.float32)
    rm = jnp.asarray(rm_np)
    for mask in (None, rm):
        for dt in (None, jnp.bfloat16):
            s = G.mask_regions(G.similarity_tensor(w, v, dtype=dt), mask)
            np.testing.assert_array_equal(
                np.asarray(G.argmax_regions_2d(s)),
                np.asarray(jnp.argmax(s, axis=-1)))
    # tie rule: duplicate region rows -> equal scores -> lowest r in both
    vdup = v.at[:, :, 1].set(v[:, :, 0])
    s = G.similarity_tensor(w, vdup)
    np.testing.assert_array_equal(
        np.asarray(G.argmax_regions_2d(s)),
        np.asarray(jnp.argmax(s, axis=-1)))


def test_iou_identity_and_disjoint():
    a = jnp.array([0.0, 0.0, 10.0, 10.0])
    b = jnp.array([20.0, 20.0, 30.0, 30.0])
    assert float(box_iou(a, a)) == 1.0
    assert float(box_iou(a, b)) == 0.0
    degenerate = jnp.array([5.0, 5.0, 5.0, 5.0])
    assert float(box_iou(degenerate, degenerate)) == 0.0


def test_grounding_hits_perfect_model():
    # construct s so argmax region == region 0, whose box equals the GT box
    B, K, T, R = 1, 2, 3, 4
    s = jnp.zeros((B, K, T, R)).at[..., 0].set(1.0)
    rng = np.random.RandomState(2)
    boxes = jnp.asarray(np.abs(rng.rand(B, T, R, 4)).astype(np.float32))
    boxes = boxes.at[..., 2:].set(boxes[..., :2] + 1.0)
    gt = jnp.broadcast_to(boxes[:, None, :, 0, :], (B, K, T, 4))
    gt_mask = jnp.ones((B, K, T))
    correct, mask = grounding_hits(s, boxes, gt, gt_mask)
    np.testing.assert_allclose(np.asarray(correct), np.ones((B, K, T)))


def test_grounding_hits_ignores_nonfinite_dead_slots():
    # the one-hot contraction multiplies EVERY region slot by 0/1, so a
    # non-finite value in a never-selected slot must not poison the
    # selected box via 0*inf=NaN (ADVICE r4 #4 — the guard under test)
    B, K, T, R = 1, 2, 3, 4
    s = jnp.zeros((B, K, T, R)).at[..., 0].set(1.0)   # argmax = region 0
    rng = np.random.RandomState(2)
    boxes = np.abs(rng.rand(B, T, R, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + 1.0
    clean = np.array(boxes)
    boxes[:, :, 1, :] = np.inf                         # dead slot poisoned
    boxes[:, :, 2, :] = np.nan
    gt = jnp.broadcast_to(jnp.asarray(clean)[:, None, :, 0, :], (B, K, T, 4))
    gt_mask = jnp.ones((B, K, T))
    correct, _ = grounding_hits(s, jnp.asarray(boxes), gt, gt_mask)
    np.testing.assert_allclose(np.asarray(correct), np.ones((B, K, T)))


def test_project_regions_int8_close_to_f32():
    """The int8 projection (per-output-channel weights × per-row dynamic
    activations, int8×int8→int32 dot) must track the f32 path closely on
    the NORMALIZED embeddings — the row scale cancels through the
    normalize. Pins cos > 0.999 / max-abs < 0.02 (measured: 0.9999 /
    0.006), and that the quantized-params dispatch routes."""
    from nafae_tpu.ops import grounding as G

    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(4, 8, 10, 256).astype(np.float32) * 3.0)
    w = jnp.asarray(rng.randn(256, 64).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(64).astype(np.float32) * 0.01)
    v_ref = np.asarray(G.project_regions(feats, w, b))
    q, s = G.quantize_weight_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 64)
    v_q = np.asarray(G.project_regions_int8(feats, q, s, b))
    assert np.abs(v_ref - v_q).max() < 0.02
    assert np.sum(v_ref * v_q, -1).min() > 0.999
    # params-dict dispatch: quantize_params_int8 + project_params ==
    # project_regions_int8 directly
    params = {"w_v": w, "b_v": b, "word_emb": jnp.zeros((67, 64))}
    qp = G.quantize_params_int8(params)
    assert "w_v" not in qp and "w_v.q8" in qp and "word_emb" in qp
    np.testing.assert_array_equal(np.asarray(G.project_params(qp, feats)),
                                  v_q)
    # the compiled program really contains an s8 x s8 -> s32 contraction
    hlo = jax.jit(lambda f: G.project_params(qp, f)).lower(feats).compile() \
        .as_text()
    assert "s8" in hlo, "int8 operands missing from the compiled projection"
    # offline path: pre-quantized int8 features (quantize_feats_int8) give
    # BITWISE the dynamic path's output — same q, same scales, same dot
    qf, sf = G.quantize_feats_int8(feats)
    assert qf.dtype == jnp.int8 and sf.shape == feats.shape[:3] + (1,)
    v_pre = np.asarray(G.project_regions_int8_pre(qf, sf, q, s, b))
    np.testing.assert_array_equal(v_pre, v_q)
    np.testing.assert_array_equal(
        np.asarray(G.project_params(qp, qf, feats_scale=sf)), v_q)


def test_ranking_loss_zero_when_diagonal_dominates():
    mat = jnp.eye(4) * 10.0 - 5.0
    assert float(L.ranking_loss(mat, margin=0.1)) == 0.0


def test_select_top_regions_gathers_argmax():
    rng = np.random.RandomState(3)
    s = jnp.asarray(rng.randn(2, 3, 4, 5).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 4, 5, 6).astype(np.float32))
    wm, fm = jnp.ones((2, 3)), jnp.ones((2, 4))
    f, valid = L.select_top_regions(s, v, wm, fm)
    r_star = np.argmax(np.asarray(s), axis=-1)
    for b in range(2):
        for k in range(3):
            for t in range(4):
                np.testing.assert_allclose(np.asarray(f)[b, k, t],
                                           np.asarray(v)[b, t, r_star[b, k, t]])


def test_cross_scores_accepts_precomputed_u():
    """cross_scores(u=...) (the train step's shared context mixing) equals
    the internal computation, values and gradients, for both MIL impls."""
    rng = np.random.RandomState(5)
    B, T, R, E, K, w = 3, 7, 5, 16, 4, 2
    w_emb = G.l2_normalize(jnp.asarray(rng.randn(B, K, E).astype(np.float32)))
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm = jnp.asarray((rng.rand(B, T) > 0.3).astype(np.float32))
    wm = jnp.asarray((rng.rand(B, K) > 0.2).astype(np.float32))
    rm = jnp.asarray((rng.rand(B, T, R) > 0.4).astype(np.float32))

    def rows(ve, u=None):
        return G.cross_scores(w_emb, wm, ve, fm, 0.1, "context",
                              ctx_window=w, ctx_temp=0.1, region_mask=rm, u=u)

    def make_u(ve):
        v_ext = jnp.pad(ve, ((0, 0), (w, w), (0, 0), (0, 0)))
        fm_ext = jnp.pad(fm, ((0, 0), (w, w)))
        rm_ext = jnp.pad(rm, ((0, 0), (w, w), (0, 0)))
        return G.context_mix(v_ext, fm_ext, w, 0.1, rm_ext=rm_ext)[0]

    ref = rows(v)
    got = rows(v, u=make_u(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-7)
    g_ref = jax.grad(lambda ve: jnp.sum(jnp.cos(rows(ve))))(v)
    g_got = jax.grad(lambda ve: jnp.sum(jnp.cos(rows(ve, u=make_u(ve)))))(v)
    np.testing.assert_allclose(np.asarray(g_got), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-6)


def test_cast2_per_operand():
    """_cast2 quantizes EACH operand independently of the other's dtype —
    a short-circuit on one operand left the other unquantized when call
    sites passed (already-bf16, f32) (r2 review fix; the SP context path
    diverged from single-device in bf16 mode)."""
    import jax.numpy as jnp

    from nafae_tpu.ops.grounding import _cast2
    f = jnp.ones((3,), jnp.float32) * 1.001
    h = f.astype(jnp.bfloat16)
    for x, y in ((f, h), (h, f), (f, f), (h, h)):
        a, b = _cast2(x, y, jnp.bfloat16)
        assert a.dtype == jnp.bfloat16 and b.dtype == jnp.bfloat16
    a, b = _cast2(f, h, None)
    assert a.dtype == jnp.float32 and b.dtype == jnp.bfloat16


def test_kmeans_ema():
    """EMA blend (docs/MATH.md §Visual-clustering [CHOICE], loss.kmeans_ema):
    kmeans_lloyd(ema=ρ) == normalize((1−ρ)·lloyd(ema=0) + ρ·normalize(old))."""
    import jax

    from nafae_tpu.ops.grounding import l2_normalize
    from nafae_tpu.ops.kmeans import kmeans_lloyd

    rng = np.random.RandomState(11)
    f = jnp.asarray(rng.randn(40, 8).astype(np.float32))
    valid = jnp.asarray((rng.rand(40) > 0.2).astype(np.float32))
    old = jnp.asarray(rng.randn(5, 8).astype(np.float32))
    pure = kmeans_lloyd(f, valid, old, iters=3, ema=0.0)
    blended = kmeans_lloyd(f, valid, old, iters=3, ema=0.25)
    expect = l2_normalize(0.75 * pure + 0.25 * l2_normalize(old))
    np.testing.assert_allclose(np.asarray(blended), np.asarray(expect),
                               rtol=1e-5, atol=1e-6)
    assert float(jnp.abs(blended - pure).max()) > 1e-3


def test_project_regions_fused_matches_reference():
    """ops/grounding.project_regions_fused (train.PROJ_FUSED): forward is
    BITWISE project_regions(...).astype(dtype); w_v/b_v gradients match the
    f32-backward reference to bf16 tolerance; feats' cotangent is zero."""
    rng = np.random.RandomState(5)
    B, T, R, D, E = 2, 4, 3, 24, 16
    feats = jnp.asarray(rng.randn(B, T, R, D).astype(np.float32))
    w_v = jnp.asarray((rng.randn(D, E) / np.sqrt(D)).astype(np.float32))
    b_v = jnp.asarray(rng.randn(E).astype(np.float32) * 0.1)
    dt = jnp.bfloat16

    ref_fwd = G.project_regions(feats, w_v, b_v, dtype=dt).astype(dt)
    got_fwd = G.project_regions_fused(feats, w_v, b_v, dt)
    assert got_fwd.dtype == dt
    np.testing.assert_array_equal(np.asarray(got_fwd, np.float32),
                                  np.asarray(ref_fwd, np.float32))

    probe = jnp.asarray(rng.randn(B, T, R, E).astype(np.float32))

    def loss_ref(w, b):
        v = G.project_regions(feats, w, b, dtype=dt).astype(dt)
        return jnp.sum(v.astype(jnp.float32) * probe)

    def loss_fused(w, b):
        v = G.project_regions_fused(feats, w, b, dt)
        return jnp.sum(v.astype(jnp.float32) * probe)

    gw_ref, gb_ref = jax.grad(loss_ref, argnums=(0, 1))(w_v, b_v)
    gw, gb = jax.grad(loss_fused, argnums=(0, 1))(w_v, b_v)
    scale = float(jnp.abs(gw_ref).max())
    np.testing.assert_allclose(np.asarray(gw), np.asarray(gw_ref),
                               atol=2e-2 * scale)
    np.testing.assert_allclose(np.asarray(gb), np.asarray(gb_ref),
                               atol=2e-2 * max(1.0, float(jnp.abs(gb_ref).max())))

    gf = jax.grad(lambda f: jnp.sum(
        G.project_regions_fused(f, w_v, b_v, dt).astype(jnp.float32)))(feats)
    np.testing.assert_array_equal(np.asarray(gf), np.zeros_like(feats))


def test_cluster_target_onehot_bitwise_matches_take():
    """ops/losses.CLUSTER_TARGET_ONEHOT: the one-hot MXU gather of the
    cluster-loss target centers is BITWISE jnp.take (single-1 rows under a
    HIGHEST-precision contraction), and cluster_loss_terms is unchanged —
    values and f-gradient."""
    rng = np.random.RandomState(13)
    f = jnp.asarray(rng.randn(3, 4, 5, 16).astype(np.float32))
    valid = jnp.asarray((rng.rand(3, 4, 5) > 0.3).astype(np.float32))
    centers = jnp.asarray(rng.randn(7, 16).astype(np.float32))

    def run(flag):
        old = L.CLUSTER_TARGET_ONEHOT
        L.CLUSTER_TARGET_ONEHOT = flag
        try:
            num, den, assign = L.cluster_loss_terms(f, valid, centers)
            g = jax.grad(lambda x: L.cluster_loss_terms(x, valid, centers)[0])(f)
            return num, den, assign, g
        finally:
            L.CLUSTER_TARGET_ONEHOT = old

    n0, d0, a0, g0 = run(False)
    n1, d1, a1, g1 = run(True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n0))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d0))
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g0))
    # the raw target rows themselves are bitwise the gathered center rows
    t0 = L._cluster_target(centers, a0.reshape(-1))
    old = L.CLUSTER_TARGET_ONEHOT
    L.CLUSTER_TARGET_ONEHOT = True
    try:
        t1 = L._cluster_target(centers, a0.reshape(-1))
    finally:
        L.CLUSTER_TARGET_ONEHOT = old
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t0))
