"""Pallas kernels vs pure-jnp references (interpret mode on CPU).

SURVEY.md §5 item 2: unit tests per kernel on random shapes incl. padding/mask
edge cases. On TPU the same tests run compiled (see bench/verify flows).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafae_tpu.ops import grounding as G
from nafae_tpu.ops.pallas.fused_ground import cross_mil


def _ref_a(w, v, fm, rm=None):
    s = jnp.einsum("jke,itre->ijktr", w, v,
                   precision=jax.lax.Precision.HIGHEST)
    return G.frame_mil_max(G.mask_regions(s, rm), fm[:, None, :])


@pytest.mark.parametrize("shapes", [
    (3, 3, 2, 4, 5, 16),    # tiny, ragged
    (5, 4, 3, 7, 20, 32),   # R=20 (production R), odd T
    (2, 2, 1, 1, 1, 8),     # degenerate single frame/region
    (4, 4, 2, 6, 33, 16),   # R > 32 (two lane groups)
])
def test_cross_mil_matches_reference(shapes):
    I, J, K, T, R, E = shapes
    rng = np.random.RandomState(I + R)
    w = jnp.asarray(rng.randn(J, K, E).astype(np.float32))
    v = jnp.asarray(rng.randn(I, T, R, E).astype(np.float32))
    fm = jnp.asarray((rng.rand(I, T) > 0.3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(cross_mil(w, v, fm)),
                               np.asarray(_ref_a(w, v, fm)),
                               rtol=1e-5, atol=1e-5)


def test_cross_mil_rollmax_tie_breaks_like_argmax():
    """Duplicate region embeddings force exact score ties; the rollmax
    kernel's tree-max must resolve them to the FIRST (lowest) region index
    like jnp.argmax, or the max-subgradient routes through the wrong
    region (r2 review fix: `v2 > v` kept whichever candidate sat in the
    current lane). Checked on the kernel's saved argmax directly —
    gradients can't distinguish (jnp.max's VJP SPLITS ties, the kernel's
    custom VJP routes whole to its saved index by design)."""
    from nafae_tpu.ops.pallas.fused_ground import _cross_mil_fwd_rollmax
    I, J, K, T, R, E = 2, 2, 2, 3, 20, 16
    rng = np.random.RandomState(0)
    v_np = rng.randn(I, T, R, E).astype(np.float32)
    v_np[:, :, 16] = v_np[:, :, 8]      # exact tie within every frame
    v_np[:, :, 13] = v_np[:, :, 3]
    w = jnp.asarray(rng.randn(J * K, E).astype(np.float32))
    v = jnp.asarray(v_np)
    fm = jnp.ones((I, T), jnp.float32)
    rm = jnp.ones((I, T, R), jnp.float32)
    a_pl, idx_pl = _cross_mil_fwd_rollmax(w, v, fm, rm)
    s = jnp.einsum("me,itre->imtr", w, v)
    np.testing.assert_allclose(np.asarray(a_pl), np.asarray(jnp.max(s, -1)),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(idx_pl),
                                  np.asarray(jnp.argmax(s, -1)))


def test_cross_mil_gradients_match():
    I, J, K, T, R, E = 4, 4, 3, 5, 6, 16
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(J, K, E).astype(np.float32))
    v = jnp.asarray(rng.randn(I, T, R, E).astype(np.float32))
    fm = jnp.asarray((rng.rand(I, T) > 0.3).astype(np.float32))
    # nonlinear reduction so grads exercise all elements
    loss_ref = lambda w, v: jnp.sum(jnp.sin(_ref_a(w, v, fm) * 1.7))
    loss_pl = lambda w, v: jnp.sum(jnp.sin(cross_mil(w, v, fm) * 1.7))
    gr = jax.grad(loss_ref, argnums=(0, 1))(w, v)
    gp = jax.grad(loss_pl, argnums=(0, 1))(w, v)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shapes", [
    (3, 3, 2, 4, 5, 16),    # rollmax path (R<=32)
    (4, 4, 2, 6, 33, 16),   # grouped path (R>32)
])
def test_cross_mil_region_mask(shapes):
    """Data-dependent region validity (NMS survivors), incl. a frame with
    ZERO valid regions — values and gradients must match the jnp where-mask."""
    I, J, K, T, R, E = shapes
    rng = np.random.RandomState(7 + R)
    w = jnp.asarray(rng.randn(J, K, E).astype(np.float32))
    v = jnp.asarray(rng.randn(I, T, R, E).astype(np.float32))
    fm = jnp.asarray((rng.rand(I, T) > 0.2).astype(np.float32))
    rm_np = (rng.rand(I, T, R) > 0.4).astype(np.float32)
    rm_np[0, 0, :] = 0.0                       # valid frame, no valid regions
    rm = jnp.asarray(rm_np)
    np.testing.assert_allclose(np.asarray(cross_mil(w, v, fm, rm)),
                               np.asarray(_ref_a(w, v, fm, rm)),
                               rtol=1e-5, atol=1e-5)
    loss_ref = lambda w, v: jnp.sum(jnp.sin(_ref_a(w, v, fm, rm) * 1.7))
    loss_pl = lambda w, v: jnp.sum(jnp.sin(cross_mil(w, v, fm, rm) * 1.7))
    gr = jax.grad(loss_ref, argnums=(0, 1))(w, v)
    gp = jax.grad(loss_pl, argnums=(0, 1))(w, v)
    # atol 5e-5: dw accumulates I*T max-subgradient terms in different orders
    # (lax.scan in the VJP vs XLA's fused reduction in the reference)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=5e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=5e-5)


def test_cross_scores_pallas_impl_matches():
    rng = np.random.RandomState(1)
    B, K, T, R, E = 4, 3, 6, 5, 16
    w = G.l2_normalize(jnp.asarray(rng.randn(B, K, E).astype(np.float32)))
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm = jnp.asarray((rng.rand(B, T) > 0.2).astype(np.float32))
    wm = jnp.asarray((rng.rand(B, K) > 0.2).astype(np.float32))
    rm = jnp.asarray((rng.rand(B, T, R) > 0.3).astype(np.float32))
    for pool in ("attention", "mean", "context"):
        for rmask in (None, rm):
            kw = dict(ctx_window=2) if pool == "context" else {}
            sj = G.cross_scores(w, wm, v, fm, 0.1, pool, impl="jnp",
                                region_mask=rmask, **kw)
            sp = G.cross_scores(w, wm, v, fm, 0.1, pool, impl="pallas",
                                region_mask=rmask, **kw)
            np.testing.assert_allclose(np.asarray(sp), np.asarray(sj),
                                       rtol=1e-5, atol=1e-6)


def test_ctx_mix_pallas_matches_context_mix():
    """Fused ctx kernel == context_mix: values and gradients, with and
    without region masks, ragged frames, incl. the uniform-softmax corner
    (valid frame, zero valid regions)."""
    from nafae_tpu.ops.pallas.fused_ctx import ctx_mix_pallas
    rng = np.random.RandomState(3)
    B, T, R, E, w = 3, 7, 5, 16, 2
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm_np = (rng.rand(B, T) > 0.3).astype(np.float32)
    fm_np[0, 0] = 1.0
    fm = jnp.asarray(fm_np)
    v_ext = jnp.pad(v, ((0, 0), (w, w), (0, 0), (0, 0)))
    fm_ext = jnp.pad(fm, ((0, 0), (w, w)))
    rm_np = (rng.rand(B, T, R) > 0.4).astype(np.float32)
    rm_np[0, 0, :] = 0.0
    rm_ext = jnp.pad(jnp.asarray(rm_np), ((0, 0), (w, w), (0, 0)))
    # tile sweep covers the frame-banded kernel (uneven last tile at 2, 3)
    # and the unbanded degenerate case (tile=T=7); None = auto heuristic
    for rme in (None, rm_ext):
        u_ref, nv_ref = G.context_mix(v_ext, fm_ext, w, 0.1, rm_ext=rme)
        g_ref = jax.grad(lambda ve: jnp.sum(jnp.sin(
            G.context_mix(ve, fm_ext, w, 0.1, rm_ext=rme)[0] * 1.3)))(v_ext)
        for tile in (None, 2, 3, 7):
            u, nv = ctx_mix_pallas(v_ext, fm_ext, w, 0.1, rm_ext=rme,
                                   tile=tile)
            np.testing.assert_array_equal(np.asarray(nv), np.asarray(nv_ref))
            np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                       rtol=1e-5, atol=1e-6)
            g = jax.grad(lambda ve: jnp.sum(jnp.sin(
                ctx_mix_pallas(ve, fm_ext, w, 0.1, rm_ext=rme,
                               tile=tile)[0] * 1.3)))(v_ext)
            np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                       rtol=1e-4, atol=1e-5)


def test_ctx_mix_pallas_alpha_residual_matches():
    """ALPHA_RESIDUAL=True (backward consumes the forward's saved alpha
    band instead of recomputing scores): values and grads must match the
    recompute path / jnp reference; T % tile != 0 silently falls back to
    recompute (still correct)."""
    import nafae_tpu.ops.pallas.fused_ctx as FC

    rng = np.random.RandomState(5)
    B, T, R, E, w = 2, 8, 5, 16, 2
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm_np = (rng.rand(B, T) > 0.3).astype(np.float32)
    fm = jnp.asarray(fm_np)
    v_ext = jnp.pad(v, ((0, 0), (w, w), (0, 0), (0, 0)))
    fm_ext = jnp.pad(fm, ((0, 0), (w, w)))
    rm_np = (rng.rand(B, T, R) > 0.4).astype(np.float32)
    rm_ext = jnp.pad(jnp.asarray(rm_np), ((0, 0), (w, w), (0, 0)))

    u_ref, nv_ref = G.context_mix(v_ext, fm_ext, w, 0.1, rm_ext=rm_ext)
    g_ref = jax.grad(lambda ve: jnp.sum(jnp.sin(
        G.context_mix(ve, fm_ext, w, 0.1, rm_ext=rm_ext)[0] * 1.3)))(v_ext)
    old = FC.ALPHA_RESIDUAL
    try:
        FC.ALPHA_RESIDUAL = True
        for tile in (2, 4, 3):              # 3 does not divide 8 -> fallback
            u, nv = FC.ctx_mix_pallas(v_ext, fm_ext, w, 0.1, rm_ext=rm_ext,
                                      tile=tile)
            np.testing.assert_array_equal(np.asarray(nv),
                                          np.asarray(nv_ref))
            np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                       rtol=1e-5, atol=1e-6)
            g = jax.grad(lambda ve: jnp.sum(jnp.sin(
                FC.ctx_mix_pallas(ve, fm_ext, w, 0.1, rm_ext=rm_ext,
                                  tile=tile)[0] * 1.3)))(v_ext)
            np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                       rtol=1e-4, atol=1e-5)
        # the recompute path stays exact too (long clips fall back to it)
        FC.ALPHA_RESIDUAL = False
        u2, _ = FC.ctx_mix_pallas(v_ext, fm_ext, w, 0.1, rm_ext=rm_ext,
                                  tile=4)
        np.testing.assert_allclose(np.asarray(u2), np.asarray(u_ref),
                                   rtol=1e-5, atol=1e-6)
    finally:
        FC.ALPHA_RESIDUAL = old


def test_ctx_mix_pallas_bf16_close_to_f32():
    """bf16 compute mode (the bench/production dtype) stays within bf16
    rounding of the f32 reference for values and grads, banded and not."""
    from nafae_tpu.ops.pallas.fused_ctx import ctx_mix_pallas
    rng = np.random.RandomState(7)
    B, T, R, E, w = 2, 9, 6, 32, 2
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm = jnp.asarray((rng.rand(B, T) > 0.2).astype(np.float32))
    v_ext = jnp.pad(v, ((0, 0), (w, w), (0, 0), (0, 0)))
    fm_ext = jnp.pad(fm, ((0, 0), (w, w)))
    u_ref, _ = G.context_mix(v_ext, fm_ext, w, 0.1)
    g_ref = jax.grad(lambda ve: jnp.sum(
        G.context_mix(ve, fm_ext, w, 0.1)[0] ** 2))(v_ext)
    for tile in (3, T):
        u, _ = ctx_mix_pallas(v_ext.astype(jnp.bfloat16), fm_ext, w, 0.1,
                              dtype=jnp.bfloat16, tile=tile)
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   rtol=2e-2, atol=2e-2)
        g = jax.grad(lambda ve: jnp.sum(ctx_mix_pallas(
            ve, fm_ext, w, 0.1, dtype=jnp.bfloat16,
            tile=tile)[0].astype(jnp.float32) ** 2))(v_ext)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=5e-2, atol=5e-2)


def test_cross_scores_pallas_ctx_pool_uses_kernel():
    """cross_scores(impl='pallas', pool='context') routes the ctx path
    through the fused kernel and still matches the jnp path."""
    rng = np.random.RandomState(2)
    B, K, T, R, E = 4, 3, 6, 5, 16
    w = G.l2_normalize(jnp.asarray(rng.randn(B, K, E).astype(np.float32)))
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm = jnp.asarray((rng.rand(B, T) > 0.2).astype(np.float32))
    wm = jnp.asarray((rng.rand(B, K) > 0.2).astype(np.float32))
    rm = jnp.asarray((rng.rand(B, T, R) > 0.3).astype(np.float32))
    sj = G.cross_scores(w, wm, v, fm, 0.1, "context", ctx_window=2,
                        impl="jnp", region_mask=rm)
    sp = G.cross_scores(w, wm, v, fm, 0.1, "context", ctx_window=2,
                        impl="pallas", region_mask=rm)
    np.testing.assert_allclose(np.asarray(sp), np.asarray(sj),
                               rtol=1e-5, atol=1e-6)


def test_roi_align_pallas_matches_reference():
    from nafae_tpu.ops.roi_align import (roi_align, roi_align_combined,
                                         roi_align_matmul)
    from nafae_tpu.ops.pallas.roi_align import roi_align_pallas
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(12, 14, 8).astype(np.float32))
    xy = rng.rand(5, 2) * 8
    wh = rng.rand(5, 2) * 8 + 2
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    ref = roi_align(feat, boxes, out_size=7, spatial_scale=0.5)
    mm = roi_align_matmul(feat, boxes, out_size=7, spatial_scale=0.5)
    cb = roi_align_combined(feat, boxes, out_size=7, spatial_scale=0.5)
    pk = roi_align_pallas(feat, boxes, out_size=7, spatial_scale=0.5)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cb), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pk), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_nms_pallas_matches_reference():
    from nafae_tpu.ops.nms import batched_nms
    from nafae_tpu.ops.pallas.nms import nms_pallas
    rng = np.random.RandomState(1)
    B, N = 3, 40
    xy = rng.rand(B, N, 2) * 80
    wh = rng.rand(B, N, 2) * 40 + 5
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    scores = jnp.asarray(rng.rand(B, N).astype(np.float32))
    ri, rv = batched_nms(boxes, scores, 10, 0.5)
    pi, pv = nms_pallas(boxes, scores, 10, 0.5)
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(pv))
    mask = np.asarray(rv) > 0
    np.testing.assert_array_equal(np.asarray(ri)[mask], np.asarray(pi)[mask])


def test_nms_pallas_row_blocking(monkeypatch):
    """Oversize [B,N] problems tile the batch axis over a serial grid of
    row blocks (r2 review fix: one VMEM block cannot hold the config-5
    preset's own 320x24000 pool). Force a tiny budget so blocking + row
    padding engage, and check survivors still match the jnp greedy
    reference exactly."""
    import nafae_tpu.ops.pallas.nms as pn
    from nafae_tpu.ops.nms import batched_nms
    rng = np.random.RandomState(7)
    B, N = 11, 64          # 11 % block-rows != 0 -> exercises the padding
    xy = rng.rand(B, N, 2) * 80
    wh = rng.rand(B, N, 2) * 40 + 5
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1).astype(np.float32))
    scores = jnp.asarray(rng.rand(B, N).astype(np.float32))
    ri, rv = batched_nms(boxes, scores, 8, 0.5)
    monkeypatch.setattr(pn, "_VMEM_INPUT_BUDGET", 5 * N * 4 * 4)  # 4 rows
    pi, pv = pn.nms_pallas(boxes, scores, 8, 0.5)
    assert pi.shape == (B, 8) and pv.shape == (B, 8)
    np.testing.assert_array_equal(np.asarray(rv), np.asarray(pv))
    mask = np.asarray(rv) > 0
    np.testing.assert_array_equal(np.asarray(ri)[mask], np.asarray(pi)[mask])


def test_detector_pallas_kernels_end_to_end():
    from nafae_tpu.config import DetectorConfig
    from nafae_tpu.models.detector.faster_rcnn import FasterRCNNExtractor
    cfg = DetectorConfig(image_size=64, num_proposals=5, rpn_pre_nms_topk=32,
                         anchor_scales=(16, 32),
                         anchor_ratios=(0.5, 1.0, 2.0))
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                       .astype(np.float32))
    ref_model = FasterRCNNExtractor(cfg)
    params = ref_model.init(jax.random.PRNGKey(0), imgs)
    ref = ref_model.apply(params, imgs)
    pal = FasterRCNNExtractor(cfg, use_pallas_roi_align=True,
                              use_pallas_nms=True).apply(params, imgs)
    np.testing.assert_allclose(np.asarray(pal["boxes"]),
                               np.asarray(ref["boxes"]), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pal["feats"]),
                               np.asarray(ref["feats"]), rtol=1e-3, atol=1e-3)


def test_ctx_mix_pallas_window_geq_clip():
    """Degenerate clips: window >= T (every frame neighbors every other)
    and T=1 (no neighbors at all -> zero mix, uniform nbr_valid=0)."""
    from nafae_tpu.ops.pallas.fused_ctx import ctx_mix_pallas
    rng = np.random.RandomState(11)
    for T, w in ((2, 3), (1, 2), (3, 3)):
        v = G.l2_normalize(jnp.asarray(
            rng.randn(2, T, 4, 16).astype(np.float32)))
        fm = jnp.ones((2, T))
        v_ext = jnp.pad(v, ((0, 0), (w, w), (0, 0), (0, 0)))
        fm_ext = jnp.pad(fm, ((0, 0), (w, w)))
        u_ref, nv_ref = G.context_mix(v_ext, fm_ext, w, 0.1)
        u, nv = ctx_mix_pallas(v_ext, fm_ext, w, 0.1)
        np.testing.assert_array_equal(np.asarray(nv), np.asarray(nv_ref))
        np.testing.assert_allclose(np.asarray(u), np.asarray(u_ref),
                                   rtol=1e-5, atol=1e-6, err_msg=f"T={T}")
        g_ref = jax.grad(lambda ve: jnp.sum(jnp.sin(
            G.context_mix(ve, fm_ext, w, 0.1)[0])))(v_ext)
        g = jax.grad(lambda ve: jnp.sum(jnp.sin(
            ctx_mix_pallas(ve, fm_ext, w, 0.1)[0])))(v_ext)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                                   rtol=1e-4, atol=1e-5, err_msg=f"T={T}")


def test_diag_epilogue_matches_jnp_values_and_grads():
    """fused_diag kernel == the jnp ctx-loss/select/cluster block (it rides
    the kernels="pallas" mode; measured slower than XLA at production
    shapes, see docs/PERF.md, but must stay exact)."""
    import numpy as np

    from nafae_tpu.ops import grounding as G
    from nafae_tpu.ops.kmeans import kmeans_assign
    from nafae_tpu.ops.pallas.fused_diag import diag_epilogue_pallas

    B, K, T, R, E, KC = 3, 5, 6, 7, 32, 11
    rng = np.random.RandomState(0)
    nrm = lambda x: x / np.linalg.norm(x, axis=-1, keepdims=True)
    w = jnp.asarray(nrm(rng.randn(B, K, E)).astype(np.float32))
    v = jnp.asarray(nrm(rng.randn(B, T, R, E)).astype(np.float32))
    u = jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)) * 0.5
    centers = jnp.asarray(nrm(rng.randn(KC, E)).astype(np.float32))
    fm = jnp.asarray((rng.rand(B, T) > 0.2).astype(np.float32))
    rm = jnp.asarray((rng.rand(B, T, R) > 0.2).astype(np.float32))
    hc = jnp.asarray((rng.rand(B, T) > 0.3).astype(np.float32))
    wm = jnp.asarray((rng.rand(B, K) > 0.2).astype(np.float32))
    dA, dB = 0.7, 1.3

    def ref_parts(w, v):
        s = G.mask_regions(G.similarity_tensor(w, v), rm)
        shat = G.mask_regions(G.similarity_tensor(w, u), rm)
        mask = (fm[:, None, :, None] * hc[:, None, :, None]
                * rm[:, None, :, :])
        sq = (s - jax.lax.stop_gradient(shat)) ** 2
        ctx_kt = jnp.sum(sq * mask, axis=-1)
        r_star = jnp.argmax(s, axis=-1)
        f = jnp.take_along_axis(v[:, None], r_star[..., None, None],
                                axis=-2)[..., 0, :]
        target = jax.lax.stop_gradient(
            jnp.take(centers, kmeans_assign(f, centers), axis=0))
        clu_kt = jnp.sum((f - target) ** 2, axis=-1)
        return ctx_kt, clu_kt, f

    def total(parts_fn, w, v):
        ctx_kt, clu_kt, _ = parts_fn(w, v)
        return (dA * jnp.sum(wm[:, :, None] * ctx_kt)
                + dB * jnp.sum(wm[:, :, None] * fm[:, None, :] * clu_kt))

    ker_parts = lambda w, v: diag_epilogue_pallas(w, v, u, centers, fm, rm,
                                                  hc)
    ctx_r, clu_r, f_r = jax.jit(lambda: ref_parts(w, v))()
    ctx_k, clu_k, f_k = jax.jit(lambda: ker_parts(w, v))()
    np.testing.assert_allclose(np.asarray(ctx_k), np.asarray(ctx_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(clu_k), np.asarray(clu_r),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(f_k),
                               np.asarray(f_r.transpose(0, 2, 1, 3)),
                               rtol=1e-6, atol=1e-6)
    g_r = jax.jit(jax.grad(lambda w, v: total(ref_parts, w, v),
                           argnums=(0, 1)))(w, v)
    g_k = jax.jit(jax.grad(lambda w, v: total(ker_parts, w, v),
                           argnums=(0, 1)))(w, v)
    for a, b, name in zip(g_r, g_k, ("dw", "dv")):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=3e-5, atol=3e-5, err_msg=name)


def test_roi_align_pallas_bf16_feat():
    """bf16 feature maps (detector.dtype=bfloat16) through the kernel: the
    dots must run at the operands' precision (Mosaic rejects HIGHEST on
    bf16 — the interpret-mode CPU suite can't see that, but the dtype
    routing it exercises here is the on-chip requirement) and stay within
    bf16 tolerance of the f32 reference."""
    from nafae_tpu.ops.pallas.roi_align import roi_align_pallas
    from nafae_tpu.ops.roi_align import roi_align
    rng = np.random.RandomState(3)
    feat = rng.randn(12, 14, 8).astype(np.float32)
    xy = rng.rand(5, 2) * 8
    wh = rng.rand(5, 2) * 8 + 2
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], 1).astype(np.float32))
    ref = roi_align(jnp.asarray(feat), boxes, out_size=7, spatial_scale=0.5)
    pk = roi_align_pallas(jnp.asarray(feat, jnp.bfloat16), boxes,
                          out_size=7, spatial_scale=0.5)
    assert pk.dtype == jnp.float32            # f32 accumulate/output
    np.testing.assert_allclose(np.asarray(pk), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_nms_pallas_oversized_pool_errors_clearly():
    """An anchor pool too large for even the minimum 8-row VMEM tile must
    raise the named fix, not a Mosaic allocation error."""
    import pytest as _pytest

    from nafae_tpu.ops.pallas.nms import nms_pallas_planes
    n = 120_000
    z = jnp.zeros((16, n), jnp.float32)
    with _pytest.raises(ValueError, match="rpn_pre_nms_topk"):
        nms_pallas_planes(z, z, z, z, z, num_keep=4)


def test_ctx_vmem_bound_matches_measured_ceiling():
    """The scoped-VMEM gate (fused_ctx._BWD_SCOPED_VMEM_LIMIT) reproduces
    the measured v5e boundary: T=192 at production shapes compiles the
    Pallas backward (~14 MB estimate), T=256 does not (compiler: 18 MB vs
    the 16 MB scoped limit — full error in docs/PERF.md). The estimate
    intentionally overestimates, so the cutoff lands inside the limit."""
    from nafae_tpu.ops.pallas import fused_ctx as FC
    est = lambda t: FC._ctx_bwd_vmem_bytes(t, 24, 256, 3, 2)
    assert est(192) <= FC._BWD_SCOPED_VMEM_LIMIT
    assert est(256) > FC._BWD_SCOPED_VMEM_LIMIT
    # production bench shape is nowhere near the bound (no behavior change)
    assert est(20) < FC._BWD_SCOPED_VMEM_LIMIT // 8


def test_ctx_mix_pallas_longclip_fallback(monkeypatch):
    """Above the scoped-VMEM bound ctx_mix_pallas must return the XLA
    path's values (bitwise — it IS that path) with a loud warning, not a
    Mosaic compile error. Forced via a tiny limit so the test stays small."""
    import warnings

    from nafae_tpu.ops.pallas import fused_ctx as FC
    rng = np.random.RandomState(5)
    B, T, R, E, w = 2, 6, 5, 16, 2
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm = jnp.asarray((rng.rand(B, T) > 0.3).astype(np.float32))
    v_ext = jnp.pad(v, ((0, 0), (w, w), (0, 0), (0, 0)))
    fm_ext = jnp.pad(fm, ((0, 0), (w, w)))
    u_ref, nv_ref = G.context_mix(v_ext, fm_ext, w, 0.1, impl="offset")
    monkeypatch.setattr(FC, "_BWD_SCOPED_VMEM_LIMIT", 1)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        u, nv = FC.ctx_mix_pallas(v_ext, fm_ext, w, 0.1)
    assert any("scoped-VMEM" in str(r.message) for r in rec)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(u_ref))
    np.testing.assert_array_equal(np.asarray(nv), np.asarray(nv_ref))


def test_ctx_vmem_gate_extended_envelope():
    """scoped_vmem_kib>=65536 extends the gate to the MEASURED envelope
    only: T=320 at R=20/E=256/bf16 in (the 64 MB option compiles it in
    57 s and runs 1.8x faster than the fallback), T=384 out (did not
    finish compiling in 25 min; T=448 needs 66.4 MB > 64)."""
    from nafae_tpu.ops.pallas import fused_ctx as FC
    est = lambda t: FC._ctx_bwd_vmem_bytes(t, 24, 256, 3, 2)
    assert est(320) <= FC._BWD_EXTENDED_LIMIT
    assert est(384) > FC._BWD_EXTENDED_LIMIT
    # the default gate is unchanged by the constant's existence
    assert est(192) <= FC._BWD_SCOPED_VMEM_LIMIT < FC._BWD_EXTENDED_LIMIT
