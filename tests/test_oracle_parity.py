"""Golden parity: vectorized JAX ops vs the naive torch-cpu oracle.

SURVEY.md §5 item 1 — the load-bearing tests. Random shapes incl. ragged masks.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from nafae_tpu.ops import grounding as G
from nafae_tpu.ops import losses as L
from tests import oracle_torch as O

B, K, T, R, D, E, V = 3, 4, 6, 5, 16, 8, 11


def make_inputs(seed=0):
    """Always-ragged masks: at least one padded frame/word per sample (the
    dense all-valid case is subsumed — masked reductions degenerate to
    plain ones when every mask bit is 1)."""
    rng = np.random.RandomState(seed)
    feats = rng.randn(B, T, R, D).astype(np.float32)
    word_ids = rng.randint(0, V, (B, K)).astype(np.int32)
    frame_mask = np.ones((B, T), np.float32)
    word_mask = np.ones((B, K), np.float32)
    for b in range(B):
        frame_mask[b, rng.randint(2, T):] = 0.0
        word_mask[b, rng.randint(1, K):] = 0.0
    params = {
        "word_emb": rng.randn(V, E).astype(np.float32) * 0.1,
        "w_v": rng.randn(D, E).astype(np.float32) * 0.1,
        "b_v": rng.randn(E).astype(np.float32) * 0.01,
    }
    return params, feats, word_ids, frame_mask, word_mask


def to_torch(x):
    return torch.from_numpy(np.asarray(x))


@pytest.mark.parametrize("pool,ctx_window", [
    ("attention", 0), ("mean", 0), ("attention", 2), ("context", 2),
])
def test_forward_parity(pool, ctx_window):
    params, feats, word_ids, fm, wm = make_inputs(seed=1)
    jout = G.ground_forward(params, jnp.asarray(feats), jnp.asarray(word_ids),
                            jnp.asarray(fm), jnp.asarray(wm),
                            temp=0.1, pool=pool, ctx_window=ctx_window)
    tout = O.forward({k: to_torch(v) for k, v in params.items()},
                     to_torch(feats), to_torch(word_ids), to_torch(fm),
                     to_torch(wm), temp=0.1, pool=pool, ctx_window=ctx_window)
    np.testing.assert_allclose(np.asarray(jout["s"]), tout["s"].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout["a"]), tout["a"].numpy(),
                               rtol=1e-4, atol=1e-5)
    if ctx_window > 0:
        np.testing.assert_allclose(np.asarray(jout["shat"]), tout["shat"].numpy(),
                                   rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout["beta"]), tout["beta"].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jout["score"]), tout["score"].numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("pool,ctx_window", [("attention", 0), ("context", 2)])
def test_cross_scores_parity(pool, ctx_window):
    params, feats, word_ids, fm, wm = make_inputs(seed=2)
    w_emb = G.embed_words(jnp.asarray(word_ids), jnp.asarray(params["word_emb"]))
    v_emb = G.project_regions(jnp.asarray(feats), jnp.asarray(params["w_v"]),
                              jnp.asarray(params["b_v"]))
    jmat = G.cross_scores(w_emb, jnp.asarray(wm), v_emb, jnp.asarray(fm),
                          temp=0.1, pool=pool, ctx_window=ctx_window)
    tmat = O.cross_scores({k: to_torch(v) for k, v in params.items()},
                          to_torch(feats), to_torch(word_ids), to_torch(fm),
                          to_torch(wm), temp=0.1, pool=pool,
                          ctx_window=ctx_window)
    np.testing.assert_allclose(np.asarray(jmat), tmat.numpy(), rtol=1e-4, atol=1e-5)


def test_ranking_loss_parity():
    rng = np.random.RandomState(3)
    mat = rng.randn(B, B).astype(np.float32)
    jl = L.ranking_loss(jnp.asarray(mat), margin=0.2)
    tl = O.ranking_loss(to_torch(mat), margin=0.2)
    np.testing.assert_allclose(float(jl), float(tl), rtol=1e-5)


def test_context_loss_parity():
    params, feats, word_ids, fm, wm = make_inputs(seed=4)
    jout = G.ground_forward(params, jnp.asarray(feats), jnp.asarray(word_ids),
                            jnp.asarray(fm), jnp.asarray(wm), ctx_window=2)
    jl = L.context_loss(jout["s"], jout["shat"], jnp.asarray(wm),
                        jnp.asarray(fm), jout["nbr_valid"])
    tout = O.forward({k: to_torch(v) for k, v in params.items()},
                     to_torch(feats), to_torch(word_ids), to_torch(fm),
                     to_torch(wm), ctx_window=2)
    tl = O.context_loss(tout["s"], tout["shat"], to_torch(wm), to_torch(fm),
                        tout["nbr_valid"])
    np.testing.assert_allclose(float(jl), float(tl), rtol=1e-4, atol=1e-6)


def test_cluster_loss_parity():
    params, feats, word_ids, fm, wm = make_inputs(seed=5)
    rng = np.random.RandomState(6)
    centers = rng.randn(7, E).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    jout = G.ground_forward(params, jnp.asarray(feats), jnp.asarray(word_ids),
                            jnp.asarray(fm), jnp.asarray(wm))
    f, valid = L.select_top_regions(jout["s"], jout["v_emb"], jnp.asarray(wm),
                                    jnp.asarray(fm))
    jl, _ = L.cluster_loss(f, valid, jnp.asarray(centers))
    tout = O.forward({k: to_torch(v) for k, v in params.items()},
                     to_torch(feats), to_torch(word_ids), to_torch(fm),
                     to_torch(wm))
    tl = O.cluster_loss(tout["s"], tout["v_emb"], to_torch(wm), to_torch(fm),
                        to_torch(centers))
    np.testing.assert_allclose(float(jl), float(tl), rtol=1e-4, atol=1e-6)


def test_region_masked_parity():
    """The full region-mask semantics vs the oracle (r2 review: every
    earlier parity test ran with all regions valid, so the NEG fills,
    masked affinity softmax, ctx-loss region denominator, and dead-slot
    selection exclusion were only ever checked JAX-vs-JAX). Also uses
    UNNORMALIZED cluster centers so the 'assign via normalized Ĉ,
    distance via raw C' distinction is live."""
    params, feats, word_ids, fm, wm = make_inputs(seed=7)
    rng = np.random.RandomState(8)
    rm = (rng.rand(B, T, R) > 0.35).astype(np.float32)
    rm[:, :, 0] = 1.0                    # every frame keeps >=1 region
    w = 2

    w_emb = G.embed_words(jnp.asarray(word_ids),
                          jnp.asarray(params["word_emb"]))
    v_emb = G.project_regions(jnp.asarray(feats), jnp.asarray(params["w_v"]),
                              jnp.asarray(params["b_v"]))
    s = G.mask_regions(G.similarity_tensor(w_emb, v_emb), jnp.asarray(rm))
    pad3 = ((0, 0), (w, w), (0, 0))
    alpha, nbr_valid = G.region_affinity_ext(
        jnp.pad(v_emb, pad3 + ((0, 0),)), jnp.pad(jnp.asarray(fm), pad3[:2]),
        w, 0.1, rm_ext=jnp.pad(jnp.asarray(rm), pad3))
    shat = G.context_similarity(s, alpha, nbr_valid)
    a = G.frame_mil_max(s, jnp.asarray(fm))

    tout = O.forward({k: to_torch(v) for k, v in params.items()},
                     to_torch(feats), to_torch(word_ids), to_torch(fm),
                     to_torch(wm), ctx_window=w, region_mask=to_torch(rm))
    np.testing.assert_allclose(np.asarray(s), tout["s"].numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(a), tout["a"].numpy(),
                               rtol=1e-4, atol=1e-5)
    # compare ŝ only where the ctx loss reads it (valid center regions)
    sel = np.broadcast_to((rm[:, None, :, :] > 0)
                          & (fm[:, None, :, None] > 0), (B, K, T, R))
    np.testing.assert_allclose(np.asarray(shat)[sel],
                               tout["shat"].numpy()[sel],
                               rtol=1e-4, atol=1e-5)

    jl_ctx = L.context_loss(s, shat, jnp.asarray(wm), jnp.asarray(fm),
                            nbr_valid, region_mask=jnp.asarray(rm))
    tl_ctx = O.context_loss(tout["s"], tout["shat"], to_torch(wm),
                            to_torch(fm), tout["nbr_valid"],
                            region_mask=to_torch(rm))
    np.testing.assert_allclose(float(jl_ctx), float(tl_ctx),
                               rtol=1e-4, atol=1e-6)

    centers = rng.randn(7, E).astype(np.float32) * 1.7   # NOT unit norm
    f, valid = L.select_top_regions(s, v_emb, jnp.asarray(wm),
                                    jnp.asarray(fm),
                                    region_mask=jnp.asarray(rm))
    jl_clu, _ = L.cluster_loss(f, valid, jnp.asarray(centers))
    tl_clu = O.cluster_loss(tout["s"], tout["v_emb"], to_torch(wm),
                            to_torch(fm), to_torch(centers))
    np.testing.assert_allclose(float(jl_clu), float(tl_clu),
                               rtol=1e-4, atol=1e-6)


def test_box_iou_parity():
    rng = np.random.RandomState(7)
    a = np.sort(rng.rand(32, 2, 2), axis=-1).reshape(32, 4).astype(np.float32)
    a = a[:, [0, 2, 1, 3]]
    b = np.sort(rng.rand(32, 2, 2), axis=-1).reshape(32, 4).astype(np.float32)
    b = b[:, [0, 2, 1, 3]]
    from nafae_tpu.ops.iou import box_iou
    np.testing.assert_allclose(np.asarray(box_iou(jnp.asarray(a), jnp.asarray(b))),
                               O.box_iou(to_torch(a), to_torch(b)).numpy(),
                               rtol=1e-5, atol=1e-6)
