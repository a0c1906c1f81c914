"""Padding/masking invariance properties (SURVEY.md L352: masks must flow
into max, softmax, argmax, and loss normalizers identically).

Property: appending PADDED (masked-out) frames, words, or batch rows must not
change any loss value or eval result — the shape-static bucketing discipline
depends on this exactly.
"""

import numpy as np

import jax
import jax.numpy as jnp

from nafae_tpu.config import load_config
from nafae_tpu.train import compute_losses

OV = ["data.feat_dim=32", "model.feat_dim=32", "model.embed_dim=16",
      "loss.num_clusters=5", "loss.ctx_window=2"]


def _batch(b, t, k, rng, t_valid, k_valid):
    feats = rng.randn(b, t, 5, 32).astype(np.float32)
    fm = np.zeros((b, t), np.float32)
    wm = np.zeros((b, k), np.float32)
    for i in range(b):
        fm[i, :t_valid[i]] = 1.0
        wm[i, :k_valid[i]] = 1.0
    # padded slots must not matter: fill them with garbage to prove it
    feats[fm == 0] = 1e3
    return {
        "feats": jnp.asarray(feats),
        "boxes": jnp.asarray(np.abs(rng.rand(b, t, 5, 4)).astype(np.float32)),
        "word_ids": jnp.asarray(rng.randint(0, 67, (b, k)).astype(np.int32)),
        "frame_mask": jnp.asarray(fm),
        "word_mask": jnp.asarray(wm),
        "segment_id": jnp.arange(b, dtype=jnp.int32),
    }


def _losses(batch, cfg, params, centers):
    _, aux = compute_losses(params, centers, batch, cfg, 0)
    return {k: float(v) for k, v in aux.items()
            if k in ("loss", "l_rank", "l_ctx", "l_clu", "score_pos")}


def test_frame_and_word_padding_invariance():
    cfg = load_config(preset_name="config4", overrides=OV)
    rng = np.random.RandomState(0)
    t_valid = [3, 4, 2, 4]
    k_valid = [2, 1, 3, 2]
    from nafae_tpu.models.grounding import init_params
    from nafae_tpu.ops.kmeans import kmeans_init
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    centers = kmeans_init(jax.random.PRNGKey(1), 5, 16)

    small = _batch(4, 4, 3, np.random.RandomState(42), t_valid, k_valid)
    big = _batch(4, 7, 6, np.random.RandomState(43), t_valid, k_valid)
    # copy the valid region of `small` into `big` so only padding differs
    for i in range(4):
        big["feats"] = big["feats"].at[i, :4].set(small["feats"][i])
        big["word_ids"] = big["word_ids"].at[i, :3].set(small["word_ids"][i])
    big["frame_mask"] = jnp.pad(small["frame_mask"], ((0, 0), (0, 3)))
    big["word_mask"] = jnp.pad(small["word_mask"], ((0, 0), (0, 3)))

    r_small = _losses(small, cfg, params, centers)
    r_big = _losses(big, cfg, params, centers)
    for k in r_small:
        np.testing.assert_allclose(r_big[k], r_small[k], rtol=1e-5,
                                   atol=1e-6, err_msg=k)


def test_eval_ignores_padded_regions():
    """Garbage in masked frames/words cannot produce eval hits."""
    from nafae_tpu.ops.grounding import ground_forward
    from nafae_tpu.ops.iou import grounding_hits
    from nafae_tpu.models.grounding import init_params
    cfg = load_config(preset_name="config1", overrides=OV)
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.RandomState(1)
    b1 = _batch(2, 5, 3, np.random.RandomState(7), [3, 2], [2, 1])
    out = ground_forward(params, b1["feats"], b1["word_ids"],
                         b1["frame_mask"], b1["word_mask"])
    gt_boxes = jnp.asarray(np.abs(rng.rand(2, 3, 5, 4)).astype(np.float32))
    gt_mask = (b1["word_mask"][:, :, None] * b1["frame_mask"][:, None, :])
    correct, gm = grounding_hits(out["s"], b1["boxes"], gt_boxes, gt_mask)
    # hits only possible where gt_mask is on
    assert float(jnp.sum(correct * (1 - gm))) == 0.0


def test_batch_padding_changes_only_ranking():
    """Extra batch rows change in-batch negatives (by design) but a row's
    own diag score is batch-independent."""
    cfg = load_config(preset_name="config2", overrides=OV)
    from nafae_tpu.models.grounding import init_params
    from nafae_tpu.ops import grounding as G
    params = init_params(jax.random.PRNGKey(0), cfg.model)
    rng = np.random.RandomState(3)
    batch = _batch(4, 4, 3, rng, [3, 4, 2, 3], [2, 2, 1, 3])
    w = G.embed_words(batch["word_ids"], params["word_emb"])
    v = G.project_regions(batch["feats"], params["w_v"], params["b_v"])
    full = G.cross_scores(w, batch["word_mask"], v, batch["frame_mask"],
                          0.1, "attention")
    half = G.cross_scores(w[:2], batch["word_mask"][:2], v[:2],
                          batch["frame_mask"][:2], 0.1, "attention")
    np.testing.assert_allclose(np.asarray(full[:2, :2]), np.asarray(half),
                               rtol=1e-5)
