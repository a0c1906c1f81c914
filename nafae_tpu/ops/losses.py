"""Loss functions: ranking, contextual similarity, visual clustering.

Math: docs/MATH.md §Ranking / §Contextual / §Visual-clustering. Reference
components per SURVEY.md L143-145 (rank_loss / context_loss / cluster_loss);
the reference computes these with per-frame Python loops (SURVEY.md L182) —
here each is a masked reduction over the full batch tensor.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nafae_tpu.ops.kmeans import kmeans_assign


def rank_denominator(b: int, norm: str) -> int:
    """Normalizer for the ranking-loss hinge sum (docs/MATH.md §Ranking
    [CHOICE], flag `loss.rank_norm`): "pairs" (default) divides by the
    #ordered pairs i≠j (each contributing TWO hinges — the historical
    form), "hinges" by the #hinge terms 2·B·(B−1) (a true per-hinge mean),
    "batch" by B (the 2019-era sum-then-/batch convention)."""
    if norm == "pairs":
        return max(b * (b - 1), 1)
    if norm == "hinges":
        return max(2 * b * (b - 1), 1)
    if norm == "batch":
        return max(b, 1)
    raise ValueError(f"unknown rank_norm {norm!r}; "
                     "choose pairs | hinges | batch")


def ranking_hinge_total(rows: jax.Array, diag_global: jax.Array,
                        row_offset, margin: float) -> jax.Array:
    """Sum of both hinge families contributed by a row block of the score
    matrix — THE one implementation of the MATH.md hinge math, shared by the
    single-device loss below and the DP row-shard decomposition
    (parallel/sharding.ranking_loss_rows), so the two paths cannot drift.

    rows [B_loc, B_glob] (row i's global id = row_offset + i);
    diag_global [B_glob] = S[j,j]. Each ordered pair (i,j)'s two hinges are
    owned by the row they appear in, so disjoint row shards' totals sum to
    exactly the full-matrix total.
    """
    b_loc, b_glob = rows.shape
    gidx = row_offset + jnp.arange(b_loc)                    # global row ids
    is_diag = (jnp.arange(b_glob)[None, :] == gidx[:, None]).astype(rows.dtype)
    off = 1.0 - is_diag
    my_diag = jnp.sum(rows * is_diag, axis=1)                # S[i,i], my rows
    wrong_sent = jax.nn.relu(margin + rows - my_diag[:, None]) * off
    wrong_vid = jax.nn.relu(margin + rows - diag_global[None, :]) * off
    return jnp.sum(wrong_sent) + jnp.sum(wrong_vid)


def ranking_loss(score_mat: jax.Array, margin: float,
                 norm: str = "pairs") -> jax.Array:
    """Max-margin triplet loss over the B×B in-batch score matrix.

    score_mat[i,j] = score(video i, sentence j). Diagonal = positives.
    L = (1/denom) Σ over ordered pairs i≠j of relu(Δ + S[i,j] − S[i,i])
                                            + relu(Δ + S[j,i] − S[i,i]),
    denom per `norm` (rank_denominator).
    """
    b = score_mat.shape[0]
    total = ranking_hinge_total(score_mat, jnp.diagonal(score_mat), 0, margin)
    return total / rank_denominator(b, norm)


def ctx_squared_error(s: jax.Array, shat: jax.Array,
                      target: str = "stopgrad") -> jax.Array:
    """Per-element squared error of the ctx loss, by gradient-flow mode
    (docs/MATH.md §Contextual [CHOICE], flag `loss.ctx_target`). All three
    have the SAME value (s−ŝ)²; they differ only in which side the gradient
    flows through:

    - "stopgrad" (default): ŝ is a teacher — d/ds only.
    - "live": no stop-gradient — d/ds and d/dŝ of the full quadratic
      (each side feels the other; risks collapse to a constant).
    - "symmetric": ½(s−sg ŝ)² + ½(ŝ−sg s)² — each side pulled toward the
      other as a frozen target (half the "live" gradient magnitude per
      side, no collapse direction through the pair interaction).
    """
    if target == "stopgrad":
        return (s - jax.lax.stop_gradient(shat)) ** 2
    if target == "live":
        return (s - shat) ** 2
    if target == "symmetric":
        return 0.5 * ((s - jax.lax.stop_gradient(shat)) ** 2
                      + (shat - jax.lax.stop_gradient(s)) ** 2)
    raise ValueError(f"unknown ctx_target {target!r}; "
                     "choose stopgrad | live | symmetric")


def context_loss_terms(s: jax.Array, shat: jax.Array, word_mask: jax.Array,
                       frame_mask: jax.Array, nbr_valid: jax.Array,
                       region_mask: jax.Array | None = None,
                       target: str = "stopgrad"
                       ) -> tuple[jax.Array, jax.Array]:
    """(numerator, denominator) of L_ctx — the mesh-able form: the train step
    psums num/den across the data/frame axes before dividing (exact global
    mean). region_mask [B,T,R] excludes invalid region slots; REQUIRED
    whenever s was built through mask_regions (the NEG=-1e9 fills would
    otherwise enter (s-ŝ)² and blow the loss up)."""
    has_ctx = (jnp.sum(nbr_valid, axis=-1) > 0).astype(s.dtype)    # [B,T]
    m = (word_mask[:, :, None] * frame_mask[:, None, :] * has_ctx[:, None, :])
    sq = ctx_squared_error(s, shat, target)                        # [B,K,T,R]
    if region_mask is None:
        return jnp.sum(sq * m[..., None]), jnp.sum(m) * s.shape[-1]
    m4 = m[..., None] * region_mask[:, None, :, :]
    return jnp.sum(sq * m4), jnp.sum(m4)


def context_loss(s: jax.Array, shat: jax.Array, word_mask: jax.Array,
                 frame_mask: jax.Array, nbr_valid: jax.Array,
                 region_mask: jax.Array | None = None,
                 target: str = "stopgrad") -> jax.Array:
    """L_ctx = masked mean (s − ŝ)² over valid (b,k,t,r); gradient flow per
    `target` (ctx_squared_error).

    Frames with no valid neighbor (sum_o nbr_valid == 0) contribute zero.
    s, shat: [B,K,T,R]; word_mask [B,K]; frame_mask [B,T]; nbr_valid [B,T,O];
    region_mask [B,T,R] (pass it whenever s was region-masked).
    """
    num, den = context_loss_terms(s, shat, word_mask, frame_mask, nbr_valid,
                                  region_mask, target)
    return num / jnp.maximum(den, 1.0)


def select_top_regions(s: jax.Array, v_emb: jax.Array, word_mask: jax.Array,
                       frame_mask: jax.Array,
                       region_mask: jax.Array | None = None,
                       r_star: jax.Array | None = None
                       ) -> tuple[jax.Array, jax.Array]:
    """Per-(word,frame) argmax region features (stop-grad selection).

    s [B,K,T,R], v_emb [B,T,R,E] -> f [B,K,T,E], valid [B,K,T].
    The argmax index is non-differentiable (stop-grad by construction); the
    gathered feature keeps its gradient, matching docs/MATH.md §Visual-clustering.
    region_mask [B,T,R]: frames with zero valid regions are excluded from
    `valid` — their argmax over all-NEG scores would gather a dead slot's
    embedding into the cluster loss and the k-means refresh.
    r_star [B,K,T]: precomputed argmax indices (train.ARGMAX_2D supplies
    ops/grounding.argmax_regions_2d's relayout-sublane form — the default
    argmax over the R=20 LANE axis is a 37.8 us/step VPU loop fusion at
    config4 shapes; docs/PERF.md r4 trace).
    """
    if r_star is None:
        r_star = jnp.argmax(s, axis=-1)                            # [B,K,T]
    # one-hot matmul instead of take_along_axis: the gather's backward is a
    # scatter-add into [B,T,R,E] (sort-based on TPU, ~50 us/step at
    # production shapes); as an einsum both directions ride the MXU
    # (measured -19 us/step at config4 shapes). Each one-hot row has a
    # single 1, so the sum has one term — exact like the gather, PROVIDED
    # the contraction runs at full precision: pin HIGHEST (not the module
    # PRECISION, which is DEFAULT in bf16 mode and would round the selected
    # features). The op is bandwidth-bound; the extra passes are free.
    onehot = (r_star[..., None] ==
              jnp.arange(s.shape[-1])).astype(v_emb.dtype)         # [B,K,T,R]
    f = jnp.einsum("bktr,btre->bkte", onehot, v_emb,
                   preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)            # [B,K,T,E]
    valid = word_mask[:, :, None] * frame_mask[:, None, :]
    if region_mask is not None:
        any_region = (jnp.max(region_mask, axis=-1) > 0)           # [B,T]
        valid = valid * any_region[:, None, :].astype(valid.dtype)
    return f, valid


# MEASURED DEAD END (default stays off; knob + bitwise test kept): gather
# the cluster-loss target centers with a one-hot MXU dot instead of
# jnp.take. The take lowers as a 14.5 µs kCustom dynamic-gather writing the
# 5 MB [B·K·T, E] target tensor (docs/PERF.md r4 trace, fusion.204); the
# one-hot form is the same trick that won −19 µs at select_top_regions —
# each one-hot row has a single 1, so the HIGHEST-precision contraction is
# EXACT (bitwise the gathered row; f32 centers make HIGHEST mandatory for
# exactness, unlike the bf16 selector dots). Within-process A/B on the full
# config-4 step: 970.7 → 1037.8 µs/step (−67.1, LOSS) — the HIGHEST dot is
# 6-pass on this toolchain (CLAUDE.md Pallas/precision rules), so the
# [5120,67]×[67,256] contraction costs ~5× the gather it replaces. A
# reduced-precision 1-pass dot would round the f32 centers and change the
# MATH.md cluster target, so there is no exact fast form; the gather stays.
# docs/PERF.md "headroom closed".
CLUSTER_TARGET_ONEHOT = False


def _cluster_target(centers: jax.Array, assign: jax.Array) -> jax.Array:
    if not CLUSTER_TARGET_ONEHOT:
        return jnp.take(centers, assign, axis=0)
    onehot = (assign[..., None] ==
              jnp.arange(centers.shape[0])).astype(centers.dtype)
    return jax.lax.dot_general(onehot, centers, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)


def cluster_loss_terms(f: jax.Array, valid: jax.Array, centers: jax.Array,
                       assign_dtype=None
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(numerator, denominator, assignments) of L_clu — the mesh-able form
    (like context_loss_terms): the train step psums num/den across the mesh
    before dividing, so ONE implementation of the MATH.md cluster formula
    serves both the oracle-parity path and the sharded training path.
    assign_dtype: forwarded to kmeans_assign (MXU sims, compute dtype)."""
    n = f.shape[:-1]
    assign = kmeans_assign(f, centers, dtype=assign_dtype)         # [..]
    target = jax.lax.stop_gradient(
        _cluster_target(centers, assign.reshape(-1)).reshape(*n, -1))
    sq = jnp.sum((f - target) ** 2, axis=-1)                       # [..]
    return jnp.sum(sq * valid), jnp.sum(valid), assign


def cluster_loss(f: jax.Array, valid: jax.Array,
                 centers: jax.Array) -> tuple[jax.Array, jax.Array]:
    """L_clu = masked mean ‖f − sg[C[c*]]‖², c* = cosine argmax assignment.

    f [..,E], valid [..], centers [Kc,E]. Returns (loss, assignments [..]).
    """
    num, den, assign = cluster_loss_terms(f, valid, centers)
    return num / jnp.maximum(den, 1.0), assign
