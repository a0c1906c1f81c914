"""Distributed grounding: DP ranking decomposition over the data axis.

The ranking loss uses in-batch negatives over the GLOBAL batch. Under data
parallelism each device holds a row shard of the B×B score matrix (its own
videos × all sentences). Gathering all region embeddings would move
B·T·R·E floats over ICI; instead only the word embeddings (B·K·E, ~1000×
smaller) and the diagonal are gathered, using the identity

  Σ_{i≠j} relu(Δ+S[j,i]−S[i,i])  =  Σ_{i≠j} relu(Δ+S[i,j]−S[j,j])

so both hinge terms are computable from row shards + the global diagonal
(docs/MATH.md §Ranking; SURVEY.md L157 "gradients via XLA all-reduce over ICI").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nafae_tpu.ops import grounding as G


def ranking_loss_rows(rows: jax.Array, diag_global: jax.Array,
                      row_offset: int | jax.Array, margin: float,
                      axis_name: str | None = None,
                      norm: str = "pairs") -> jax.Array:
    """Ranking loss from a row shard `rows` [B_loc, B_glob] + global diagonal.

    row_offset: global index of local row 0. With axis_name, the per-device
    partial sums are psum-reduced so every device returns the GLOBAL loss.
    norm: hinge-sum normalizer over the GLOBAL batch (losses.rank_denominator).
    The hinge math itself lives in ONE place — losses.ranking_hinge_total —
    shared with the single-device ranking_loss, so the paths cannot drift.
    """
    from nafae_tpu.ops.losses import rank_denominator, ranking_hinge_total

    b_glob = rows.shape[1]
    total = ranking_hinge_total(rows, diag_global, row_offset, margin)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
    return total / rank_denominator(b_glob, norm)


def gather_words(w_emb: jax.Array, word_mask: jax.Array,
                 axis_name: str) -> tuple[jax.Array, jax.Array]:
    """All-gather word embeddings + masks along the data axis (tiled)."""
    gw = jax.lax.all_gather(w_emb, axis_name, tiled=True)
    gm = jax.lax.all_gather(word_mask, axis_name, tiled=True)
    return gw, gm


def gather_diag(diag_local: jax.Array, axis_name: str) -> jax.Array:
    """All-gather the local diagonal entries into the global diagonal [B_glob]."""
    return jax.lax.all_gather(diag_local, axis_name, tiled=True)
