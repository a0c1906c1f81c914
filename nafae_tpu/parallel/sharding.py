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
    """
    from nafae_tpu.ops.losses import rank_denominator

    b_loc, b_glob = rows.shape
    gidx = row_offset + jnp.arange(b_loc)                    # global ids of my rows
    is_diag = (jnp.arange(b_glob)[None, :] == gidx[:, None]).astype(rows.dtype)
    off = 1.0 - is_diag
    my_diag = jnp.sum(rows * is_diag, axis=1)                # S[i,i] for my rows
    wrong_sent = jax.nn.relu(margin + rows - my_diag[:, None]) * off
    wrong_vid = jax.nn.relu(margin + rows - diag_global[None, :]) * off
    total = jnp.sum(wrong_sent) + jnp.sum(wrong_vid)
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
