"""Grounding model: word embedding + region projection into a joint space.

Replaces the reference's `GroundModel` nn.Module (SURVEY.md L98, L140-142).
The parameter tree is deliberately tiny (embedding + one projection), matching
the reference's capacity; all heavy math lives in `nafae_tpu.ops` as pure
functions so the same code path is used by jit, shard_map, and the Pallas
fused kernel. A thin flax.linen wrapper is provided for the public API.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
from flax import linen as nn

from nafae_tpu.config import ModelConfig
from nafae_tpu.ops.grounding import ground_forward


FRAME_POOLS = ("attention", "mean", "context", "learned")
SIMILARITIES = ("cosine", "bilinear")


def _validate_choices(cfg: ModelConfig) -> None:
    """Fail fast on typo'd [CHOICE] flags: frame_attention treats every
    non-"mean" pool as softmax attention, so e.g. frame_pool="contxt" would
    otherwise SILENTLY train the default variant and mislabel a sweep."""
    if cfg.frame_pool not in FRAME_POOLS:
        raise ValueError(f"unknown model.frame_pool {cfg.frame_pool!r}; "
                         f"choose one of {' | '.join(FRAME_POOLS)}")
    if cfg.similarity not in SIMILARITIES:
        raise ValueError(f"unknown model.similarity {cfg.similarity!r}; "
                         f"choose one of {' | '.join(SIMILARITIES)}")


def init_params(key: jax.Array, cfg: ModelConfig,
                word_vectors=None) -> dict:
    """Initialize the functional parameter tree {word_emb, w_v, b_v}.

    word_vectors: optional [vocab_size, embed_dim] array (e.g. GloVe vectors
    for the 67 object words — the reference lineage optionally seeds its word
    embedding this way, SURVEY.md L133). Loaded via load_word_vectors().
    """
    _validate_choices(cfg)
    k_emb, k_proj = jax.random.split(key)
    scale_emb = 1.0 / jnp.sqrt(cfg.embed_dim)
    scale_proj = 1.0 / jnp.sqrt(cfg.feat_dim)
    if word_vectors is not None:
        word_emb = jnp.asarray(word_vectors, jnp.float32)
        if word_emb.shape != (cfg.vocab_size, cfg.embed_dim):
            raise ValueError(
                f"word_vectors shape {word_emb.shape} != "
                f"({cfg.vocab_size}, {cfg.embed_dim})")
    else:
        word_emb = jax.random.normal(
            k_emb, (cfg.vocab_size, cfg.embed_dim)) * scale_emb
    params = {
        "word_emb": word_emb,
        "w_v": jax.random.normal(k_proj, (cfg.feat_dim, cfg.embed_dim)) * scale_proj,
        "b_v": jnp.zeros((cfg.embed_dim,)),
    }
    if cfg.frame_pool == "learned":
        # learned frame-attention scorer (docs/MATH.md step 5 [CHOICE]):
        # g[b,t] = mean_r(v̂)·attn_w — bias-free (softmax shift-invariance
        # makes a bias a dead parameter; see ops.grounding.learned_frame_logits)
        k_attn = jax.random.fold_in(k_proj, 1)
        params["attn_w"] = jax.random.normal(
            k_attn, (cfg.embed_dim,)) * scale_emb
    if cfg.similarity == "bilinear":
        # bilinear similarity s = ŵᵀ·M·v̂ (docs/MATH.md step 3 [CHOICE]):
        # IDENTITY init, so a bilinear model starts exactly at the cosine
        # form (same losses, same goldens at step 0) and learns the metric
        # from there — folded into the word side (ops.grounding.embed_words)
        params["m_sim"] = jnp.eye(cfg.embed_dim, dtype=jnp.float32)
    return params


def load_word_vectors(path: str, vocab, embed_dim: int):
    """Load GloVe-style text vectors ("word v1 v2 ...") or an .npz for the
    vocab's classes; missing words fall back to random-normal rows."""
    import numpy as np
    rng = np.random.RandomState(0)
    out = rng.randn(len(vocab), embed_dim).astype(np.float32) / np.sqrt(embed_dim)
    if path.endswith(".npz"):
        with np.load(path) as z:
            table = {k: z[k] for k in z.files}
    else:
        table = {}
        bad_dim = None
        with open(path) as f:
            for ln in f:
                parts = ln.rstrip().split(" ")
                if len(parts) < 2:
                    continue
                if len(parts) != embed_dim + 1:
                    bad_dim = len(parts) - 1   # exact match only: silently
                    continue                   # truncating a longer vector
                                               # seeds meaningless prefixes
                table[parts[0]] = np.asarray(parts[1:], np.float32)
        if not table and bad_dim is not None:
            raise ValueError(
                f"{path}: vectors are {bad_dim}-d but embed_dim={embed_dim} "
                "— set model.embed_dim to match the file (or convert it); "
                "refusing to truncate")
    hits = 0
    for i, cls in enumerate(vocab.classes):
        vec = table.get(cls)
        if vec is None:
            # multi-word class ("bell pepper"/"bell_pepper"): GloVe tables
            # are per-token — use the mean of the constituent vectors (the
            # standard phrase-init convention) when every token is present
            toks = [t for t in re.split(r"[\s_]+", cls) if t]
            if len(toks) > 1:
                parts = [table.get(t) for t in toks]
                if all(p is not None and len(p) == embed_dim for p in parts):
                    vec = np.mean(parts, axis=0)
        if vec is not None and len(vec) == embed_dim:
            out[i] = vec
            hits += 1
    return out, hits


class GroundingModel(nn.Module):
    """flax.linen wrapper over the functional core (public API convenience)."""

    cfg: ModelConfig
    ctx_window: int = 0
    ctx_temp: float = 0.1

    @nn.compact
    def __call__(self, feats, word_ids, frame_mask, word_mask):
        c = self.cfg
        _validate_choices(c)
        params = {
            "word_emb": self.param(
                "word_emb", nn.initializers.normal(1.0 / c.embed_dim ** 0.5),
                (c.vocab_size, c.embed_dim)),
            "w_v": self.param(
                "w_v", nn.initializers.normal(1.0 / c.feat_dim ** 0.5),
                (c.feat_dim, c.embed_dim)),
            "b_v": self.param("b_v", nn.initializers.zeros, (c.embed_dim,)),
        }
        if c.frame_pool == "learned":
            params["attn_w"] = self.param(
                "attn_w", nn.initializers.normal(1.0 / c.embed_dim ** 0.5),
                (c.embed_dim,))
        if c.similarity == "bilinear":
            params["m_sim"] = self.param(
                "m_sim", lambda _, shape: jnp.eye(shape[0], dtype=jnp.float32),
                (c.embed_dim, c.embed_dim))
        return ground_forward(
            params, feats, word_ids, frame_mask, word_mask,
            temp=c.frame_attn_temp, pool=c.frame_pool,
            ctx_window=self.ctx_window, ctx_temp=self.ctx_temp,
            compute_dtype=jnp.dtype(c.dtype))
