"""Grounding model: word embedding + region projection into a joint space.

Replaces the reference's `GroundModel` nn.Module (SURVEY.md L98, L140-142).
The parameter tree is deliberately tiny (embedding + one projection), matching
the reference's capacity; all heavy math lives in `nafae_tpu.ops` as pure
functions so the same code path is used by jit, shard_map, and the Pallas
fused kernel. A thin flax.linen wrapper is provided for the public API.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from nafae_tpu.config import ModelConfig
from nafae_tpu.ops.grounding import ground_forward


def init_params(key: jax.Array, cfg: ModelConfig) -> dict:
    """Initialize the functional parameter tree {word_emb, w_v, b_v}."""
    k_emb, k_proj = jax.random.split(key)
    scale_emb = 1.0 / jnp.sqrt(cfg.embed_dim)
    scale_proj = 1.0 / jnp.sqrt(cfg.feat_dim)
    return {
        "word_emb": jax.random.normal(k_emb, (cfg.vocab_size, cfg.embed_dim)) * scale_emb,
        "w_v": jax.random.normal(k_proj, (cfg.feat_dim, cfg.embed_dim)) * scale_proj,
        "b_v": jnp.zeros((cfg.embed_dim,)),
    }


class GroundingModel(nn.Module):
    """flax.linen wrapper over the functional core (public API convenience)."""

    cfg: ModelConfig
    ctx_window: int = 0
    ctx_temp: float = 0.1

    @nn.compact
    def __call__(self, feats, word_ids, frame_mask, word_mask):
        c = self.cfg
        params = {
            "word_emb": self.param(
                "word_emb", nn.initializers.normal(1.0 / c.embed_dim ** 0.5),
                (c.vocab_size, c.embed_dim)),
            "w_v": self.param(
                "w_v", nn.initializers.normal(1.0 / c.feat_dim ** 0.5),
                (c.feat_dim, c.embed_dim)),
            "b_v": self.param("b_v", nn.initializers.zeros, (c.embed_dim,)),
        }
        return ground_forward(
            params, feats, word_ids, frame_mask, word_mask,
            temp=c.frame_attn_temp, pool=c.frame_pool,
            ctx_window=self.ctx_window, ctx_temp=self.ctx_temp,
            compute_dtype=jnp.dtype(c.dtype))
