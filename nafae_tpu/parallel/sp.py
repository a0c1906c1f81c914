"""Sequence parallelism over the frame axis (SP) — SURVEY.md L160, L280.

The frame axis T is this model's sequence axis. For long clips T is sharded
over the mesh's `frame` axis; the reference has no equivalent (clip length
was bounded by single-GPU memory, SURVEY.md L280). Three primitives make the
sharded math EXACTLY equal to the unsharded run:

* halo_exchange — the context window needs w neighbor frames from adjacent
  shards: one ppermute each way for w ≤ T_local, a ceil(w/T_local)-hop
  ppermute chain when the window spans multiple shards (edge shards receive
  zeros, which the mask semantics already treat as out-of-range — identical
  to the zero-padding the unsharded path uses).
* sp_video_scores — frame-attention softmax over the GLOBAL T via online
  softmax: pmax of the logit max, psum of the exp-sum (the ring-attention
  normalizer trick applied to attention pooling).
* sp_cross_scores — the B×B ranking score matrix from frame-sharded region
  tensors; every frame shard ends with identical rows.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nafae_tpu.ops import grounding as G
from nafae_tpu.ops.grounding import NEG  # ONE masked-fill constant: the SP
# online softmax must use the identical fill as the unsharded
# frame_attention or the SP==single-device invariant breaks


def halo_exchange(x: jax.Array, window: int, axis_name: str,
                  t_axis: int = 1) -> jax.Array:
    """x [.., Tl, ..] -> [.., w+Tl+w, ..] with real halos from neighbor shards.

    Edge shards receive zeros in their outer halo (ppermute semantics), which
    downstream masks treat as invalid — matching unsharded zero-padding.
    """
    n = jax.lax.axis_size(axis_name)
    tl = x.shape[t_axis]

    def tslice(lo, hi):
        idx = [slice(None)] * x.ndim
        idx[t_axis] = slice(lo, hi)
        return x[tuple(idx)]

    shift_right = [(i, i + 1) for i in range(n - 1)]
    shift_left = [(i + 1, i) for i in range(n - 1)]

    if window <= tl:
        # single hop, window-sized transfers (the common, cheap case)
        to_right = tslice(tl - window, tl)   # my tail -> right nbr's left halo
        to_left = tslice(0, window)          # my head -> left nbr's right halo
        left_halo = jax.lax.ppermute(to_right, axis_name, perm=shift_right)
        right_halo = jax.lax.ppermute(to_left, axis_name, perm=shift_left)
    else:
        # window spans multiple shards (many frame shards => few local
        # frames): chain ppermutes so hop d delivers the FULL block of the
        # shard d positions away, then statically slice the needed halo.
        # Shards near the mesh edge receive zeros for out-of-range hops
        # (ppermute semantics), which downstream masks treat as invalid —
        # identical to the unsharded zero-padding.
        hops = -(-window // tl)              # ceil
        lcarry = rcarry = x
        lblocks, rblocks = [], []
        for _ in range(hops):
            lcarry = jax.lax.ppermute(lcarry, axis_name, perm=shift_right)
            rcarry = jax.lax.ppermute(rcarry, axis_name, perm=shift_left)
            lblocks.insert(0, lcarry)        # farthest-left block first
            rblocks.append(rcarry)           # nearest-right block first
        left_halo = jnp.concatenate(lblocks, axis=t_axis)[
            tuple(slice(None) if i != t_axis else
                  slice(hops * tl - window, hops * tl)
                  for i in range(x.ndim))]
        right_halo = jnp.concatenate(rblocks, axis=t_axis)[
            tuple(slice(None) if i != t_axis else slice(0, window)
                  for i in range(x.ndim))]
    return jnp.concatenate([left_halo, x, right_halo], axis=t_axis)


def sp_video_scores(a: jax.Array, word_mask: jax.Array, frame_mask: jax.Array,
                    temp: float, pool: str, frame_axis: str,
                    frame_logits: jax.Array | None = None
                    ) -> tuple[jax.Array, jax.Array]:
    """Frame-sharded video_scores: a [..,K,Tl] -> (S [..], β_local [..,Tl]).

    S is identical on every frame shard (online softmax + psum over shards).
    """
    g = (frame_logits if frame_logits is not None
         else G._masked_word_mean(a, word_mask))
    if pool == "mean":
        cnt = jax.lax.psum(jnp.sum(frame_mask, axis=-1), frame_axis)
        beta = frame_mask / jnp.maximum(cnt, 1.0)[..., None]
        beta = jnp.broadcast_to(beta, g.shape)
    else:
        logits = jnp.where(frame_mask > 0, g / temp, NEG)
        # softmax is shift-invariant: the global max is for numerics only, so
        # stop_gradient is exact (and pmax has no differentiation rule anyway)
        m = jax.lax.stop_gradient(
            jax.lax.pmax(jnp.max(jax.lax.stop_gradient(logits), axis=-1),
                         frame_axis))                            # [..]
        e = jnp.exp(logits - m[..., None]) * frame_mask
        den = jax.lax.psum(jnp.sum(e, axis=-1), frame_axis)
        beta = e / jnp.maximum(den, 1e-30)[..., None]
    s_w = jax.lax.psum(jnp.sum(beta[..., None, :] * a, axis=-1), frame_axis)
    s = jnp.sum(s_w * word_mask, axis=-1) / jnp.maximum(
        jnp.sum(word_mask, axis=-1), 1.0)
    return s, beta


def sp_cross_scores(w_emb: jax.Array, word_mask: jax.Array,
                    v_emb: jax.Array, frame_mask: jax.Array,
                    temp: float, pool: str, frame_axis: str,
                    ctx_window: int = 0, ctx_temp: float = 0.1,
                    dtype=None, region_mask: jax.Array | None = None,
                    ctx_impl: str = "offset",
                    u: jax.Array | None = None,
                    frame_logits: jax.Array | None = None) -> jax.Array:
    """Frame-sharded cross_scores. v_emb [I,Tl,R,E] local frames; w_emb/
    word_mask are the (data-axis-gathered) global sentences. Returns
    rows [I_loc, J_glob], identical across frame shards. u: precomputed
    context-mixed embeddings (skips the internal halo + context_mix).
    frame_logits: precomputed per-LOCAL-frame logits [I,Tl] (the
    pool="learned" scorer); the online softmax normalizes over global T."""
    fm = frame_mask[:, None, :]
    wm = word_mask[None, :, :]
    g_learned = (frame_logits[:, None, :]
                 if frame_logits is not None else None)
    we, ve = G._cast2(w_emb, v_emb, dtype)
    s = jnp.einsum("jke,itre->ijktr", we, ve,
                   preferred_element_type=jnp.float32,
                   precision=G.PRECISION)                     # [I,J,K,Tl,R]
    s = G.mask_regions(s, region_mask)
    a = G.frame_mil_max(s, fm)
    frame_logits = g_learned
    if pool == "context" and ctx_window > 0:
        if u is None:
            v_ext = halo_exchange(v_emb, ctx_window, frame_axis)
            fm_ext = halo_exchange(frame_mask, ctx_window, frame_axis)
            rm_ext = (halo_exchange(region_mask, ctx_window, frame_axis)
                      if region_mask is not None else None)
            u, _ = G.context_mix(v_ext, fm_ext, ctx_window, ctx_temp,
                                 dtype=dtype, rm_ext=rm_ext, impl=ctx_impl)
        ue, we2 = G._cast2(u, w_emb, dtype)
        shat = jnp.einsum("jke,itre->ijktr", we2, ue,
                          preferred_element_type=jnp.float32,
                          precision=G.PRECISION)
        shat = G.mask_regions(shat, region_mask)
        ahat = G.frame_mil_max(shat, fm)
        frame_logits = G._masked_word_mean(ahat, wm)
    return sp_video_scores(a, wm, fm, temp,
                           "attention" if pool in ("context", "learned")
                           else pool,
                           frame_axis, frame_logits=frame_logits)[0]

