"""Fused cross-similarity + MIL-max Pallas kernel (custom VJP).

The ranking loss needs a[i,j,k,t] = max_r ŵ[j,k]·v̂[i,t,r] over the global
batch. The jnp path materializes the [I,J,K,T,R] score tensor in HBM
(e.g. 262 MB at production shapes) before the max; this kernel computes one
video's scores in VMEM ([M=J·K, T·R] tile straight off the MXU) and reduces
immediately, so only the [I,J,K,T] result (~1/R the bytes) ever touches HBM.

Backward uses the saved argmax indices: gradients flow only through the
winning region (max subgradient), implemented as a memory-light lax.scan
over videos — per-step intermediates are O(J·K·T·R), never the full tensor.

Reference math: ops/grounding.py cross einsum + frame_mil_max (SURVEY.md
L141-142 "similarity tensor / frame MIL" — the reference's per-frame Python
hot loop, SURVEY.md L179).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _vma_of(*xs) -> frozenset:
    """Union of the inputs' varying-mesh-axes. Nonempty only inside a
    shard_map(check_vma=True) trace, where pallas outputs must declare how
    they vary across mesh axes (vma-annotated ShapeDtypeStruct)."""
    vma = frozenset()
    for x in xs:
        vma |= frozenset(getattr(jax.typeof(x), "vma", ()) or ())
    return vma


def _sds(shape, dtype, vma):
    """ShapeDtypeStruct carrying the callers' vma (required under
    shard_map(check_vma=True); plain struct otherwise)."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _match_vma(x, *like):
    """Broadcast x's varying-mesh-axes to the union of `like`'s (no-op
    outside shard_map). Needed where literal-initialized values (e.g. scan
    carries) must type-match vma-carrying values."""
    missing = _vma_of(*like) - _vma_of(x)
    if missing:
        x = jax.lax.pcast(x, tuple(missing), to="varying")
    return x


def _vma_needs_fallback(*xs) -> bool:
    """True when the kernel cannot run: interpret-mode pallas evaluates the
    kernel jaxpr under the vma trace, where block values (varying) cannot
    mix with kernel literals (unvarying). On real TPU the body is lowered
    by Mosaic outside the vma system, so only out_shape needs annotating."""
    return _interpret() and bool(_vma_of(*xs))


def _score_precision(dtype) -> jax.lax.Precision:
    """HIGHEST for f32 operands (oracle parity); DEFAULT for bf16 — Mosaic
    rejects fp32 contract precision on bf16 vectors ('Bad lhs type'), and a
    single bf16 MXU pass with f32 accumulation is the intended fast mode."""
    return (jax.lax.Precision.DEFAULT if jnp.dtype(dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _fwd_kernel(w_ref, v_ref, fm_ref, rm_ref, a_ref, idx_ref, *, T, R, R_pad):
    """Per-video tile: scores = w @ v_iᵀ on the MXU, then per-frame masked max.

    w_ref:  [M, E]        all words of all sentences (flattened J·K)
    v_ref:  [1, T*R_pad, E]  one video's region embeddings (R padded)
    fm_ref: [1, 1, T]     frame mask
    rm_ref: [1, 1, T*R_pad]  region validity (data-dependent, R_pad-padded)
    a_ref:  [M, T]        output MIL max
    idx_ref:[M, T]        output argmax region index (for the VJP)
    """
    w = w_ref[:]
    m = w.shape[0]
    # Mosaic cannot shape-cast the lane dim into (T, R_pad), so frames are
    # processed in groups of G = 128//R_pad per matmul (full 128-lane tiles)
    # and reduced with static lane slices.
    G = max(1, 128 // R_pad)
    for g0 in range(0, T, G):
        gcnt = min(G, T - g0)
        v_g = v_ref[0, g0 * R_pad:(g0 + gcnt) * R_pad, :]  # [gcnt*R_pad, E]
        scores = jax.lax.dot_general(
            w, v_g, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_score_precision(w.dtype))           # [M, gcnt*R_pad]
        lane_r = jax.lax.broadcasted_iota(
            jnp.int32, (m, gcnt * R_pad), 1) % R_pad
        scores = jnp.where(lane_r < R, scores, NEG)
        rm_g = rm_ref[0, :, g0 * R_pad:(g0 + gcnt) * R_pad]  # [1, gcnt*R_pad]
        scores = jnp.where(rm_g > 0, scores, NEG)
        for u in range(gcnt):
            t = g0 + u
            chunk = scores[:, u * R_pad:(u + 1) * R_pad]   # [M, R_pad]
            mx = jnp.max(chunk, axis=1)
            a_ref[0, :, t] = jnp.where(fm_ref[0, 0, t] > 0, mx, 0.0)
            idx_ref[0, :, t] = jnp.argmax(chunk, axis=1).astype(jnp.int32)


def _rollmax_kernel(w_ref, v_ref, fm_ref, rm_ref, sel_ref, a_ref, idx_ref,
                    *, N, R, R_pad):
    """i-tiled forward: ONE MXU matmul for the whole tile, then a windowed
    roll-max over the R_pad-lane groups and a selection-matrix matmul to
    extract per-frame max/argmax — no per-column writes, no reshapes.

    w_ref [M,E]; v_ref [1, N, E] (N = IT*T*R_pad flattened regions);
    fm_ref [1, 1, IT*T] frame mask; rm_ref [1, 1, N] region validity;
    sel_ref [N, IT*T] group-start selector; outputs a/idx [1, M, IT*T].
    """
    scores = jax.lax.dot_general(
        w_ref[:], v_ref[0], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_score_precision(w_ref.dtype))           # [M, N]
    m = scores.shape[0]
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (m, N), 1) % R_pad
    v = jnp.where(lane_r < R, scores, NEG)
    v = jnp.where(rm_ref[0] > 0, v, NEG)                   # [1,N] bcast over M
    ix = lane_r
    s = R_pad // 2
    while s >= 1:                                          # windowed tree max
        v2 = pltpu.roll(v, N - s, 1)                       # circular left by s
        i2 = pltpu.roll(ix, N - s, 1)
        # ties keep the SMALLER region index so argmax matches jnp.argmax
        # (first max) — `v2 > v` alone kept whichever candidate sat in the
        # current lane, which can be the higher index after earlier rounds
        take = (v2 > v) | ((v2 == v) & (i2 < ix))
        v = jnp.where(take, v2, v)
        ix = jnp.where(take, i2, ix)
        s //= 2
    sel = sel_ref[:]
    dn = (((1,), (0,)), ((), ()))
    hp = jax.lax.Precision.HIGHEST
    a = jax.lax.dot_general(v, sel, dn, preferred_element_type=jnp.float32,
                            precision=hp)                  # [M, IT*T]
    idx = jax.lax.dot_general(ix.astype(jnp.float32), sel, dn,
                              preferred_element_type=jnp.float32,
                              precision=hp)
    fm = fm_ref[0]                                         # [1, IT*T]
    a_ref[0] = jnp.where(fm > 0, a, 0.0)
    idx_ref[0] = idx.astype(jnp.int32)


def _rollmax_lanes(m_pad: int, t: int, r_pad: int, i: int,
                   e: int = 256) -> int:
    """Videos per tile such that the whole program fits the 16MB scoped
    VMEM even inside a large jitted train step: ~8 live [M_pad, N] f32/i32
    roll buffers PLUS the N-scaled inputs — the [N, E] v block and the
    [N, N/r_pad] selector matrix (r2 review fix: bounding only M_pad*N
    let a small-M call, e.g. single-caption eval with M_pad=16, pick a
    huge tile whose selector alone was 13 MB). 12 MB element budget — at
    the empirically-validated M_pad=256/N=640 production point this model
    gives 5.9 MB and picks the same it=1; the B=128 OOM case (M=1024)
    correctly returns 0 (caller uses the lane-grouped kernel)."""
    budget_elems = 3 * 1024 * 1024        # 12 MB of f32
    best = 0
    for it in range(1, i + 1):
        n = it * t * r_pad
        cost = 8 * m_pad * n + n * e + n * (n // r_pad)
        if cost <= budget_elems:
            best = it
        else:
            break
    return min(i, best)


def _cross_mil_fwd_rollmax(w_flat, v, fm, rm, dtype=None):
    """Tiled roll-max forward (requires R <= 32). Shapes as in _fwd_impl."""
    m, e = w_flat.shape
    i, t, r, _ = v.shape
    r_pad = 32
    m_pad = _round_up(m, 8)
    it = _rollmax_lanes(m_pad, t, r_pad, i, e)             # videos per tile
    i_pad = _round_up(i, it)
    if r_pad != r:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))
        rm = jnp.pad(rm, ((0, 0), (0, 0), (0, r_pad - r)))
    if i_pad != i:
        v = jnp.pad(v, ((0, i_pad - i), (0, 0), (0, 0), (0, 0)))
        fm = jnp.pad(fm, ((0, i_pad - i), (0, 0)))
        rm = jnp.pad(rm, ((0, i_pad - i), (0, 0), (0, 0)))
    if m_pad != m:
        w_flat = jnp.pad(w_flat, ((0, m_pad - m), (0, 0)))
    nb = i_pad // it
    n = it * t * r_pad
    v2 = v.reshape(nb, n, e)
    fm2 = fm.reshape(nb, 1, it * t)
    rm2 = rm.reshape(nb, 1, n)
    sel = jnp.zeros((n, it * t), jnp.float32).at[
        jnp.arange(it * t) * r_pad, jnp.arange(it * t)].set(1.0)

    kernel = functools.partial(_rollmax_kernel, N=n, R=r, R_pad=r_pad)
    a, idx = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((m_pad, e), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, e), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, it * t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, it * t), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m_pad, it * t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, it * t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((nb, m_pad, it * t), jnp.float32,
                 _vma_of(w_flat, v2, fm2, rm2)),
            _sds((nb, m_pad, it * t), jnp.int32,
                 _vma_of(w_flat, v2, fm2, rm2)),
        ],
        interpret=_interpret(),
    )(w_flat, v2, fm2, rm2, sel)
    # [nb, M, IT*T] -> [nb, M, IT, T] -> [I, M, T]
    a = jnp.moveaxis(a.reshape(nb, m_pad, it, t), 2, 1).reshape(i_pad, m_pad, t)
    idx = jnp.moveaxis(idx.reshape(nb, m_pad, it, t), 2, 1).reshape(
        i_pad, m_pad, t)
    return a[:i, :m, :], idx[:i, :m, :]


def _cross_mil_fwd_impl(w_flat: jax.Array, v: jax.Array, fm: jax.Array,
                        rm: jax.Array):
    """w_flat [M,E], v [I,T,R,E], fm [I,T], rm [I,T,R] -> a/idx [I,M,T]."""
    m, e = w_flat.shape
    i, t, r, _ = v.shape
    if _vma_needs_fallback(w_flat, v, fm, rm):
        # identical math in jnp (same masked-max + argmax contract, so the
        # shared idx-based custom VJP applies unchanged)
        prec = _score_precision(v.dtype)
        s = jnp.einsum("me,itre->imtr", w_flat, v,
                       preferred_element_type=jnp.float32, precision=prec)
        s = jnp.where(rm[:, None] > 0, s, NEG)
        a = jnp.max(s, axis=-1)
        a = jnp.where(fm[:, None, :] > 0, a, 0.0)
        return a, jnp.argmax(s, axis=-1).astype(jnp.int32)
    if r <= 32 and _rollmax_lanes(_round_up(m, 8), t, 32, i, e) >= 1:
        return _cross_mil_fwd_rollmax(w_flat, v, fm, rm)
    # lane-grouped fallback: one video per grid step, frames in 128-lane
    # groups — VMEM-light, used for R > 32 or when M*T*R_pad exceeds the
    # rollmax budget (e.g. very large batches or long clips)
    r_pad = _round_up(r, 32)
    m_pad = _round_up(m, 8)
    if r_pad != r:
        v = jnp.pad(v, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))
        rm = jnp.pad(rm, ((0, 0), (0, 0), (0, r_pad - r)))
    if m_pad != m:
        w_flat = jnp.pad(w_flat, ((0, m_pad - m), (0, 0)))
    v2 = v.reshape(i, t * r_pad, e)
    rm2 = rm.reshape(i, 1, t * r_pad)

    kernel = functools.partial(_fwd_kernel, T=t, R=r, R_pad=r_pad)
    a, idx = pl.pallas_call(
        kernel,
        grid=(i,),
        in_specs=[
            pl.BlockSpec((m_pad, e), lambda b: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t * r_pad, e), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t * r_pad), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, m_pad, t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m_pad, t), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            _sds((i, m_pad, t), jnp.float32, _vma_of(w_flat, v2, fm, rm2)),
            _sds((i, m_pad, t), jnp.int32, _vma_of(w_flat, v2, fm, rm2)),
        ],
        interpret=_interpret(),
    )(w_flat, v2, fm[:, None, :], rm2)
    return a[:, :m, :], idx[:, :m, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _cross_mil(w_flat: jax.Array, v: jax.Array, fm: jax.Array,
               rm: jax.Array) -> jax.Array:
    a, _ = _cross_mil_fwd_impl(w_flat, v, fm, rm)
    return a


def _cross_mil_fwd(w_flat, v, fm, rm):
    a, idx = _cross_mil_fwd_impl(w_flat, v, fm, rm)
    return a, (w_flat, v, fm, rm, idx)


def _cross_mil_bwd(res, da):
    w_flat, v, fm, rm, idx = res
    i, t, r, e = v.shape

    def body(dw_acc, xs):
        v_i, fm_i, rm_i, idx_i, da_i = xs        # [T,R,E],[T],[T,R],[M,T],[M,T]
        # max-subgrad gate; frames with zero valid regions are constant NEG
        # in the forward, so their gradient must vanish (matches the jnp
        # where()-masked path exactly)
        any_valid = (jnp.max(rm_i, axis=-1) > 0).astype(da.dtype)     # [T]
        g = da_i * (fm_i * any_valid)[None, :]
        oh = jax.nn.one_hot(idx_i, r, dtype=da.dtype) * g[..., None]  # [M,T,R]
        dv_i = jnp.einsum("mtr,me->tre", oh, w_flat,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        dw_i = jnp.einsum("mtr,tre->me", oh, v_i,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.HIGHEST)
        return dw_acc + dw_i, dv_i

    dw, dv = jax.lax.scan(body,
                          _match_vma(jnp.zeros(w_flat.shape, jnp.float32),
                                     v, da),
                          (v, fm, rm, idx, da))
    # cotangents must match the primal dtypes (bf16 when the wrapper cast)
    return dw.astype(w_flat.dtype), dv.astype(v.dtype), None, None


_cross_mil.defvjp(_cross_mil_fwd, _cross_mil_bwd)


def cross_mil(w_emb: jax.Array, v_emb: jax.Array, frame_mask: jax.Array,
              region_mask: jax.Array | None = None,
              dtype=None) -> jax.Array:
    """Fused a[i,j,k,t] = masked max_r ŵ[j,k]·v̂[i,t,r].

    w_emb [J,K,E], v_emb [I,T,R,E], frame_mask [I,T], region_mask [I,T,R]
    (optional, data-dependent validity, e.g. NMS survivors) -> [I,J,K,T].
    Matches frame_mil_max(mask_regions(einsum('jke,itre->ijktr'), rm), fm)
    exactly, including gradients. dtype=bfloat16 casts the matmul operands
    (accumulation stays f32 in-kernel) — same contract as the jnp path's
    compute dtype; gradients flow back through the casts.
    """
    j, k, e = w_emb.shape
    i, t, r, _ = v_emb.shape
    if dtype is not None:
        w_emb = w_emb.astype(dtype)
        v_emb = v_emb.astype(dtype)
    if region_mask is None:
        region_mask = jnp.ones((i, t, r), jnp.float32)
    a = _cross_mil(w_emb.reshape(j * k, e), v_emb, frame_mask, region_mask)
    return a.reshape(i, j, k, t)
