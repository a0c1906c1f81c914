"""Fused diagonal-epilogue Pallas kernel (custom VJP).

One VMEM pass per video computes everything the train step derives from the
DIAGONAL similarity tensor s[k,t,r] = ŵ[k]·v̂[t,r]:

  * the context-loss partial sums  ctx[k,t] = Σ_r (s − sg[ŝ])²·mask
    (ŝ = ŵ·u from the context-mixed embeddings; stop-gradient, as in
    ops/losses.context_loss_terms — the word-mask factor is applied by the
    caller, so it arrives through the cotangent in the backward),
  * the per-(word,frame) argmax-region selection f[k,t] = v̂[t, r*]
    (first-max tie-breaking, exactly like jnp.argmax),
  * the cluster distances clu[k,t] = ‖f − sg[C[c*]]‖², c* = cosine argmax
    against the (unit-norm) k-means centers.

The jnp path materializes s and ŝ in HBM, XLA rematerializes the fused
einsum+argmax in the backward, and the selection/cluster math runs as
separate fusions (~185 us/step combined at config4 shapes, docs/PERF.md).
Here s/ŝ live only in VMEM ([K_pad, T·R_pad] per video off two MXU dots)
and the backward recomputes them from the saved inputs.

Gradients flow to w_emb (through s in the ctx term) and v_emb (through s
and through the selected f into the cluster pull); ŝ and the centers are
stop-gradients, and the f OUTPUT is returned stop-gradient (its only
consumer is the k-means refresh) — matching the train step's semantics
exactly (tested against the jnp path, values and grads).

Reference math: SURVEY.md L144-145 (context / clustering losses — the
reference's per-frame Python loops).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nafae_tpu.ops.pallas.fused_ctx import _prec, _sel_dot
from nafae_tpu.ops.pallas.fused_ground import (NEG, _interpret, _round_up,
                                               _sds, _vma_needs_fallback,
                                               _vma_of)

BIG = 10 ** 9


def _first_argmax(x):
    """Row-wise argmax-onehot over lanes, FIRST-max ties (== jnp.argmax).

    x [M, N]; invalid lanes must already hold NEG (they never win against
    any real value, and an all-NEG row picks lane 0 like jnp.argmax).
    """
    m, n = x.shape
    mx = jnp.max(x, axis=1, keepdims=True)                  # [M, 1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    cand = jnp.where(x == mx, lane, BIG)
    first = jnp.min(cand, axis=1, keepdims=True)            # [M, 1]
    return jnp.where(lane == first, 1.0, 0.0)


def _fwd_body(w, vf, uf, colv, fml, hc, centers,
              *, T, K_pad, Kc, Kc_pad, r, r_pad, dtype):
    """Shared forward math on VMEM values. Returns (ctx_kt, clu_kt, f_tk,
    s_masked) — f_tk rows ordered (t, k)."""
    n = T * r_pad
    prec = _prec(dtype)
    dn_t = (((1,), (1,)), ((), ()))
    s = jax.lax.dot_general(w, vf, dn_t, preferred_element_type=jnp.float32,
                            precision=prec)                 # [K_pad, N]
    shat = jax.lax.dot_general(w, uf, dn_t,
                               preferred_element_type=jnp.float32,
                               precision=prec)              # [K_pad, N]
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (K_pad, n), 1) % r_pad
    live = (lane_r < r) & (colv > 0)                        # region validity
    # ctx partial sums: sq · fm · has_ctx · rm, summed per frame via a
    # selector matmul (frame groups of r_pad lanes)
    sq = (s - shat) ** 2
    m = jnp.where(live & (fml > 0) & (hc > 0), 1.0, 0.0)
    sel_ft = (jax.lax.broadcasted_iota(jnp.int32, (n, T), 0) // r_pad
              == jax.lax.broadcasted_iota(jnp.int32, (n, T), 1))
    ctx_kt = _sel_dot(sq * m, sel_ft.astype(jnp.float32 if
                      jnp.dtype(dtype) != jnp.bfloat16 else jnp.bfloat16),
                      dtype)                                # [K_pad, T]
    # selection + cluster, per frame (lane slices of the masked s)
    s_m = jnp.where(live, s, NEG)
    chat = centers * jax.lax.rsqrt(
        jnp.sum(centers * centers, axis=1, keepdims=True) + 1e-8)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (K_pad, Kc_pad), 1)
    f_rows = []
    clu_cols = jnp.zeros((K_pad, T), jnp.float32)
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (K_pad, T), 1)
    cdt = jnp.dtype(dtype)
    for t in range(T):
        s_t = s_m[:, t * r_pad:(t + 1) * r_pad]             # [K_pad, R_pad]
        onehot = _first_argmax(s_t)
        v_t = vf[t * r_pad:(t + 1) * r_pad, :]              # [R_pad, E]
        f_t = jax.lax.dot_general(
            onehot.astype(cdt), v_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)    # exact: single-term one-hot sum
        sims = jax.lax.dot_general(f_t.astype(cdt), chat.astype(cdt),
                                   dn_t, preferred_element_type=jnp.float32,
                                   precision=prec)          # [K_pad, Kc_pad]
        sims = jnp.where(lane_c < Kc, sims, NEG)
        oc = _first_argmax(sims)
        target = jax.lax.dot_general(
            oc.astype(cdt), centers.astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)    # exact: single-term one-hot sum
        sq_f = jnp.sum((f_t - target) ** 2, axis=1, keepdims=True)
        clu_cols = jnp.where(lane_t == t, sq_f, clu_cols)
        f_rows.append(f_t)
    return ctx_kt, clu_cols, f_rows, s_m, shat, live


def _fwd_kernel(w_ref, vf_ref, uf_ref, colv_ref, fml_ref, hc_ref, c_ref,
                ctx_ref, clu_ref, f_ref,
                *, T, K_pad, Kc, Kc_pad, r, r_pad, dtype):
    ctx_kt, clu_kt, f_rows, _, _, _ = _fwd_body(
        w_ref[0], vf_ref[0], uf_ref[0], colv_ref[0], fml_ref[0], hc_ref[0],
        c_ref[...], T=T, K_pad=K_pad, Kc=Kc, Kc_pad=Kc_pad, r=r,
        r_pad=r_pad, dtype=dtype)
    ctx_ref[0] = ctx_kt
    clu_ref[0] = clu_kt
    for t, f_t in enumerate(f_rows):
        f_ref[0, t * K_pad:(t + 1) * K_pad, :] = f_t


def _bwd_kernel(w_ref, vf_ref, uf_ref, colv_ref, fml_ref, hc_ref, c_ref,
                dctx_ref, dclu_ref, dw_ref, dv_ref,
                *, T, K_pad, Kc, Kc_pad, r, r_pad, dtype):
    """dw from the ctx term; dv from the ctx term + the cluster pull through
    the selected f. ŝ/centers/argmaxes are stop-gradients (subgradient)."""
    w = w_ref[0]
    vf = vf_ref[0]
    n = T * r_pad
    prec = _prec(dtype)
    cdt = jnp.dtype(dtype)
    ctx_kt, clu_kt, f_rows, s_m, shat, live = _fwd_body(
        w, vf, uf_ref[0], colv_ref[0], fml_ref[0], hc_ref[0], c_ref[...],
        T=T, K_pad=K_pad, Kc=Kc, Kc_pad=Kc_pad, r=r, r_pad=r_pad,
        dtype=dtype)
    # ds for the ctx term: cotangent per (k, frame) broadcast over the
    # frame's lanes via a selector matmul, times 2(s-ŝ)·mask
    sel_tf = (jax.lax.broadcasted_iota(jnp.int32, (T, n), 1) // r_pad
              == jax.lax.broadcasted_iota(jnp.int32, (T, n), 0))
    seld = jnp.float32 if jnp.dtype(dtype) != jnp.bfloat16 else jnp.bfloat16
    dctx_n = _sel_dot(dctx_ref[0], sel_tf.astype(seld), dtype)   # [K_pad, N]
    fml = fml_ref[0]
    hc = hc_ref[0]
    m = jnp.where(live & (fml > 0) & (hc > 0), 1.0, 0.0)
    # s here is the unmasked dot recomputed inside _fwd_body as s_m with NEG
    # fills — but (s - ŝ) under the mask is identical because masked slots
    # have m == 0, so use s_m (the NEG fill cancels via m)
    ds = dctx_n * 2.0 * (s_m - shat) * m                    # [K_pad, N]
    dsf = ds.astype(cdt)
    dw_ref[0] = jax.lax.dot_general(
        dsf, vf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [K_pad, E]
    dv = jax.lax.dot_general(
        dsf, w, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)  # [N, E]
    # cluster pull: df = dclu · 2(f - target); dv[t, r*] += onehot^T df
    chat = c_ref[...] * jax.lax.rsqrt(
        jnp.sum(c_ref[...] * c_ref[...], axis=1, keepdims=True) + 1e-8)
    lane_c = jax.lax.broadcasted_iota(jnp.int32, (K_pad, Kc_pad), 1)
    dn_t = (((1,), (1,)), ((), ()))
    dclu = dclu_ref[0]                                      # [K_pad, T]
    lane_t = jax.lax.broadcasted_iota(jnp.int32, (K_pad, T), 1)
    dv_ref[0] = dv
    for t in range(T):
        f_t = f_rows[t]
        sims = jax.lax.dot_general(f_t.astype(cdt), chat.astype(cdt), dn_t,
                                   preferred_element_type=jnp.float32,
                                   precision=prec)
        sims = jnp.where(lane_c < Kc, sims, NEG)
        oc = _first_argmax(sims)
        target = jax.lax.dot_general(
            oc.astype(cdt), c_ref[...].astype(cdt), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)    # exact: single-term one-hot sum
        dclu_t = jnp.sum(jnp.where(lane_t == t, dclu, 0.0), axis=1,
                         keepdims=True)                     # [K_pad, 1]
        df = (dclu_t * 2.0) * (f_t - target)                # [K_pad, E]
        onehot = _first_argmax(s_m[:, t * r_pad:(t + 1) * r_pad])
        dv_t = jax.lax.dot_general(
            onehot.astype(cdt), df.astype(cdt), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)                                 # [R_pad, E]
        dv_ref[0, t * r_pad:(t + 1) * r_pad, :] = (
            dv_ref[0, t * r_pad:(t + 1) * r_pad, :] + dv_t)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def _diag_core(w, vf, uf, colv, fml, hc, centers,
               T, K_pad, Kc, Kc_pad, r, r_pad):
    out, _ = _diag_core_fwd(w, vf, uf, colv, fml, hc, centers,
                            T, K_pad, Kc, Kc_pad, r, r_pad)
    return out


def _specs(b, shapes):
    """Per-video blocks: leading grid axis, whole array otherwise."""
    def spec(s):
        nzeros = len(s)
        return pl.BlockSpec((1,) + s, lambda i, _n=nzeros: (i,) + (0,) * _n,
                            memory_space=pltpu.VMEM)
    return [spec(s) for s in shapes]


def _diag_core_fwd(w, vf, uf, colv, fml, hc, centers,
                   T, K_pad, Kc, Kc_pad, r, r_pad):
    b, n, e = vf.shape
    kern = functools.partial(_fwd_kernel, T=T, K_pad=K_pad, Kc=Kc,
                             Kc_pad=Kc_pad, r=r, r_pad=r_pad, dtype=vf.dtype)
    vma = _vma_of(w, vf, uf, colv, fml, hc)
    ins = _specs(b, [(K_pad, e), (n, e), (n, e), (1, n), (1, n), (1, n)])
    ins.append(pl.BlockSpec(centers.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM))
    outs = _specs(b, [(K_pad, T), (K_pad, T), (T * K_pad, e)])
    ctx_kt, clu_kt, f = pl.pallas_call(
        kern, grid=(b,), in_specs=ins, out_specs=outs,
        out_shape=[_sds((b, K_pad, T), jnp.float32, vma),
                   _sds((b, K_pad, T), jnp.float32, vma),
                   _sds((b, T * K_pad, e), jnp.float32, vma)],
        interpret=_interpret(),
    )(w, vf, uf, colv, fml, hc, centers)
    return (ctx_kt, clu_kt, f), (w, vf, uf, colv, fml, hc, centers)


def _diag_core_bwd(T, K_pad, Kc, Kc_pad, r, r_pad, res, cots):
    w, vf, uf, colv, fml, hc, centers = res
    dctx, dclu, _df = cots      # df ignored: f is a stop-grad output
    b, n, e = vf.shape
    kern = functools.partial(_bwd_kernel, T=T, K_pad=K_pad, Kc=Kc,
                             Kc_pad=Kc_pad, r=r, r_pad=r_pad, dtype=vf.dtype)
    vma = _vma_of(w, vf, uf, colv, fml, hc, dctx, dclu)
    ins = _specs(b, [(K_pad, e), (n, e), (n, e), (1, n), (1, n), (1, n)])
    ins.append(pl.BlockSpec(centers.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM))
    ins += _specs(b, [(K_pad, T), (K_pad, T)])
    outs = _specs(b, [(K_pad, e), (n, e)])
    dw, dv = pl.pallas_call(
        kern, grid=(b,), in_specs=ins, out_specs=outs,
        out_shape=[_sds((b, K_pad, e), jnp.float32, vma),
                   _sds((b, n, e), jnp.float32, vma)],
        interpret=_interpret(),
    )(w, vf, uf, colv, fml, hc, centers,
      dctx.astype(jnp.float32), dclu.astype(jnp.float32))
    zero = lambda x: jnp.zeros_like(x)
    return (dw.astype(w.dtype), dv.astype(vf.dtype), zero(uf), zero(colv),
            zero(fml), zero(hc), zero(centers))


_diag_core.defvjp(_diag_core_fwd, _diag_core_bwd)


def diag_epilogue_pallas(w_emb, v_emb, u, centers, frame_mask, region_mask,
                         has_ctx, dtype=None):
    """Fused diag epilogue for ONE batch.

    w_emb [B,K,E], v_emb [B,T,R,E], u [B,T,R,E] (context-mixed, treated as
    stop-gradient), centers [Kc,E], frame_mask [B,T],
    region_mask [B,T,R] or None, has_ctx [B,T] (1 where the frame has >=1
    valid neighbor).

    Returns (ctx_kt [B,K,T], clu_kt [B,K,T], f [B,T,K,E] stop-gradient,
    valid caller-side). The caller applies the word mask:
        l_ctx num = Σ wm[b,k]·ctx_kt[b,k,t];  den as in context_loss_terms
        l_clu num = Σ (wm·fm·any_region)·clu_kt;  den likewise

    Known perf debt (kernel is FROZEN per the r2 decision — loses to XLA at
    every production shape, kept as kernels="pallas" coverage only, see
    docs/PERF.md): the backward recompute re-runs the whole forward epilogue
    (cluster sims/targets + ctx selector matmuls) although the bwd loop only
    consumes f_rows/s_m/shat — roughly 2× the epilogue work per bwd step.
    Not worth tuning while frozen; fix if the kernel is ever unfrozen.
    """
    if _vma_needs_fallback(w_emb, v_emb, u, frame_mask):
        return None                       # caller falls back to the jnp path
    b, t, r, e = v_emb.shape
    k = w_emb.shape[1]
    kc = centers.shape[0]
    k_pad = _round_up(k, 8)
    kc_pad = _round_up(kc, 8)
    r_pad = _round_up(r, 8)
    cdt = jnp.dtype(dtype) if dtype is not None else v_emb.dtype
    w = jnp.pad(w_emb, ((0, 0), (0, k_pad - k), (0, 0))).astype(cdt)
    vp = jnp.pad(v_emb, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))
    up = jnp.pad(u, ((0, 0), (0, 0), (0, r_pad - r), (0, 0)))
    n = t * r_pad
    vf = vp.reshape(b, n, e).astype(cdt)
    uf = up.reshape(b, n, e).astype(cdt)
    fml = jnp.repeat(frame_mask, r_pad, axis=1).reshape(b, 1, n)
    hcl = jnp.repeat(has_ctx, r_pad, axis=1).reshape(b, 1, n)
    # region-validity ONLY (mask_regions semantics): the argmax selection
    # must ignore frame validity exactly like the jnp path, where invalid
    # frames still argmax over their rm-masked scores
    if region_mask is not None:
        rm = jnp.pad(region_mask, ((0, 0), (0, 0), (0, r_pad - r)))
        colv = rm.reshape(b, 1, n)
    else:
        colv = jnp.ones((b, 1, n), frame_mask.dtype)
    cpad = jnp.pad(centers, ((0, kc_pad - kc), (0, 0))).astype(jnp.float32)
    ctx_kt, clu_kt, f = _diag_core(w, vf, uf, colv, fml, hcl, cpad,
                                   t, k_pad, kc, kc_pad, r, r_pad)
    f = jax.lax.stop_gradient(f).reshape(b, t, k_pad, e)[:, :, :k, :]
    return ctx_kt[:, :k, :], clu_kt[:, :k, :], f
