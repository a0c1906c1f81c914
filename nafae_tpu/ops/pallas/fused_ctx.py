"""Fused context-mixing Pallas kernel (custom VJP, recompute-in-backward).

Computes the context-mixed region embeddings u (same math as
ops/grounding.context_mix) for one video per grid step, entirely in VMEM:

    S[m, n]  = v_c[m]·v_f[n] / temp          ONE [T·R_pad, E]x[E, N_ext]
                                             MXU matmul (the jnp offset loop
                                             runs 2·O tiny [R,E]x[E,S] ones
                                             at 20x20-output tiles = <3%
                                             systolic-array utilization)
    alpha    = per-(row, neighbor-frame) softmax over the band
               1 <= |frame(n) - frame(m)| <= w, masked by frame/region
               validity; group sums via two selector-matrix matmuls —
               no lane-dim reshapes (Mosaic-safe)
    u_num[m] = sum_n alpha[m, n] · v_f[n]    ONE [T·R_pad, N_ext]x[N_ext, E]

The backward recomputes S/alpha from the saved inputs (no big residuals in
HBM) and applies the group-softmax Jacobian with the same selector trick;
the center-row addition of the query-side gradient happens on host.

Numerical notes:
  * exp() is taken WITHOUT max-subtraction: region embeddings are
    l2-normalized (ops/grounding.project_regions) so |logits| <= 1/temp;
    safe in f32 for temp >= ~0.02 (default ctx_temp = 0.1; asserted).
  * groups whose neighbor frame is valid but has zero valid regions
    reproduce the reference softmax's uniform-over-all-NEG behavior
    (uniform 1/R over real-region lanes, zero gradient) — tested equivalent
    to context_mix in values and grads.

Reference math: ops/grounding.region_affinity_ext + context_mixed_regions
(SURVEY.md L144: "contextual similarity ... fused Pallas kernel" — the
BASELINE north-star item; the reference runs per-frame Python loops here).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nafae_tpu.ops.pallas.fused_ground import _interpret, _round_up


def _prec(dtype):
    return (jax.lax.Precision.DEFAULT if jnp.dtype(dtype) == jnp.bfloat16
            else jax.lax.Precision.HIGHEST)


def _band(m_rows, n_ext, r_pad, r, w):
    """Static [M,N] band+structural mask from 2-D iota (Mosaic-safe)."""
    row_f = jax.lax.broadcasted_iota(jnp.int32, (m_rows, n_ext), 0) // r_pad + w
    col_f = jax.lax.broadcasted_iota(jnp.int32, (m_rows, n_ext), 1) // r_pad
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (m_rows, n_ext), 1) % r_pad
    off = col_f - row_f
    return (off != 0) & (off >= -w) & (off <= w) & (lane_r < r)


def _recompute_alpha(vf, colv, fml, sel1, sel2, *, T, w, r, r_pad,
                     inv_temp, precision):
    """Shared fwd/bwd body: (alpha [M,N_ext] f32, bs, vc)."""
    n_ext = vf.shape[0]
    m_rows = T * r_pad
    vc = vf[w * r_pad:w * r_pad + m_rows, :]
    s = jax.lax.dot_general(vc, vf, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision) * inv_temp
    band = _band(m_rows, n_ext, r_pad, r, w)
    live = band & (colv > 0)
    ex = jnp.where(live, jnp.exp(s), 0.0)
    hp = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))
    gs = jax.lax.dot_general(ex, sel1, dn,
                             preferred_element_type=jnp.float32, precision=hp)
    bs = jax.lax.dot_general(gs, sel2, dn,
                             preferred_element_type=jnp.float32, precision=hp)
    frame_band = band & (fml > 0)
    alpha = jnp.where(bs > 0, ex / jnp.maximum(bs, 1e-30),
                      jnp.where(frame_band, 1.0 / r, 0.0))
    return alpha, bs, vc


def _fwd_kernel(vf_ref, colv_ref, fml_ref, sel1_ref, sel2_ref, u_ref,
                *, T, w, r, r_pad, inv_temp, precision):
    vf = vf_ref[0]
    alpha, _, _ = _recompute_alpha(vf, colv_ref[0], fml_ref[0],
                                   sel1_ref[:], sel2_ref[:], T=T, w=w, r=r,
                                   r_pad=r_pad, inv_temp=inv_temp,
                                   precision=precision)
    u_ref[0] = jax.lax.dot_general(
        alpha.astype(vf.dtype), vf, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _bwd_kernel(vf_ref, colv_ref, fml_ref, sel1_ref, sel2_ref, du_ref,
                dvf_ref, dvc_ref, *, T, w, r, r_pad, inv_temp, precision):
    """dvf: mixing + neighbor-side logits grads (all N_ext rows);
    dvc: query-side logits grads (center rows; host adds them into dvf)."""
    vf = vf_ref[0]
    alpha, bs, vc = _recompute_alpha(vf, colv_ref[0], fml_ref[0],
                                     sel1_ref[:], sel2_ref[:], T=T, w=w, r=r,
                                     r_pad=r_pad, inv_temp=inv_temp,
                                     precision=precision)
    du = du_ref[0]                                          # [M, E] f32
    hp = jax.lax.Precision.HIGHEST
    dn = (((1,), (0,)), ((), ()))
    dn_t = (((1,), (1,)), ((), ()))
    dn_c = (((0,), (0,)), ((), ()))
    dalpha = jax.lax.dot_general(du.astype(vf.dtype), vf, dn_t,
                                 preferred_element_type=jnp.float32,
                                 precision=precision)       # [M, N_ext]
    ad = alpha * dalpha
    gs2 = jax.lax.dot_general(ad, sel1_ref[:], dn,
                              preferred_element_type=jnp.float32,
                              precision=hp)
    bs2 = jax.lax.dot_general(gs2, sel2_ref[:], dn,
                              preferred_element_type=jnp.float32,
                              precision=hp)
    # softmax Jacobian per group; uniform-fallback groups (bs==0) have
    # constant alpha => zero gradient
    ds = jnp.where(bs > 0, (ad - alpha * bs2) * inv_temp, 0.0)
    dsf = ds.astype(vf.dtype)
    dvf = jax.lax.dot_general(alpha.astype(vf.dtype), du.astype(vf.dtype),
                              dn_c, preferred_element_type=jnp.float32,
                              precision=precision)          # [N_ext, E]
    dvf = dvf + jax.lax.dot_general(dsf, vc, dn_c,
                                    preferred_element_type=jnp.float32,
                                    precision=precision)
    dvf_ref[0] = dvf
    dvc_ref[0] = jax.lax.dot_general(dsf, vf, dn,
                                     preferred_element_type=jnp.float32,
                                     precision=precision)   # [M, E]


def _specs(b, n_ext, m_rows, t_ext, e, out):
    ins = [
        pl.BlockSpec((1, n_ext, e), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_ext), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_ext), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_ext, t_ext), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((t_ext, n_ext), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ]
    outs = [pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for s1, s2 in out]
    return ins, outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _ctx_core(vf, colv, fml, sel1, sel2, window, temp, t, r, r_pad):
    u, _ = _ctx_core_fwd(vf, colv, fml, sel1, sel2, window, temp, t, r, r_pad)
    return u


def _ctx_core_fwd(vf, colv, fml, sel1, sel2, window, temp, t, r, r_pad):
    b, n_ext, e = vf.shape
    t_ext = t + 2 * window
    m_rows = t * r_pad
    kern = functools.partial(_fwd_kernel, T=t, w=window, r=r, r_pad=r_pad,
                             inv_temp=1.0 / temp, precision=_prec(vf.dtype))
    ins, outs = _specs(b, n_ext, m_rows, t_ext, e, [(m_rows, e)])
    u = pl.pallas_call(
        kern, grid=(b,), in_specs=ins, out_specs=outs[0],
        out_shape=jax.ShapeDtypeStruct((b, m_rows, e), jnp.float32),
        interpret=_interpret(),
    )(vf, colv, fml, sel1, sel2)
    return u, (vf, colv, fml, sel1, sel2)


def _ctx_core_bwd(window, temp, t, r, r_pad, res, du):
    vf, colv, fml, sel1, sel2 = res
    b, n_ext, e = vf.shape
    t_ext = t + 2 * window
    m_rows = t * r_pad
    kern = functools.partial(_bwd_kernel, T=t, w=window, r=r, r_pad=r_pad,
                             inv_temp=1.0 / temp, precision=_prec(vf.dtype))
    ins, outs = _specs(b, n_ext, m_rows, t_ext, e,
                       [(n_ext, e), (m_rows, e)])
    ins.append(pl.BlockSpec((1, m_rows, e), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM))
    dvf, dvc = pl.pallas_call(
        kern, grid=(b,), in_specs=ins, out_specs=outs,
        out_shape=[jax.ShapeDtypeStruct((b, n_ext, e), jnp.float32),
                   jax.ShapeDtypeStruct((b, m_rows, e), jnp.float32)],
        interpret=_interpret(),
    )(vf, colv, fml, sel1, sel2, du.astype(jnp.float32))
    # query-side grads belong to the center rows of vf
    dvf = dvf.at[:, window * r_pad:window * r_pad + m_rows, :].add(dvc)
    return dvf.astype(vf.dtype), None, None, None, None


_ctx_core.defvjp(_ctx_core_fwd, _ctx_core_bwd)


def ctx_mix_pallas(v_ext: jax.Array, fm_ext: jax.Array, window: int,
                   temp: float, dtype=None,
                   rm_ext: jax.Array | None = None
                   ) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for ops/grounding.context_mix.

    v_ext [B, w+T+w, R, E] (halo form), fm_ext [B, w+T+w],
    rm_ext [B, w+T+w, R] optional -> (u [B,T,R,E], nbr_valid [B,T,O]).
    """
    assert temp >= 0.02, "ctx kernel takes exp() without max-subtraction; " \
        "|logits|<=1/temp must stay in f32 range (temp>=0.02)"
    b, t_ext, r, e = v_ext.shape
    t = t_ext - 2 * window
    r_pad = _round_up(r, 8)
    if dtype is not None:
        v_ext = v_ext.astype(dtype)
    vp = jnp.pad(v_ext, ((0, 0), (0, 0), (0, r_pad - r), (0, 0))) \
        if r_pad != r else v_ext
    n_ext = t_ext * r_pad
    vf = vp.reshape(b, n_ext, e)
    fml = jnp.repeat(fm_ext, r_pad, axis=1).reshape(b, 1, n_ext)
    colv = fml
    if rm_ext is not None:
        rm = jnp.pad(rm_ext, ((0, 0), (0, 0), (0, r_pad - r))) \
            if r_pad != r else rm_ext
        colv = colv * rm.reshape(b, 1, n_ext)
    lane_f = jnp.arange(n_ext) // r_pad
    sel1 = (lane_f[:, None] == jnp.arange(t_ext)[None, :]).astype(jnp.float32)
    u_num = _ctx_core(vf, colv, fml, sel1, sel1.T,
                      window, float(temp), t, r, r_pad)     # [B, T*r_pad, E]
    u_num = u_num.reshape(b, t, r_pad, e)[:, :, :r, :]
    center = jnp.arange(t) + window
    fm_c = fm_ext[:, window:window + t]
    offs = [o for o in range(-window, window + 1) if o != 0]
    nbr_valid = jnp.stack([fm_ext[:, center + o] for o in offs],
                          axis=2) * fm_c[:, :, None]        # [B,T,O]
    den = jnp.maximum(jnp.sum(nbr_valid, axis=-1), 1.0)
    u = u_num * fm_c[:, :, None, None] / den[:, :, None, None]
    return u, nbr_valid
