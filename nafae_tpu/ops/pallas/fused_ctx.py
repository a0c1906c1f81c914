"""Fused context-mixing Pallas kernel (custom VJP, recompute-in-backward).

Computes the context-mixed region embeddings u (same math as
ops/grounding.context_mix) for one video per grid step, entirely in VMEM.
The kernel is *frame-banded*: the affinity band 1 <= |frame(n) - frame(m)|
<= w only ever touches columns within w frames of a row's frame, so the
score matrix is computed per frame-tile of G center frames against its
(G + 2w)-frame column slab — (G+2w)/(T+2w) of the full [T·R_pad, T_ext·R_pad]
matrix's FLOPs (and of its exp/mask VPU work). tile=T degenerates to the
original single-matmul form, used when T is small.

Per tile (all slices static — the frame loop is unrolled at trace time):

    S[m, n]  = v_c[m]·v_f[n] / temp          ONE [G·R_pad, E]x[E, (G+2w)·R_pad]
                                             MXU matmul (the jnp offset loop
                                             runs 2·O tiny [R,E]x[E,S] ones
                                             at 20x20-output tiles = <3%
                                             systolic-array utilization)
    alpha    = per-(row, neighbor-frame) softmax over the band
               1 <= |frame(n) - frame(m)| <= w, masked by frame/region
               validity; group sums via two selector-matrix matmuls, the
               selectors built in-kernel from int iota —
               no lane-dim reshapes (Mosaic-safe)
    u_num[m] = sum_n alpha[m, n] · v_f[n]    ONE [G·R_pad, N_t]x[N_t, E]

The backward recomputes S/alpha from the saved inputs (no big residuals in
HBM), applies the group-softmax Jacobian with the same selector trick, and
accumulates the overlapping column-slab gradients across tiles in VMEM;
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

from nafae_tpu.ops.pallas.fused_ground import (_interpret, _round_up,
                                               _score_precision as _prec,
                                               _sds, _vma_needs_fallback,
                                               _vma_of)


def _band(m_rows, n_t, r_pad, r, w):
    """Static [M,N] band+structural mask from 2-D iota (Mosaic-safe).

    Row m is center frame m//r_pad (+w in extended coords); column n is
    extended frame n//r_pad. Both are tile-local, so the same mask serves
    every tile: the tile's row/column frame origins cancel in the offset.
    """
    row_f = jax.lax.broadcasted_iota(jnp.int32, (m_rows, n_t), 0) // r_pad + w
    col_f = jax.lax.broadcasted_iota(jnp.int32, (m_rows, n_t), 1) // r_pad
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (m_rows, n_t), 1) % r_pad
    off = col_f - row_f
    return (off != 0) & (off >= -w) & (off <= w) & (lane_r < r)


def _selectors(n_t, gf, r_pad, dtype=jnp.float32):
    """In-kernel one-hot frame-group selectors: sel1 [n_t, gf] (column ->
    its frame group), sel2 [gf, n_t] (group -> its columns). Built from int
    iota comparisons — no transposes, no host inputs."""
    s1 = (jax.lax.broadcasted_iota(jnp.int32, (n_t, gf), 0) // r_pad
          == jax.lax.broadcasted_iota(jnp.int32, (n_t, gf), 1))
    s2 = (jax.lax.broadcasted_iota(jnp.int32, (gf, n_t), 1) // r_pad
          == jax.lax.broadcasted_iota(jnp.int32, (gf, n_t), 0))
    return s1.astype(dtype), s2.astype(dtype)


def _row_scale(fml_slab, m_t, n_t, r_pad, w):
    """Per-center-row scale fm_c/max(Σ_o nbr_valid, 1) as [M_t, 1], computed
    in-kernel from the frame-validity row (fml is fm repeated over r_pad
    lanes, so a band row-sum divided by r_pad counts valid FRAMES exactly —
    0/1 sums scaled by r_pad are exact in f32). Folding this scale into the
    mix store saves the wrapper's full [B,T,R,E] elementwise pass over u."""
    row_f = jax.lax.broadcasted_iota(jnp.int32, (m_t, n_t), 0) // r_pad + w
    col_f = jax.lax.broadcasted_iota(jnp.int32, (m_t, n_t), 1) // r_pad
    off = col_f - row_f
    nbr = (off != 0) & (off >= -w) & (off <= w)
    # fml holds 0/1 floats, so (fml_slab > 0) captures it exactly; boolean
    # [M,N] & [1,N] broadcast is the one form Mosaic lowers for a
    # lane-offset slab (arithmetic broadcast of the sliced row does not —
    # "Invalid input layout" on vector.broadcast)
    fvalid = fml_slab > 0
    nbr_cnt = jnp.sum(jnp.where(nbr & fvalid, 1.0, 0.0), axis=1,
                      keepdims=True) * (1.0 / r_pad)         # Σ_o fm[t+o]
    fm_c = jnp.sum(jnp.where((off == 0) & fvalid, 1.0, 0.0), axis=1,
                   keepdims=True) * (1.0 / r_pad)            # fm[t] (0/1)
    return fm_c / jnp.maximum(nbr_cnt, 1.0)


def _sel_dot(a, sel, dot_dtype):
    """Group-sum via selector matmul. In f32 mode: HIGHEST (exact, oracle
    parity). In bf16 mode: one MXU pass on bf16 operands with f32
    accumulation — the 0/1 selector is exact either way; only the summand
    rounding differs, which is the opted-in reduced-precision contract.
    (The previous always-HIGHEST form cost 6 MXU passes per selector
    matmul even in bf16 mode.)"""
    prec = _prec(dot_dtype)
    return jax.lax.dot_general(a.astype(dot_dtype), sel,
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _alpha_from_scores(s, colv_slab, fml_slab, *, gt, w, r, r_pad,
                       dot_dtype=jnp.float32):
    """Masked band softmax from raw scores s [M_t,N_t] (already /temp):
    returns (alpha, bs, sel1, sel2). Shared by fwd and bwd tiles so the
    semantics (uniform-fallback groups included) cannot drift."""
    m_t, n_t = s.shape
    band = _band(m_t, n_t, r_pad, r, w)
    live = band & (colv_slab > 0)
    ex = jnp.where(live, jnp.exp(s), 0.0)
    sel1, sel2 = _selectors(n_t, gt + 2 * w, r_pad, dtype=dot_dtype)
    gs = _sel_dot(ex, sel1, dot_dtype)
    bs = _sel_dot(gs, sel2, dot_dtype)
    frame_band = band & (fml_slab > 0)
    alpha = jnp.where(bs > 0, ex / jnp.maximum(bs, 1e-30),
                      jnp.where(frame_band, 1.0 / r, 0.0))
    return alpha, bs, sel1, sel2


def _tile_alpha(vf, colv, fml, t0, gt, *, w, r, r_pad, inv_temp, precision):
    """Alpha for one frame tile: center frames [t0, t0+gt), column slab =
    extended frames [t0, t0+gt+2w). Returns (alpha [M_t,N_t] f32, bs, vc,
    cols, sel1, sel2); everything static-sliced."""
    m_t = gt * r_pad
    n_t = (gt + 2 * w) * r_pad
    c0 = t0 * r_pad
    vc = vf[(w + t0) * r_pad:(w + t0) * r_pad + m_t, :]
    cols = vf[c0:c0 + n_t, :]
    s = jax.lax.dot_general(vc, cols, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=precision) * inv_temp
    alpha, bs, sel1, sel2 = _alpha_from_scores(
        s, colv[:, c0:c0 + n_t], fml[:, c0:c0 + n_t],
        gt=gt, w=w, r=r, r_pad=r_pad, dot_dtype=vf.dtype)
    return alpha, bs, vc, cols, sel1, sel2


def _fwd_kernel(vf_ref, colv_ref, fml_ref, u_ref,
                *, T, w, r, r_pad, inv_temp, precision, tile):
    vf = vf_ref[0]
    colv = colv_ref[0]
    fml = fml_ref[0]
    for t0 in range(0, T, tile):
        gt = min(tile, T - t0)
        alpha, _, _, cols, _, _ = _tile_alpha(
            vf, colv, fml, t0, gt, w=w, r=r, r_pad=r_pad,
            inv_temp=inv_temp, precision=precision)
        c0 = t0 * r_pad
        n_t = (gt + 2 * w) * r_pad
        scale = _row_scale(fml[:, c0:c0 + n_t], gt * r_pad, n_t, r_pad, w)
        mix = jax.lax.dot_general(
            alpha.astype(vf.dtype), cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        u_ref[0, t0 * r_pad:(t0 + gt) * r_pad, :] = (
            mix * scale).astype(u_ref.dtype)


def _fwd_kernel_res(vf_ref, colv_ref, fml_ref, u_ref, alpha_ref,
                    *, T, w, r, r_pad, inv_temp, precision, tile):
    """Forward variant that ALSO stores the banded alpha slabs (one
    [M_t, N_t] block per full tile) so the backward can skip the score
    recompute — the alpha-as-residual trade (docs/PERF.md "Known
    headroom"). Only full tiles are stored; T % tile == 0 is enforced by
    the wrapper (the residual buffer is tile-regular)."""
    vf = vf_ref[0]
    colv = colv_ref[0]
    fml = fml_ref[0]
    for i, t0 in enumerate(range(0, T, tile)):
        gt = min(tile, T - t0)
        alpha, _, _, cols, _, _ = _tile_alpha(
            vf, colv, fml, t0, gt, w=w, r=r, r_pad=r_pad,
            inv_temp=inv_temp, precision=precision)
        c0 = t0 * r_pad
        n_t = (gt + 2 * w) * r_pad
        alpha_ref[0, i] = alpha.astype(alpha_ref.dtype)
        scale = _row_scale(fml[:, c0:c0 + n_t], gt * r_pad, n_t, r_pad, w)
        mix = jax.lax.dot_general(
            alpha.astype(vf.dtype), cols, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)
        u_ref[0, t0 * r_pad:(t0 + gt) * r_pad, :] = (
            mix * scale).astype(u_ref.dtype)


def _bwd_kernel(vf_ref, colv_ref, fml_ref, du_ref, dvf_ref, dvc_ref,
                *, T, w, r, r_pad, inv_temp, precision, tile):
    """dvf: mixing + neighbor-side logits grads (all N_ext rows, the
    overlapping per-tile column slabs accumulated in VMEM);
    dvc: query-side logits grads (center rows; host adds them into dvf)."""
    vf = vf_ref[0]
    colv = colv_ref[0]
    fml = fml_ref[0]
    du = du_ref[0]                                          # [M, E] vf dtype
    dn = (((1,), (0,)), ((), ()))
    dn_t = (((1,), (1,)), ((), ()))
    dn_c = (((0,), (0,)), ((), ()))
    dvf_ref[0] = jnp.zeros(dvf_ref.shape[1:], jnp.float32)
    for t0 in range(0, T, tile):
        gt = min(tile, T - t0)
        m_t = gt * r_pad
        n_t = (gt + 2 * w) * r_pad
        c0 = t0 * r_pad
        vc = vf[(w + t0) * r_pad:(w + t0) * r_pad + m_t, :]
        cols = vf[c0:c0 + n_t, :]
        # u = scale ⊙ u_num (scale folded into the forward store), so the
        # cotangent w.r.t. u_num is scale ⊙ du
        scale = _row_scale(fml[:, c0:c0 + n_t], m_t, n_t, r_pad, w)
        du_t = (du[t0 * r_pad:t0 * r_pad + m_t, :] * scale).astype(vf.dtype)
        # merged [2M_t, E]x[E, N_t]: rows 0..M_t give the logits S (the
        # recompute), rows M_t.. give dalpha — one MXU pass at double M,
        # where M_t alone (tile*r_pad ~ 96) underfills the 128-row array
        sd = jax.lax.dot_general(jnp.concatenate([vc, du_t], axis=0), cols,
                                 dn_t, preferred_element_type=jnp.float32,
                                 precision=precision)       # [2M_t, N_t]
        alpha, bs, sel1, sel2 = _alpha_from_scores(
            sd[:m_t] * inv_temp, colv[:, c0:c0 + n_t], fml[:, c0:c0 + n_t],
            gt=gt, w=w, r=r, r_pad=r_pad, dot_dtype=vf.dtype)
        dalpha = sd[m_t:]
        ad = alpha * dalpha
        gs2 = _sel_dot(ad, sel1, vf.dtype)
        bs2 = _sel_dot(gs2, sel2, vf.dtype)
        # softmax Jacobian per group; uniform-fallback groups (bs==0) have
        # constant alpha => zero gradient
        ds = jnp.where(bs > 0, (ad - alpha * bs2) * inv_temp, 0.0)
        dsf = ds.astype(vf.dtype)
        # merged [N_t, 2M_t]x[2M_t, E]: alpha^T du_t + dsf^T vc in ONE
        # contraction over the stacked M axis
        contrib = jax.lax.dot_general(
            jnp.concatenate([alpha.astype(vf.dtype), dsf], axis=0),
            jnp.concatenate([du_t, vc], axis=0), dn_c,
            preferred_element_type=jnp.float32, precision=precision)
        dvf_ref[0, c0:c0 + n_t, :] = dvf_ref[0, c0:c0 + n_t, :] + contrib
        dvc_ref[0, t0 * r_pad:t0 * r_pad + m_t, :] = jax.lax.dot_general(
            dsf, cols, dn, preferred_element_type=jnp.float32,
            precision=precision)                            # [M_t, E]


def _bwd_kernel_res(vf_ref, colv_ref, fml_ref, alpha_ref, du_ref,
                    dvf_ref, dvc_ref,
                    *, T, w, r, r_pad, inv_temp, precision, tile):
    """Backward with alpha loaded from the forward's residual instead of
    recomputed: drops the score-recompute half of the merged [2M,E]x[E,N]
    matmul and the exp/band-softmax VPU work, at the cost of the alpha
    band's HBM round-trip. The bs>0 (live-group) mask is recomputed from
    the column-validity row — bs = Σ exp over live columns, so bs>0 iff
    the group has any live column (no scores needed). Equivalence needs
    one precondition: no LIVE column's exp may underflow to 0, which the
    wrapper guarantees — the only entry point (ctx_mix_pallas) asserts
    temp >= 0.02 and region embeddings are l2-normalized (padded rows are
    zero vectors), so |s| <= 1/temp <= 50 and exp(s) >= exp(-50) ≈ 2e-22,
    far above f32/bf16 underflow (8 exponent bits, min normal ~1e-38).
    Without that bound (ctx_temp < ~0.0115) a live group could take the
    forward's uniform fallback (zero gradient) while this gate computed a
    nonzero one (ADVICE r4 #2); the assert makes the gates identical."""
    vf = vf_ref[0]
    colv = colv_ref[0]
    fml = fml_ref[0]
    du = du_ref[0]
    dn = (((1,), (0,)), ((), ()))
    dn_t = (((1,), (1,)), ((), ()))
    dn_c = (((0,), (0,)), ((), ()))
    dvf_ref[0] = jnp.zeros(dvf_ref.shape[1:], jnp.float32)
    for i, t0 in enumerate(range(0, T, tile)):
        gt = min(tile, T - t0)
        m_t = gt * r_pad
        n_t = (gt + 2 * w) * r_pad
        c0 = t0 * r_pad
        vc = vf[(w + t0) * r_pad:(w + t0) * r_pad + m_t, :]
        cols = vf[c0:c0 + n_t, :]
        alpha = alpha_ref[0, i].astype(jnp.float32)
        scale = _row_scale(fml[:, c0:c0 + n_t], m_t, n_t, r_pad, w)
        du_t = (du[t0 * r_pad:t0 * r_pad + m_t, :] * scale).astype(vf.dtype)
        dalpha = jax.lax.dot_general(du_t, cols, dn_t,
                                     preferred_element_type=jnp.float32,
                                     precision=precision)    # [M_t, N_t]
        band = _band(m_t, n_t, r_pad, r, w)
        live = band & (colv[:, c0:c0 + n_t] > 0)
        sel1, sel2 = _selectors(n_t, gt + 2 * w, r_pad, dtype=vf.dtype)
        # live-group mask == (bs > 0) of the recompute path
        lg = _sel_dot(jnp.where(live, 1.0, 0.0), sel1, vf.dtype)
        ls = _sel_dot(lg, sel2, vf.dtype)
        ad = alpha * dalpha
        gs2 = _sel_dot(ad.astype(vf.dtype), sel1, vf.dtype)
        bs2 = _sel_dot(gs2, sel2, vf.dtype)
        ds = jnp.where(ls > 0, (ad - alpha * bs2) * inv_temp, 0.0)
        dsf = ds.astype(vf.dtype)
        contrib = jax.lax.dot_general(
            jnp.concatenate([alpha.astype(vf.dtype), dsf], axis=0),
            jnp.concatenate([du_t, vc], axis=0), dn_c,
            preferred_element_type=jnp.float32, precision=precision)
        dvf_ref[0, c0:c0 + n_t, :] = dvf_ref[0, c0:c0 + n_t, :] + contrib
        dvc_ref[0, t0 * r_pad:t0 * r_pad + m_t, :] = jax.lax.dot_general(
            dsf, cols, dn, preferred_element_type=jnp.float32,
            precision=precision)


def _specs(n_ext, e, out):
    ins = [
        pl.BlockSpec((1, n_ext, e), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_ext), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, n_ext), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    outs = [pl.BlockSpec((1, s1, s2), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM) for s1, s2 in out]
    return ins, outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ctx_core(vf, colv, fml, window, temp, t, r, r_pad, tile):
    u, _ = _ctx_core_fwd(vf, colv, fml, window, temp, t, r, r_pad, tile)
    return u


def _ctx_core_fwd(vf, colv, fml, window, temp, t, r, r_pad, tile):
    b, n_ext, e = vf.shape
    m_rows = t * r_pad
    kern = functools.partial(_fwd_kernel, T=t, w=window, r=r, r_pad=r_pad,
                             inv_temp=1.0 / temp, precision=_prec(vf.dtype),
                             tile=tile)
    ins, outs = _specs(n_ext, e, [(m_rows, e)])
    # output in the input dtype (bf16 in bf16 mode): every consumer of u
    # casts to the compute dtype anyway, and the f32 [B,T·R,E] write+reads
    # were pure HBM traffic. The fm_c/den scale is folded into the store.
    u = pl.pallas_call(
        kern, grid=(b,), in_specs=ins, out_specs=outs[0],
        out_shape=_sds((b, m_rows, e), vf.dtype, _vma_of(vf, colv, fml)),
        interpret=_interpret(),
    )(vf, colv, fml)
    return u, (vf, colv, fml)


def _ctx_core_bwd(window, temp, t, r, r_pad, tile, res, du):
    vf, colv, fml = res
    b, n_ext, e = vf.shape
    m_rows = t * r_pad
    kern = functools.partial(_bwd_kernel, T=t, w=window, r=r, r_pad=r_pad,
                             inv_temp=1.0 / temp, precision=_prec(vf.dtype),
                             tile=tile)
    ins, outs = _specs(n_ext, e, [(n_ext, e), (m_rows, e)])
    ins.append(pl.BlockSpec((1, m_rows, e), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM))
    vma = _vma_of(vf, colv, fml, du)
    dvf, dvc = pl.pallas_call(
        kern, grid=(b,), in_specs=ins, out_specs=outs,
        out_shape=[_sds((b, n_ext, e), jnp.float32, vma),
                   _sds((b, m_rows, e), jnp.float32, vma)],
        interpret=_interpret(),
    )(vf, colv, fml, du.astype(vf.dtype))   # du rides in the compute dtype:
    # the kernel multiplies it by the row scale and immediately casts to
    # vf.dtype for the dalpha matmul — upcasting to f32 here only doubled
    # its HBM bytes
    # query-side grads belong to the center rows of vf
    dvf = dvf.at[:, window * r_pad:window * r_pad + m_rows, :].add(dvc)
    return dvf.astype(vf.dtype), None, None


_ctx_core.defvjp(_ctx_core_fwd, _ctx_core_bwd)


# --- alpha-as-residual variant (r4 PRODUCTION DEFAULT) ----------------------
# The forward saves the banded alpha slabs so the backward skips the score
# recompute (half of its merged [2M,E]x[E,N] matmul + the exp/band-softmax
# VPU work) for an HBM round-trip of the band. Within-process A/B on the
# full config-4 step (ab_step_variants.py): 1061.6 -> 1044.3 us/step
# (-17.3 us). Requires T % tile == 0 (regular residual layout) and a
# bounded slab (long clips would blow the VMEM output block); the wrapper
# falls back to the recompute path otherwise.
ALPHA_RESIDUAL = True
_ALPHA_SLAB_MAX_BYTES = 2 << 20   # per-video residual block cap (VMEM)

# Long-clip ceiling (r5, measured on v5e): the BACKWARD kernel's per-grid-
# step blocks are full-T slabs — dvf f32 [n_ext,E] + dvc f32 [m_rows,E]
# outputs plus the vf/du inputs — and Mosaic allocates them on the 16 MB
# scoped-VMEM stack. At R=20/E=256/bf16 that is ~0.07 MB per frame: T=192
# compiles (~14 MB), T=256 does not ("Scoped allocation with size 18.00M
# and limit 16.00M", full error in docs/PERF.md "long-clip sweep"). The
# wrapper estimates the bound with the formula below (slightly
# OVERestimating vs the compiler's number, so the cutoff lands safely
# inside the limit) and falls back to the tested-identical XLA path above
# it — long clips train at jnp-ctx speed (~2× slower ctx term, measured)
# instead of failing to compile. Single-chip T past this bound is exactly
# where SP sharding (parallel/sp.py) starts paying.
_BWD_SCOPED_VMEM_LIMIT = 16 << 20
# With train.scoped_vmem_kib=65536 (the 64 MB compiler option,
# train.jit_compiler_options) the envelope extends — but NOT linearly:
# above T≈256 the compiler's stack use grows superlinearly in T
# (measured: 18.0 MB actual at T=256 ≈ the block formula; 66.4 MB at
# T=448 ≈ 2.1× it) and compile TIME degrades too (T=384 did not finish
# compiling in 25 min). The measured-good envelope at 64 MB is T=320
# (57 s compile, 1.56 µs/frame — 1.8× faster than the XLA fallback);
# T=448+ exceeds even 64 MB. _BWD_EXTENDED_LIMIT is the block-formula
# value at that measured edge (T=320 → ~22.7 MB), so the gate admits
# exactly the validated region and nothing past it.
_BWD_EXTENDED_LIMIT = 23 << 20


def _ctx_bwd_vmem_bytes(t: int, r_pad: int, e: int, window: int,
                        itemsize: int, slab_bytes: int = 0) -> int:
    """Estimated scoped-VMEM bytes of the backward kernel's blocks."""
    n_ext = (t + 2 * window) * r_pad
    m_rows = t * r_pad
    # dvf/dvc f32 outputs + vf/du compute-dtype inputs (+ alpha band when
    # the residual core is engaged); colv/fml rows are negligible
    return (n_ext + m_rows) * e * (4 + itemsize) + slab_bytes


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _ctx_core_res(vf, colv, fml, window, temp, t, r, r_pad, tile):
    u, _ = _ctx_core_res_fwd(vf, colv, fml, window, temp, t, r, r_pad, tile)
    return u


def _ctx_core_res_fwd(vf, colv, fml, window, temp, t, r, r_pad, tile):
    b, n_ext, e = vf.shape
    m_rows = t * r_pad
    assert t % tile == 0, (t, tile)
    n_tiles = t // tile
    m_t = tile * r_pad
    n_t = (tile + 2 * window) * r_pad
    kern = functools.partial(_fwd_kernel_res, T=t, w=window, r=r,
                             r_pad=r_pad, inv_temp=1.0 / temp,
                             precision=_prec(vf.dtype), tile=tile)
    ins, outs = _specs(n_ext, e, [(m_rows, e)])
    vma = _vma_of(vf, colv, fml)
    outs.append(pl.BlockSpec((1, n_tiles, m_t, n_t),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM))
    u, alpha = pl.pallas_call(
        kern, grid=(b,), in_specs=ins, out_specs=outs,
        out_shape=[_sds((b, m_rows, e), vf.dtype, vma),
                   # alpha rides in the compute dtype (bf16 mode halves the
                   # round-trip bytes; the backward consumes it in that
                   # dtype anyway — the opted-in reduced-precision contract)
                   _sds((b, n_tiles, m_t, n_t), vf.dtype, vma)],
        interpret=_interpret(),
    )(vf, colv, fml)
    return u, (vf, colv, fml, alpha)


def _ctx_core_res_bwd(window, temp, t, r, r_pad, tile, res, du):
    vf, colv, fml, alpha = res
    b, n_ext, e = vf.shape
    m_rows = t * r_pad
    n_tiles, m_t, n_t = alpha.shape[1:]
    kern = functools.partial(_bwd_kernel_res, T=t, w=window, r=r,
                             r_pad=r_pad, inv_temp=1.0 / temp,
                             precision=_prec(vf.dtype), tile=tile)
    ins, outs = _specs(n_ext, e, [(n_ext, e), (m_rows, e)])
    ins.append(pl.BlockSpec((1, n_tiles, m_t, n_t),
                            lambda i: (i, 0, 0, 0),
                            memory_space=pltpu.VMEM))
    ins.append(pl.BlockSpec((1, m_rows, e), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM))
    vma = _vma_of(vf, colv, fml, du)
    dvf, dvc = pl.pallas_call(
        kern, grid=(b,), in_specs=ins, out_specs=outs,
        out_shape=[_sds((b, n_ext, e), jnp.float32, vma),
                   _sds((b, m_rows, e), jnp.float32, vma)],
        interpret=_interpret(),
    )(vf, colv, fml, alpha, du.astype(vf.dtype))
    dvf = dvf.at[:, window * r_pad:window * r_pad + m_rows, :].add(dvc)
    return dvf.astype(vf.dtype), None, None


_ctx_core_res.defvjp(_ctx_core_res_fwd, _ctx_core_res_bwd)


def _pick_tile(t: int, w: int) -> int:
    """Frame-tile size. Sweep on v5e at production shapes (T=20, w=3, bf16,
    after the selector-dtype fix): tile=10 360 us fwd+bwd, tile=4 385,
    tile=5 403, tile=3 427, tile=2 and tile=20 461. Cheap selectors moved
    the optimum up — bigger tiles fill the MXU's 128 rows (M_t = tile·r_pad)
    and amortize per-tile overhead — while the unbanded tile=T re-pays the
    full-matrix FLOPs. Capped at 10 to bound the [M_t, N_t] slab VMEM for
    long clips."""
    if t <= 4:
        return t
    # VMEM cap: keep the per-tile [g·r_pad, (g+2w)·r_pad] slab near the
    # swept tile=10/w=3 size (10·16 = 160 frame-pairs); larger windows
    # shrink the cap accordingly
    cap = 10
    while cap > 4 and cap * (cap + 2 * w) > 160:
        cap -= 1
    return min(cap, max(4, t // 2))


def ctx_mix_pallas(v_ext: jax.Array, fm_ext: jax.Array, window: int,
                   temp: float, dtype=None,
                   rm_ext: jax.Array | None = None,
                   tile: int | None = None,
                   scoped_vmem_kib: int = 0
                   ) -> tuple[jax.Array, jax.Array]:
    """Drop-in fused replacement for ops/grounding.context_mix.

    v_ext [B, w+T+w, R, E] (halo form), fm_ext [B, w+T+w],
    rm_ext [B, w+T+w, R] optional -> (u [B,T,R,E], nbr_valid [B,T,O]).
    tile: center frames per kernel tile (None = auto; T = unbanded).
    scoped_vmem_kib: the compiler scoped-VMEM limit the CALLER's jit was
    built with (train.scoped_vmem_kib); >= 65536 extends the long-clip
    gate to the measured envelope (_BWD_EXTENDED_LIMIT).
    """
    assert temp >= 0.02, "ctx kernel takes exp() without max-subtraction; " \
        "|logits|<=1/temp must stay in f32 range (temp>=0.02)"
    if _vma_needs_fallback(v_ext, fm_ext, rm_ext if rm_ext is not None
                           else fm_ext):
        # interpret-mode pallas cannot run under shard_map(check_vma=True);
        # the offset form is the tested-identical jnp math
        from nafae_tpu.ops.grounding import context_mix
        return context_mix(v_ext, fm_ext, window, temp, dtype=dtype,
                           rm_ext=rm_ext, impl="offset")
    b, t_ext, r, e = v_ext.shape
    t = t_ext - 2 * window
    r_pad = _round_up(r, 8)
    if tile is None:
        tile = _pick_tile(t, window)
    tile = max(1, min(tile, t))
    itemsize = jnp.dtype(dtype).itemsize if dtype is not None \
        else v_ext.dtype.itemsize
    vmem_gate = _BWD_EXTENDED_LIMIT if scoped_vmem_kib >= 65536 \
        else _BWD_SCOPED_VMEM_LIMIT
    if _ctx_bwd_vmem_bytes(t, r_pad, e, window, itemsize) > vmem_gate:
        # long-clip scoped-VMEM ceiling (see _BWD_SCOPED_VMEM_LIMIT): the
        # XLA offset form is tested-identical math and compiles at any T
        import warnings
        warnings.warn(
            f"ctx Pallas kernel skipped at T={t} (backward scoped-VMEM "
            f"estimate over {vmem_gate >> 20} MB); using the XLA ctx path "
            "— shard frames (mesh.frame_axis), or set "
            "train.scoped_vmem_kib=65536 for the extended single-chip "
            "envelope (T<=320 at R=20/E=256), to re-engage the kernel")
        from nafae_tpu.ops.grounding import context_mix
        return context_mix(v_ext, fm_ext, window, temp, dtype=dtype,
                           rm_ext=rm_ext, impl="offset")
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
    slab_bytes = ((t // max(tile, 1)) * tile * r_pad
                  * (tile + 2 * window) * r_pad * v_ext.dtype.itemsize)
    core = (_ctx_core_res if ALPHA_RESIDUAL and t % tile == 0
            and slab_bytes <= _ALPHA_SLAB_MAX_BYTES else _ctx_core)
    u = core(vf, colv, fml, window, float(temp), t, r, r_pad,
             tile)                                          # [B, T*r_pad, E]
    # fm_c masking and the /den averaging are already folded into the
    # kernel's store (per-row scale from the frame-validity row)
    u = u.reshape(b, t, r_pad, e)[:, :, :r, :]
    center = jnp.arange(t) + window
    fm_c = fm_ext[:, window:window + t]
    offs = [o for o in range(-window, window + 1) if o != 0]
    nbr_valid = jnp.stack([fm_ext[:, center + o] for o in offs],
                          axis=2) * fm_c[:, :, None]        # [B,T,O]
    return u, nbr_valid
