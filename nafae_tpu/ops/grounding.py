"""Grounding forward ops: similarity tensor, MIL pooling, contextual similarity.

Implements docs/MATH.md §Forward and §Contextual-similarity exactly (the torch
oracle in tests/oracle_torch.py mirrors these). Reference behavior per SURVEY.md
L98 (model layer) and L141-144 (similarity / MIL / context components); the
reference's per-frame Python loops (SURVEY.md L179) are replaced by batched
einsums over the full [B,K,T,R] tensor — one XLA program per step.

Conventions: masks are float (0/1). NEG = -1e9 is the masked-max/-softmax fill.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NEG = -1e9

# All einsums request full input-dtype precision by default: on TPU the
# default would run f32 contractions via bf16 MXU passes (~1e-3 error),
# breaking oracle parity. The fast path opts into reduced precision
# explicitly via compute_dtype + matmul_precision(), not silently.
# PRECISION is read at trace time (call sites pass `precision=PRECISION`
# late-bound through the module global), so the context manager below can
# retarget a whole jitted trace — including the einsum TRANSPOSES in the
# backward pass, where f32 cotangents would otherwise force 6-pass matmuls.
PRECISION = jax.lax.Precision.HIGHEST

import contextlib as _contextlib


@_contextlib.contextmanager
def matmul_precision(p):
    """Trace-time precision override: "highest" (default) or "default"."""
    global PRECISION
    old = PRECISION
    if str(p) not in ("highest", "default"):
        # a typo must not silently opt into bf16 MXU passes (~1e-3 error)
        raise ValueError(f"unknown matmul precision {p!r}; "
                         "choose highest | default")
    PRECISION = (jax.lax.Precision.HIGHEST if str(p) == "highest"
                 else jax.lax.Precision.DEFAULT)
    try:
        yield
    finally:
        PRECISION = old


def l2_normalize(x: jax.Array, axis: int = -1, eps: float = 1e-8) -> jax.Array:
    return x * jax.lax.rsqrt(jnp.sum(x * x, axis=axis, keepdims=True) + eps)


def embed_words(word_ids: jax.Array, emb: jax.Array,
                m_sim: jax.Array | None = None) -> jax.Array:
    """word_ids [B,K] int32, emb [V,E] -> normalized ŵ [B,K,E].

    m_sim [E,E] (docs/MATH.md step 3 [CHOICE], model.similarity="bilinear"):
    the bilinear form s = ŵᵀ·M·v̂ folded into the word side, w̃ = ŵ@M —
    every downstream similarity consumer (diag/cross einsums, Pallas
    cross_mil, SP shards, ctx ŝ) then works unchanged on w̃. Identity init
    makes bilinear ≡ cosine at step 0 (models/grounding.init_params).
    """
    w = l2_normalize(jnp.take(emb, word_ids, axis=0))
    if m_sim is not None:
        w = jnp.einsum("bke,ef->bkf", w, m_sim.astype(jnp.float32),
                       preferred_element_type=jnp.float32,
                       precision=PRECISION)
    return w


def project_regions(feats: jax.Array, w_v: jax.Array, b_v: jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    """feats [B,T,R,D] -> normalized v̂ [B,T,R,E]. Matmul on the MXU in `dtype`.

    Written as a 2-D reshape-matmul rather than a 4-D einsum: identical
    values (same contraction, bitwise-equal measured), but XLA lays the
    [B·T·R, E] matmul output out row-major, which downstream reshapes share
    with the Pallas ctx kernel's flat [B, T·R_pad, E] operand — measured
    -10 us/step at config4 shapes vs the einsum's {3,0,2,1} layout choice.
    """
    b, t, r, d = feats.shape
    f2 = feats.reshape(b * t * r, d).astype(dtype)
    v = jax.lax.dot_general(f2, w_v.astype(dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=PRECISION)
    v = v.reshape(b, t, r, -1) + b_v.astype(jnp.float32)
    return l2_normalize(v)


# ---------------------------------------------------------------- int8 path
# Quantized INFERENCE compute (VERDICT r4 #3: int8 was storage-only): the
# projection matmul is >99% of the eval/serve FLOPs (2·BTR·D·E vs the
# similarity's 2·BKTR·E — K/D ≈ 0.4%), and the v5e MXU runs int8×int8→int32
# at ~2× bf16 peak, so quantizing just this dot is the whole opportunity.
# Scheme: per-OUTPUT-channel symmetric weights (scale s_e over w_v[:, e] —
# the one granularity that factors OUT of the contraction over D) ×
# per-ROW dynamic activations (scale per region vector). The l2_normalize
# right after the dot makes the row scale nearly cancel (it survives only
# through the +b_v term), so end-to-end similarity error stays small
# (pinned in tests/test_ops.py and the golden-fixture delta in
# tests/test_e2e.py). Training is untouched — this is inference-only.

def quantize_weight_int8(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """w [D,E] f32 -> (q [D,E] int8, scale [1,E] f32), per-output-channel
    symmetric: q = round(w / s_e), s_e = max|w[:, e]| / 127."""
    w = jnp.asarray(w, jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True),
                        1e-12) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return q, scale


def quantize_params_int8(params: dict) -> dict:
    """Inference-params transform: replace "w_v" with "w_v.q8"/"w_v.scale8"
    (everything else passes through). ground_forward / the eval and serve
    paths dispatch on the presence of "w_v.q8"
    (the "8" keeps the suffix disjoint from serve.py's storage-quantization
    ".q"/".scale" keys, which dequantize at load). Wire-up:
    `--override model.quantize=int8` on the eval/serve CLIs."""
    out = {k: v for k, v in params.items() if k != "w_v"}
    q, scale = quantize_weight_int8(params["w_v"])
    out["w_v.q8"], out["w_v.scale8"] = q, scale
    return out


def project_regions_int8(feats: jax.Array, w_q: jax.Array,
                         w_scale: jax.Array, b_v: jax.Array,
                         dtype=None) -> jax.Array:
    """feats [B,T,R,D] -> normalized v̂ [B,T,R,E] via an int8×int8→int32
    MXU dot. Activations quantize per row (one dynamic scale per region
    vector: s_n = max|f[n,:]| / 127); dequantization is a rank-1 outer
    scale (s_n · s_e) folded into the f32 epilogue before bias+normalize.
    Returns f32 like project_regions (consumers cast to the compute dtype
    themselves); `dtype` is accepted for signature parity and ignored —
    the dot is int8 by construction.
    """
    del dtype
    b, t, r, d = feats.shape
    f2 = feats.reshape(b * t * r, d)
    sf = jnp.maximum(jnp.max(jnp.abs(f2), axis=1, keepdims=True),
                     1e-12) / 127.0                          # [N,1]
    q = jnp.clip(jnp.round(f2 / sf), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(q, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)  # [N,E] i32
    v = acc.astype(jnp.float32) * (sf * w_scale) + b_v.astype(jnp.float32)
    return l2_normalize(v.reshape(b, t, r, -1))


def quantize_feats_int8(feats: jax.Array) -> tuple[jax.Array, jax.Array]:
    """feats [B,T,R,D] -> (q int8, sf [B,T,R,1] f32), per-region-row
    symmetric. The OFFLINE half of the int8 serving path: features are
    extracted once and stored/transferred int8 (4× smaller than f32), so
    the serving program reads a quarter of the HBM bytes AND runs the
    int8 MXU dot — the on-the-fly scheme (project_regions_int8) must
    instead re-read the f32 features to quantize them per call, which
    re-pays the traffic the int8 dot saves (the projection is HBM-bound:
    docs/PERF.md roofline)."""
    sf = jnp.maximum(jnp.max(jnp.abs(feats), axis=-1, keepdims=True),
                     1e-12) / 127.0
    q = jnp.clip(jnp.round(feats / sf), -127, 127).astype(jnp.int8)
    return q, sf


def project_regions_int8_pre(q_feats: jax.Array, sf: jax.Array,
                             w_q: jax.Array, w_scale: jax.Array,
                             b_v: jax.Array) -> jax.Array:
    """Projection from PRE-quantized features (quantize_feats_int8):
    int8×int8→int32 dot + rank-1 f32 dequant epilogue + bias + normalize.
    Returns f32 [B,T,R,E] like project_regions."""
    b, t, r, d = q_feats.shape
    q2 = q_feats.reshape(b * t * r, d)
    acc = jax.lax.dot_general(q2, w_q, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)  # [N,E] i32
    v = (acc.astype(jnp.float32) * (sf.reshape(-1, 1) * w_scale)
         + b_v.astype(jnp.float32))
    return l2_normalize(v.reshape(b, t, r, -1))


def project_params(params: dict, feats: jax.Array, dtype=jnp.float32,
                   feats_scale: jax.Array | None = None) -> jax.Array:
    """Projection dispatch: pre-quantized int8 features (int8 feats +
    feats_scale, the offline serving path), dynamic int8 (quantized params
    only), or the standard f32/bf16 matmul."""
    if feats.dtype == jnp.int8:
        assert "w_v.q8" in params and feats_scale is not None, \
            "int8 features need quantized params + their scales"
        return project_regions_int8_pre(feats, feats_scale,
                                        params["w_v.q8"],
                                        params["w_v.scale8"],
                                        params["b_v"])
    if "w_v.q8" in params:
        return project_regions_int8(feats, params["w_v.q8"],
                                    params["w_v.scale8"], params["b_v"],
                                    dtype=dtype)
    return project_regions(feats, params["w_v"], params["b_v"], dtype=dtype)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def project_regions_fused(feats: jax.Array, w_v: jax.Array, b_v: jax.Array,
                          dtype) -> jax.Array:
    """project_regions + the downstream compute-dtype cast, with the
    normalize BACKWARD run in the compute dtype (train.PROJ_FUSED,
    reduced-precision mode only).

    Forward math is identical to `project_regions(...).astype(dtype)`
    (bitwise: same dot, same f32 bias+rsqrt epilogue, same final cast).
    What changes is the autodiff plan: XLA's backward of the f32 normalize
    chain reads/writes f32 [B·T·R, E] tensors (~57 µs/step of pure HBM at
    config4 shapes — docs/PERF.md device-time table) and saves an f32
    residual in the forward. Here the residuals are the bf16 OUTPUT itself
    plus the [N,1] f32 inverse norms, and the backward computes
    dv = (g − v̂·(g·v̂)) · inv with f32 row-reductions but compute-dtype
    reads/writes, then feeds the dW/db dots directly. feats is frozen data
    everywhere this runs (train.py:138 stop_gradients the inline detector;
    the packed loader feats are inputs), so its cotangent is a symbolic
    zero.
    """
    out, _ = _proj_fused_fwd(feats, w_v, b_v, dtype)
    return out


def _proj_fused_fwd(feats, w_v, b_v, dtype):
    b, t, r, d = feats.shape
    f2 = feats.reshape(b * t * r, d).astype(dtype)
    v = jax.lax.dot_general(f2, w_v.astype(dtype), (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=PRECISION)                 # [N,E] f32
    v = v + b_v.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-8)
    vhat = (v * inv).astype(dtype)                               # [N,E]
    # feats rides along only to shape the (DCE'd) zero cotangent — an alias,
    # not a copy
    return vhat.reshape(b, t, r, -1), (f2, vhat, inv, feats)


def _proj_fused_bwd(dtype, res, g):
    f2, vhat, inv, feats = res
    n, e = vhat.shape
    g2 = g.reshape(n, e)
    # row dots g·v̂ with f32 accumulation (bf16 products are exact in f32)
    gd = jnp.einsum("ne,ne->n", g2, vhat,
                    preferred_element_type=jnp.float32,
                    precision=PRECISION)[:, None]                # [N,1] f32
    dv32 = (g2.astype(jnp.float32) - vhat.astype(jnp.float32) * gd) * inv
    dv = dv32.astype(dtype)                                      # [N,E]
    dw = jax.lax.dot_general(f2, dv, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32,
                             precision=PRECISION)                # [D,E] f32
    db = jnp.sum(dv32, axis=0)                                   # [E] f32
    # Under shard_map(check_vma=True) the activations vary over the mesh
    # axes while w_v/b_v are replicated at every call site; the transpose
    # of a NON-custom backward would insert the cross-device psum
    # automatically, but a custom_vjp must emit it itself — without it the
    # params' cotangent is inferred varying and the bf16 mesh step fails
    # to compile (caught by tests/test_sp.py::test_mesh_train_step_bf16,
    # r5). Outside shard_map the vma sets are empty and this is a no-op.
    axes = tuple(sorted(getattr(jax.typeof(dw), "vma", ())))
    if axes:
        dw = jax.lax.psum(dw, axes)
        db = jax.lax.psum(db, axes)
    # feats is frozen data at every call site (train.py stop_gradients the
    # inline detector; loader feats are inputs) — the zero cotangent is DCE'd
    return (jnp.zeros_like(feats), dw, db)


project_regions_fused.defvjp(_proj_fused_fwd, _proj_fused_bwd)


def similarity_tensor(w_emb: jax.Array, v_emb: jax.Array,
                      dtype=None) -> jax.Array:
    """Cosine similarity s[b,k,t,r] = ŵ[b,k]·v̂[b,t,r].  [B,K,E]x[B,T,R,E]->[B,K,T,R].

    dtype=bfloat16 casts the operands for a single-pass MXU contraction
    (accumulation stays f32 via preferred_element_type) — the production TPU
    mode; default keeps full input precision for oracle parity.
    """
    w_emb, v_emb = _cast2(w_emb, v_emb, dtype)
    return jnp.einsum("bke,btre->bktr", w_emb, v_emb,
                      preferred_element_type=jnp.float32, precision=PRECISION)


def _cast2(a, b, dtype):
    """Cast both operands to the compute dtype, each independently.

    Per-operand checks matter: callers pass operands in either order and
    one may already be in the compute dtype (e.g. a Pallas context-mix
    output) — a short-circuit on one operand's dtype would silently leave
    the OTHER unquantized (r2 review fix; the SP path diverged from the
    single-device run in bf16 context mode because of exactly that)."""
    if dtype is None:
        return a, b
    dt = jnp.dtype(dtype)
    return (a if a.dtype == dt else a.astype(dt),
            b if b.dtype == dt else b.astype(dt))


def mask_regions(s: jax.Array, region_mask: jax.Array | None) -> jax.Array:
    """Fill invalid region slots with NEG so max/argmax/softmax ignore them.

    s [..,K,T,R] (leading video axis first); region_mask [B,T,R] or None.
    For cross tensors [I,J,K,T,R] the mask indexes the VIDEO axis I.
    """
    if region_mask is None:
        return s
    extra = s.ndim - region_mask.ndim - 1          # axes between B and (T,R)
    rm = region_mask.reshape(
        region_mask.shape[:1] + (1,) * (extra + 1) + region_mask.shape[1:])
    return jnp.where(rm > 0, s, NEG)


def argmax_regions_2d(s: jax.Array) -> jax.Array:
    """argmax_r of the [B,K,T,R] similarity via a [R, B·K·T] relayout.

    jnp.argmax over the last axis of s lowers to a variadic reduce over the
    R=20 LANE axis (20 of 128 lanes live) fused into the diag einsum — a
    37.8 us/step VPU loop at config4 shapes (docs/PERF.md r4 trace).
    Transposing the MATERIALIZED s to [R, B·K·T] puts the reduce over
    sublanes with all 128 lanes live; the relayout copy is ~205 KB bf16.
    Same tensor, same values, same lowest-r tie rule (argmax over axis 0
    returns the first maximal r, like argmax over the last axis) — the
    selection is bitwise-identical to jnp.argmax(s, -1), unlike the r4
    re-emitted-transposed-einsum attempt (+99.9 us/step LOSS, deleted —
    see PERF.md "headroom closed").
    """
    b, k, t, r = s.shape
    st = s.reshape(b * k * t, r).T                  # [R, B·K·T]
    return jnp.argmax(st, axis=0).reshape(b, k, t).astype(jnp.int32)


def frame_mil_max(s: jax.Array, frame_mask: jax.Array) -> jax.Array:
    """MIL max over regions: a[..,k,t] = max_r s (invalid frames -> 0).

    s: [..,K,T,R]; frame_mask: broadcastable to [..,T].
    """
    a = jnp.max(s, axis=-1)
    return jnp.where(frame_mask[..., None, :] > 0, a, 0.0)


def frame_attention(frame_logits: jax.Array, frame_mask: jax.Array,
                    temp: float, pool: str) -> jax.Array:
    """β[..,t] from per-frame logits g[..,t] (docs/MATH.md step 5)."""
    if pool == "mean":
        denom = jnp.maximum(jnp.sum(frame_mask, axis=-1, keepdims=True), 1.0)
        return jnp.broadcast_to(frame_mask / denom, frame_logits.shape)
    logits = jnp.where(frame_mask > 0, frame_logits / temp, NEG)
    return jax.nn.softmax(logits, axis=-1) * frame_mask


def _masked_word_mean(x: jax.Array, word_mask: jax.Array) -> jax.Array:
    """Masked mean over the word axis: x [..,K,T], word_mask [..,K] -> [..,T]."""
    num = jnp.sum(x * word_mask[..., None], axis=-2)
    den = jnp.maximum(jnp.sum(word_mask, axis=-1), 1.0)
    return num / den[..., None]


def learned_frame_logits(v_emb: jax.Array, frame_mask: jax.Array,
                         region_mask: jax.Array | None,
                         attn_w: jax.Array) -> jax.Array:
    """Learned per-frame attention logits (docs/MATH.md step 5,
    `frame_pool="learned"`): a linear scorer on the frame's pooled region
    embedding, g[b,t] = v̄[b,t]·attn_w with v̄ the masked mean of v̂ over
    valid regions. Deliberately BIAS-FREE: the softmax over frames is
    shift-invariant, so a bias would be a dead parameter whose zero
    gradient is pure float noise — which adam then amplifies to full step
    size, breaking DP-vs-single-device exactness. Sentence-INDEPENDENT
    (unlike the word-score form), so the cross-batch ranking reuses one
    [B,T] table for all sentences.

    v_emb [B,T,R,E]; region_mask [B,T,R] or None; attn_w [E].
    Invalid frames' logits are garbage — frame_attention masks them.
    """
    if region_mask is not None:
        num = jnp.sum(v_emb * region_mask[..., None].astype(v_emb.dtype),
                      axis=-2)
        den = jnp.maximum(jnp.sum(region_mask, axis=-1), 1.0)
    else:
        num = jnp.sum(v_emb, axis=-2)
        den = jnp.asarray(float(v_emb.shape[-2]))
    vbar = num.astype(jnp.float32) / den[..., None]              # [B,T,E]
    g = jnp.einsum("bte,e->bt", vbar, attn_w.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=PRECISION)
    return g * frame_mask


def video_scores(a: jax.Array, word_mask: jax.Array, frame_mask: jax.Array,
                 temp: float, pool: str,
                 frame_logits: jax.Array | None = None) -> tuple[jax.Array, jax.Array]:
    """a [..,K,T] -> (S [..], β [..,T]).  frame_logits overrides g (context pooling)."""
    g = frame_logits if frame_logits is not None else _masked_word_mean(a, word_mask)
    beta = frame_attention(g, frame_mask, temp,
                           "attention" if pool in ("context", "learned")
                           else pool)
    s_w = jnp.sum(beta[..., None, :] * a, axis=-1)           # [.., K]
    s = jnp.sum(s_w * word_mask, axis=-1) / jnp.maximum(
        jnp.sum(word_mask, axis=-1), 1.0)
    return s, beta


def region_affinity(v_emb: jax.Array, frame_mask: jax.Array,
                    window: int, temp: float,
                    dtype=None) -> tuple[jax.Array, jax.Array]:
    """Neighbor-frame region affinities (docs/MATH.md §Contextual-similarity).

    Returns:
      alpha [B,T,R,O,S]: softmax over S (= neighbor regions r') of
        v̂[t,r]·v̂[t+o,r']/τ_a, for the O = 2*window offsets o ∈ {-w..-1, 1..w}.
      nbr_valid [B,T,O]: 1 where both frame t and neighbor t+o exist and are valid.
    """
    # express as the extended (halo) form with zero-padding — identical
    # semantics, and the SAME code path the frame-sharded (SP) mode uses with
    # real halos from neighbor shards (parallel/sp.py).
    w = window
    v_ext = jnp.pad(v_emb, ((0, 0), (w, w), (0, 0), (0, 0)))
    fm_ext = jnp.pad(frame_mask, ((0, 0), (w, w)))
    return region_affinity_ext(v_ext, fm_ext, w, temp, dtype=dtype)


def extend_for_window(v_emb: jax.Array, frame_mask: jax.Array,
                      region_mask: jax.Array | None, window: int,
                      frame_axis: str | None = None):
    """(v_ext, fm_ext, rm_ext) extended by `window` frames on each side —
    ONE implementation of the ctx-window extension (it had begun to drift
    across call sites): zero-pad on a single device, ppermute halo exchange
    under SP (zeros arrive at edge shards there too, so the two modes are
    mask-identical)."""
    if frame_axis is not None:
        from nafae_tpu.parallel import sp
        return (sp.halo_exchange(v_emb, window, frame_axis),
                sp.halo_exchange(frame_mask, window, frame_axis),
                sp.halo_exchange(region_mask, window, frame_axis)
                if region_mask is not None else None)
    w = window
    return (jnp.pad(v_emb, ((0, 0), (w, w), (0, 0), (0, 0))),
            jnp.pad(frame_mask, ((0, 0), (w, w))),
            jnp.pad(region_mask, ((0, 0), (w, w), (0, 0)))
            if region_mask is not None else None)


def region_affinity_ext(v_ext: jax.Array, fm_ext: jax.Array, window: int,
                        temp: float, dtype=None,
                        rm_ext: jax.Array | None = None
                        ) -> tuple[jax.Array, jax.Array]:
    """Extended-array form: v_ext [B, w+T+w, R, E], fm_ext [B, w+T+w]
    (halo frames at both ends; invalid halos have fm_ext=0). Returns alpha /
    nbr_valid for the CENTER T frames. rm_ext [B, w+T+w, R] optionally
    excludes invalid neighbor regions from the affinity softmax."""
    w = window
    T = v_ext.shape[1] - 2 * w
    offsets = _offsets(w)
    center = jnp.arange(T) + w
    v_nbr = jnp.stack([v_ext[:, center + o] for o in offsets], axis=2)
    nbr_valid = jnp.stack([fm_ext[:, center + o] for o in offsets], axis=2)
    nbr_valid = nbr_valid * fm_ext[:, center, None]           # [B,T,O]
    v_c = v_ext[:, center]
    ve, vn = _cast2(v_c, v_nbr, dtype)
    logits = jnp.einsum("btre,btose->btros", ve, vn,
                        preferred_element_type=jnp.float32, precision=PRECISION) / temp
    if rm_ext is not None:
        rm_nbr = jnp.stack([rm_ext[:, center + o] for o in offsets], axis=2)
        logits = jnp.where(rm_nbr[:, :, None, :, :] > 0, logits, NEG)
    alpha = jax.nn.softmax(logits, axis=-1)                   # over neighbor regions S
    return alpha, nbr_valid


def context_similarity(s: jax.Array, alpha: jax.Array, nbr_valid: jax.Array,
                       cross: bool = False, dtype=None) -> jax.Array:
    """Context-supported similarity ŝ (docs/MATH.md §Contextual-similarity).

    s: [B,K,T,R] (diag) or [I,J,K,T,R] (cross; alpha/nbr_valid indexed by video I).
    alpha: [B,T,R,O,S], nbr_valid: [B,T,O]. Returns ŝ with the shape of s.
    """
    O = alpha.shape[3]
    w = O // 2
    pad = [(0, 0)] * (s.ndim - 2) + [(w, w), (0, 0)]
    return context_similarity_ext(jnp.pad(s, pad), alpha, nbr_valid,
                                  cross=cross, dtype=dtype)


def context_similarity_ext(s_ext: jax.Array, alpha: jax.Array,
                           nbr_valid: jax.Array, cross: bool = False,
                           dtype=None) -> jax.Array:
    """Extended-array form: s_ext has w halo frames at both ends of axis -2
    (zeros when unsharded, real neighbor-shard frames under SP).

    Kept as the direct (gather-s) formulation for reference/testing; the
    production path uses context_mixed_regions + one einsum (identical math,
    factored through the embedding axis — see that docstring).
    """
    O = alpha.shape[3]
    T = alpha.shape[1]
    w = O // 2
    s_nbr = _gather_neighbors(s_ext, T, w)                    # [..,K,T,O,S]
    alpha, s_nbr = _cast2(alpha, s_nbr, dtype)
    if cross:
        contrib = jnp.einsum("itros,ijktos->ijktro", alpha, s_nbr,
                             preferred_element_type=jnp.float32, precision=PRECISION)
        nv = nbr_valid[:, None, None, :, None, :]             # [I,1,1,T,1,O]
    else:
        contrib = jnp.einsum("btros,bktos->bktro", alpha, s_nbr,
                             preferred_element_type=jnp.float32, precision=PRECISION)
        nv = nbr_valid[:, None, :, None, :]                   # [B,1,T,1,O]
    num = jnp.sum(contrib * nv, axis=-1)
    den = jnp.maximum(jnp.sum(nv, axis=-1), 1.0)
    return num / den


def context_mixed_regions(v_ext: jax.Array, alpha: jax.Array,
                          nbr_valid: jax.Array, dtype=None) -> jax.Array:
    """Context-mixed region embeddings u[b,t,r,:] (the production ctx path).

    Because ŝ is linear in s and s is linear in v̂, the context target
    factors through the embedding axis:

        ŝ[b,k,t,r] = ŵ[b,k] · u[b,t,r],
        u[b,t,r]   = Σ_o nv·Σ_s α[b,t,r,o,s]·v̂[b,t+o,s] / Σ_o nv.

    u is SENTENCE-INDEPENDENT, so the cross-batch context similarity is one
    [J,K,E]x[I,T,R,E] einsum instead of a 6-D contraction over all neighbor
    regions — ~O(J·K/ (O·S))x less work and no [I,J,K,T,O,S] intermediate.
    Identical math to context_similarity_ext (tested to float tolerance).

    v_ext [B, w+T+w, R, E] (halo form), alpha [B,T,R,O,S], nbr_valid [B,T,O].
    """
    O = alpha.shape[3]
    w = O // 2
    T = alpha.shape[1]
    offsets = _offsets(w)
    center = jnp.arange(T) + w
    v_nbr = jnp.stack([v_ext[:, center + o] for o in offsets], axis=2)
    # [B,T,O,S,E]
    a_nv = alpha * nbr_valid[:, :, None, :, None]             # fold validity
    a_nv, v_nbr = _cast2(a_nv.astype(v_ext.dtype), v_nbr, dtype)
    num = jnp.einsum("btros,btose->btre", a_nv, v_nbr,
                     preferred_element_type=jnp.float32, precision=PRECISION)
    den = jnp.maximum(jnp.sum(nbr_valid, axis=-1), 1.0)       # [B,T]
    return num / den[:, :, None, None]


def context_mix(v_ext: jax.Array, fm_ext: jax.Array, window: int,
                temp: float, dtype=None,
                rm_ext: jax.Array | None = None,
                impl: str = "offset",
                scoped_vmem_kib: int = 0) -> tuple[jax.Array, jax.Array]:
    """Fused affinity+mixing: (u [B,T,R,E], nbr_valid [B,T,O]) in one pass.

    Identical math to region_affinity_ext -> context_mixed_regions (tested to
    float tolerance). This is the production ctx path (the reference's
    per-frame Python hot loop, SURVEY.md L181 / BASELINE north star).

    impl="offset" (default): static loop over the O = 2w offsets; each
    offset is one [B,T,R,S] tile fused with its softmax and mix matmul. No
    [B,T,O,S,E] neighbor stack or [B,T,R,O,S] alpha tensor in HBM (~78 MB
    at production shapes in the naive formulation).

    impl="pallas": the fused VMEM-resident kernel (ops/pallas/fused_ctx.py)
    — one big MXU matmul for all logits + selector-matmul group softmax +
    one mix matmul, recompute-in-backward. Measured ~26% faster fwd+bwd
    than "offset" at production shapes on a v5e chip.

    impl="dense": ONE [T·R, E]x[E, T_ext·R] batched matmul per video
    computes all offset logits at once, per-(row, neighbor-frame) softmax
    via a reshape group-sum, then one [T·R, T_ext·R]x[T_ext·R, E] matmul
    mixes. Measured at parity with "offset" at production shapes (XLA
    already batches the small per-offset matmuls well).
    """
    if impl == "pallas":
        from nafae_tpu.ops.pallas.fused_ctx import ctx_mix_pallas
        return ctx_mix_pallas(v_ext, fm_ext, window, temp, dtype, rm_ext,
                              scoped_vmem_kib=scoped_vmem_kib)
    if impl == "dense":
        return _context_mix_dense(v_ext, fm_ext, window, temp, dtype, rm_ext)
    w = window
    T = v_ext.shape[1] - 2 * w
    v_c = v_ext[:, w:w + T]                                   # [B,T,R,E]
    fm_c = fm_ext[:, w:w + T]                                 # [B,T]
    num = None
    nv_list = []
    for o in _offsets(w):
        v_o = v_ext[:, w + o:w + o + T]                       # [B,T,S,E]
        nv_o = fm_ext[:, w + o:w + o + T] * fm_c              # [B,T]
        ve, vn = _cast2(v_c, v_o, dtype)
        logits = jnp.einsum("btre,btse->btrs", ve, vn,
                            preferred_element_type=jnp.float32,
                            precision=PRECISION) / temp
        if rm_ext is not None:
            rm_o = rm_ext[:, w + o:w + o + T]                 # [B,T,S]
            logits = jnp.where(rm_o[:, :, None, :] > 0, logits, NEG)
        a_o = jax.nn.softmax(logits, axis=-1)                 # [B,T,R,S]
        a_nv = a_o * nv_o[:, :, None, None]
        ae, vn2 = _cast2(a_nv.astype(v_ext.dtype), v_o, dtype)
        mix = jnp.einsum("btrs,btse->btre", ae, vn2,
                         preferred_element_type=jnp.float32,
                         precision=PRECISION)
        num = mix if num is None else num + mix
        nv_list.append(nv_o)
    nbr_valid = jnp.stack(nv_list, axis=2)                    # [B,T,O]
    den = jnp.maximum(jnp.sum(nbr_valid, axis=-1), 1.0)
    return num / den[:, :, None, None], nbr_valid


def _context_mix_dense(v_ext: jax.Array, fm_ext: jax.Array, window: int,
                       temp: float, dtype=None,
                       rm_ext: jax.Array | None = None
                       ) -> tuple[jax.Array, jax.Array]:
    """Dense band-matrix form of context_mix (see its docstring).

    The per-(row, neighbor-frame) softmax is a standard max-subtracted
    softmax computed on the [B, T·R, T_ext, R] group view. Groups whose
    neighbor frame is valid but has zero rm-valid regions reproduce the
    per-offset softmax's uniform-over-all-NEG behavior exactly.
    """
    w = window
    b, t_ext, r, e = v_ext.shape
    t = t_ext - 2 * w
    n = t_ext * r
    vf = v_ext.reshape(b, n, e)
    vc = vf[:, w * r:(w + t) * r]                             # [B,T·R,E]
    ve, vn = _cast2(vc, vf, dtype)
    s = jnp.einsum("bme,bne->bmn", ve, vn,
                   preferred_element_type=jnp.float32,
                   precision=PRECISION) / temp               # [B,T·R,N]
    # band structure: row m belongs to center frame m//R; col n to extended
    # frame n//R; keep only offsets 1..w on either side (never self)
    off = (jnp.arange(n)[None, :] // r) - (jnp.arange(t * r)[:, None] // r + w)
    band = (off != 0) & (jnp.abs(off) <= w)                  # [T·R,N] static
    colv = jnp.repeat(fm_ext, r, axis=1)                     # [B,N] frame valid
    if rm_ext is not None:
        colv = colv * rm_ext.reshape(b, n)
    live = band[None] & (colv[:, None, :] > 0)
    s4 = s.reshape(b, t * r, t_ext, r)
    live4 = live.reshape(b, t * r, t_ext, r)
    # all operands kept finite (no ±inf) so the where() backward stays
    # NaN-free: masked lanes hold the constant -1e30, which carries no
    # gradient and underflows exp() to 0 whenever the group has a live max
    s4m = jnp.where(live4, s4, jnp.float32(-1e30))
    mx = jnp.max(s4m, axis=-1, keepdims=True)
    ex4 = jnp.where(live4, jnp.exp(s4m - mx), 0.0)
    gs = jnp.sum(ex4, axis=-1, keepdims=True)                # per-group sums
    # empty-but-valid group (frame valid, all regions rm-masked): the
    # per-offset softmax over all-NEG logits is uniform — reproduce it
    frame_ok = (fm_ext[:, None, :, None] > 0) & band.reshape(
        1, t * r, t_ext, r).any(-1, keepdims=True)
    alpha4 = jnp.where(gs > 0, ex4 / jnp.maximum(gs, 1e-30),
                       jnp.where(frame_ok, 1.0 / r, 0.0))
    alpha = alpha4.reshape(b, t * r, n)
    ae, vm = _cast2(alpha.astype(v_ext.dtype), vf, dtype)
    num = jnp.einsum("bmn,bne->bme", ae, vm,
                     preferred_element_type=jnp.float32,
                     precision=PRECISION).reshape(b, t, r, e)
    # validity/averaging identical to the offset form
    center = jnp.arange(t) + w
    fm_c = fm_ext[:, w:w + t]
    nbr_valid = jnp.stack([fm_ext[:, center + o] for o in _offsets(w)],
                          axis=2) * fm_c[:, :, None]          # [B,T,O]
    num = num * fm_c[:, :, None, None]       # rows of invalid center frames
    den = jnp.maximum(jnp.sum(nbr_valid, axis=-1), 1.0)
    return num / den[:, :, None, None], nbr_valid


def _gather_neighbors(s_ext: jax.Array, T: int, window: int) -> jax.Array:
    """s_ext [.., w+T+w, S] -> neighbor stack [.., T, O, S] for the center T."""
    center = jnp.arange(T) + window
    return jnp.stack([jnp.take(s_ext, center + o, axis=-2)
                      for o in _offsets(window)], axis=-2)


def _offsets(window: int) -> list[int]:
    return [o for o in range(-window, window + 1) if o != 0]


def _cross_sim(we, ve):
    # NOTE (r4, measured dead end — do not retry): a custom-VJP variant
    # whose dw contraction was i-batched (consuming the [I,J,K,T,R]
    # cotangent in its natural layout to avoid the jk-major transpose
    # before the dw_emb matmul) measured 1437.8 vs 1061.6 us/step on the
    # full config-4 step (ab_step_variants.py, within-process) — the
    # custom VJP forces the ~26 MB cotangent to MATERIALIZE as the bwd
    # rule's input, while XLA's own transpose plan keeps the max-backward
    # select fused into it. The ~67 us of dw transposes are cheaper than
    # breaking that fusion; see docs/PERF.md "headroom closed".
    return jnp.einsum("jke,itre->ijktr", we, ve,
                      preferred_element_type=jnp.float32, precision=PRECISION)


# NOTE (r4, second measured dead end on the cross backward — do not
# retry): a one-hot custom VJP for `max_r(mask(cross_sim))` (save only
# argmax r*; backward builds ONE masked-cotangent matrix M[itr, jk] =
# da·1[r==r*]·1[rm>0] feeding dv̂ = M·ŵ and dŵ = Mᵀ·v̂ as MXU dots, so
# the forward could fuse einsum+mask+max+argmax without materializing
# the f32 [I,J,K,T,R] scores) measured 1017.7 → 1583.7 µs/step (+566,
# LOSS) on the full config-4 step. The variant's trace shows why: M's
# [ITR, JK] dot layouts cannot be produced from the [I,J,K,T]-shaped
# r*/da without crossing a 5-D transpose, and Mosaic/XLA materialized
# every step — s32 and bf16 [I,J,K,T,R] broadcasts (4 × 42–67 µs), two
# non-bitcast [12800,256] reshapes per dot operand (50–70 µs each), a
# 91 µs copy ≈ 660 µs of pure layout traffic; the forward max+argmax
# also split from the einsum into 2 × 43 µs iota_reduce fusions. XLA's
# ~28 µs VPU select loop-fusions ARE the fused form of this
# contraction: both custom-VJP attacks on the cross backward
# (i-batched dw above, one-hot M here) lost to layout materialization.


def cross_scores(w_emb: jax.Array, word_mask: jax.Array,
                 v_emb: jax.Array, frame_mask: jax.Array,
                 temp: float, pool: str,
                 ctx_window: int = 0, ctx_temp: float = 0.1,
                 impl: str = "jnp", dtype=None,
                 region_mask: jax.Array | None = None,
                 ctx_impl: str | None = None,
                 u: jax.Array | None = None,
                 frame_logits: jax.Array | None = None) -> jax.Array:
    """Full B×B score matrix S[i,j] = score(video i, sentence j) for ranking.

    The reference scores positives/negatives with per-sample loops (SURVEY.md
    L179-183); here the whole matrix is a handful of einsums on the MXU.
    impl="pallas" routes the similarity+MIL-max through the fused kernel
    (ops/pallas/fused_ground.py), which never materializes [I,J,K,T,R] in HBM.
    ctx_impl overrides the context_mix implementation independently (the
    "auto" kernel mode pairs impl="jnp" with ctx_impl="pallas"); default:
    follow impl. u: precomputed context-mixed embeddings (context_mix on the
    same v_emb/masks) — the train step passes its copy so the kernel runs
    once per step (XLA cannot CSE the two custom-calls itself).
    frame_logits: precomputed sentence-independent per-frame logits [I,T]
    (the `pool="learned"` scorer) — broadcast over sentences j.
    """
    fm = frame_mask[:, None, :]                               # video i frames [I,1,T]
    wm = word_mask[None, :, :]                                # sentence j words [1,J,K]
    g_learned = (frame_logits[:, None, :]                     # [I,1,T] -> bcast J
                 if frame_logits is not None else None)
    ctx_pool = pool == "context" and ctx_window > 0
    if ctx_pool and u is None:
        # context pooling: ŝ factors through the (sentence-independent)
        # context-mixed region embeddings u — one extra cross einsum total
        w_ = ctx_window
        v_ext, fm_ext, rm_ext = extend_for_window(v_emb, frame_mask,
                                                  region_mask, w_)
        if ctx_impl is None:
            ctx_impl = "pallas" if impl == "pallas" else "offset"
        u, _ = context_mix(v_ext, fm_ext, w_, ctx_temp,
                           dtype=dtype, rm_ext=rm_ext, impl=ctx_impl)
    if impl == "pallas":
        from nafae_tpu.ops.pallas.fused_ground import cross_mil
        a = cross_mil(w_emb, v_emb, frame_mask, region_mask,
                      dtype=dtype)                            # [I,J,K,T]
        frame_logits = g_learned
        if ctx_pool:
            ahat = cross_mil(w_emb, u, frame_mask, region_mask, dtype=dtype)
            frame_logits = _masked_word_mean(ahat, wm)
        return video_scores(a, wm, fm, temp, pool, frame_logits=frame_logits)[0]
    we, ve = _cast2(w_emb, v_emb, dtype)
    # NOTE: the [I,J,K,T,R] cross tensor stays f32 even in bf16 mode — a
    # bf16-storage variant (preferred_element_type=bf16, f32 cast after the
    # max) measured 22 us/step SLOWER at config4 shapes: XLA's extra
    # converts around the max backward cost more than the halved HBM bytes.
    s = _cross_sim(we, ve)                                    # [I,J,K,T,R]
    s = mask_regions(s, region_mask)
    a = frame_mil_max(s, fm)                                  # [I,J,K,T]
    frame_logits = g_learned
    if ctx_pool:
        we2, ue = _cast2(w_emb, u, dtype)
        shat = _cross_sim(we2, ue)
        shat = mask_regions(shat, region_mask)
        ahat = frame_mil_max(shat, fm)
        frame_logits = _masked_word_mean(ahat, wm)
    return video_scores(a, wm, fm, temp, pool, frame_logits=frame_logits)[0]


def ground_forward(params: dict, feats: jax.Array, word_ids: jax.Array,
                   frame_mask: jax.Array, word_mask: jax.Array,
                   temp: float = 0.1, pool: str = "attention",
                   ctx_window: int = 0, ctx_temp: float = 0.1,
                   compute_dtype=jnp.float32,
                   region_mask: jax.Array | None = None,
                   feats_scale: jax.Array | None = None) -> dict:
    """Full single-video forward pass (diagonal path; used by eval & losses).

    params: {"word_emb": [V,E], "w_v": [D,E], "b_v": [E]} (+ "attn_w" [E]
    when pool="learned" — docs/MATH.md step 5 [CHOICE]; + "m_sim" [E,E]
    when model.similarity="bilinear" — step 3 [CHOICE]).
    region_mask [B,T,R]: fills invalid region slots with NEG before every
    max (docs/MATH.md mask semantics); None = all regions of valid frames
    valid (the historical default of this entry point).
    Returns dict with v_emb, w_emb, s, a, beta, score, and (if ctx_window>0)
    alpha, nbr_valid, shat, ahat.
    """
    w_emb = embed_words(word_ids, params["word_emb"],
                        m_sim=params.get("m_sim"))
    v_emb = project_params(params, feats, dtype=compute_dtype,
                           feats_scale=feats_scale)
    # honor compute_dtype in the sim einsums too (the train step does the
    # same via similarity_tensor(dtype=cdt)); None/f32 = oracle-parity mode
    cdt = (None if compute_dtype is None
           or jnp.dtype(compute_dtype) == jnp.float32 else compute_dtype)
    s = mask_regions(similarity_tensor(w_emb, v_emb, dtype=cdt), region_mask)
    a = frame_mil_max(s, frame_mask)
    out = {"w_emb": w_emb, "v_emb": v_emb, "s": s, "a": a}
    frame_logits = None
    if ctx_window > 0:
        w_ = ctx_window
        v_ext, fm_ext, rm_ext = extend_for_window(v_emb, frame_mask,
                                                  region_mask, w_)
        # dtype=cdt here too: the train step computes alpha/u at the compute
        # dtype, and this public forward must match it in bf16+context mode
        alpha, nbr_valid = region_affinity_ext(v_ext, fm_ext, w_, ctx_temp,
                                               dtype=cdt, rm_ext=rm_ext)
        u = context_mixed_regions(v_ext, alpha, nbr_valid, dtype=cdt)
        shat = mask_regions(similarity_tensor(w_emb, u, dtype=cdt),
                            region_mask)
        ahat = frame_mil_max(shat, frame_mask)
        out.update(alpha=alpha, nbr_valid=nbr_valid, shat=shat, ahat=ahat, u=u)
        if pool == "context":
            frame_logits = _masked_word_mean(ahat, word_mask)
    if pool == "learned":
        frame_logits = learned_frame_logits(
            v_emb, frame_mask, region_mask, params["attn_w"])
    score, beta = video_scores(a, word_mask, frame_mask, temp, pool,
                               frame_logits=frame_logits)
    out.update(score=score, beta=beta)
    return out
