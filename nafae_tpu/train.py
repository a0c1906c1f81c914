"""Training driver: jitted/shard_map train step, optimizer, k-means refresh.

Replaces the reference's `train.py` epoch loop (SURVEY.md L146, L169-188). The
entire per-batch computation — forward, all three losses, gradient, optimizer
update, and the (periodic) k-means refresh — is ONE XLA program (BASELINE.json
north star), with the data axis sharded over the mesh via shard_map.

CLI: python -m nafae_tpu.train --preset config2 --override train.steps=500 ...
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import optax
from flax import struct

from nafae_tpu.config import Config
from nafae_tpu.models.grounding import init_params
from nafae_tpu.ops import grounding as G
from nafae_tpu.ops import losses as L
from nafae_tpu.ops.kmeans import kmeans_init, kmeans_lloyd
from nafae_tpu.parallel import sharding as S


# routing gate for the fused diag-epilogue kernel (A/B toggle; the kernel
# itself only engages under the pallas/auto-on-TPU kernel modes)
DIAG_KERNEL = True

# r4 tail-attack flags (scripts/ab_step_variants.py), both reduced-precision-
# mode only (cdt is not None) — the f32 oracle-parity path is untouched:
# ASSIGN_MXU (production default, −35.9 us/step within-process): k-means
#   assignment sims as one transposed 2-D MXU dot in the compute dtype
#   (ops/kmeans.kmeans_assign dtype= — replaces a 40.6 us VPU loop fusion).
# ARGMAX_2D (production default, −50.3 us/step within-process): region-
#   selection argmax over the relayouted [R, B·K·T] view of the
#   materialized s (ops/grounding.argmax_regions_2d — bitwise-same
#   selection; replaces a 37.8 us lane-axis loop fusion).
# PROJ_FUSED (production default, −19.9 us/step within-process):
#   projection+normalize as ONE custom-VJP op whose backward runs in the
#   compute dtype with bf16 residuals (the XLA normalize-bwd fusion moves
#   ~40 MB of f32/step — ops/grounding.project_regions_fused).
ASSIGN_MXU = True
ARGMAX_2D = True
PROJ_FUSED = True

# OPT_FLAT — MEASURED DEAD END (default stays off; flag + parity test
# kept): wrap the optimizer in optax.flatten so the global-norm clip and
# adamw update run over ONE raveled [P] vector instead of one fusion chain
# per param leaf — the VERDICT-r3 "attack the near-zero-FLOP tail as a
# tail" experiment. Within-process A/B on the full config-4 step: 995.3 →
# 1005.4 µs/step (−10.1, LOSS) — the flatten wrapper's ravel/unravel
# concats cost more than the per-leaf fusion overhead they remove
# (docs/PERF.md "headroom closed"). Elementwise math is unchanged; the
# global-norm sum order differs (per-leaf partials vs one vector reduce),
# so updates match to f32 reduction tolerance, not bitwise. Read at
# make_optimizer() time — TrainState.create and make_train_step must be
# called AFTER setting it. Mesh-safe: state_partition_spec's opt_state=P()
# is a prefix spec.
OPT_FLAT = False


@struct.dataclass
class TrainState:
    step: jax.Array
    params: dict
    opt_state: object
    centers: jax.Array          # k-means centroids [Kc, E] (unit norm)
    # selection bank (loss.kmeans_source="bank"): step-granular ring of the
    # last W steps' selected region embeddings, refreshed-from instead of
    # the current batch (SURVEY.md L220-225). Sharded exactly like the
    # activations it stores (W, B over data, T over frame, K, E), so
    # maintaining it costs no collectives and the ring layout is identical
    # on one device and on any mesh. None under the "batch" source.
    bank: jax.Array | None = None         # [W, B, T, K, E]
    bank_valid: jax.Array | None = None   # [W, B, T, K]

    @classmethod
    def create(cls, key: jax.Array, cfg: Config) -> "TrainState":
        kp, kc = jax.random.split(key)
        params = init_params(kp, cfg.model)
        tx = make_optimizer(cfg)
        bank = bank_valid = None
        if cfg.loss.kmeans_source == "bank" and cfg.loss.cluster_weight > 0:
            w, b = cfg.loss.bank_steps, cfg.data.batch_size
            # T = the LARGEST batch shape the loader can emit (the biggest
            # bucket, which may be smaller than max_frames); smaller
            # buckets zero-pad their slot in bank_write (valid=0), so all
            # buckets share one statically-shaped ring
            t = (max(cfg.data.frame_buckets) if cfg.data.frame_buckets
                 else cfg.data.max_frames)
            k = cfg.data.max_words
            bank = jnp.zeros((w, b, t, k, cfg.model.embed_dim), jnp.float32)
            bank_valid = jnp.zeros((w, b, t, k), jnp.float32)
        return cls(step=jnp.zeros((), jnp.int32), params=params,
                   opt_state=tx.init(params),
                   centers=kmeans_init(kc, cfg.loss.num_clusters,
                                       cfg.model.embed_dim),
                   bank=bank, bank_valid=bank_valid)


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=cfg.train.lr,
        warmup_steps=cfg.train.warmup_steps,
        decay_steps=max(cfg.train.steps, cfg.train.warmup_steps + 1),
        end_value=cfg.train.lr * 0.01)
    if cfg.train.optimizer == "sgd":
        opt = optax.sgd(sched, momentum=0.9)
    else:
        opt = optax.adamw(sched, weight_decay=cfg.train.weight_decay)
    if cfg.train.grad_clip > 0:        # <=0 disables clipping (clip_by_global_
        opt = optax.chain(              # norm(0.0) would zero every update)
            optax.clip_by_global_norm(cfg.train.grad_clip), opt)
    if OPT_FLAT:
        opt = optax.flatten(opt)       # see the OPT_FLAT note above
    return opt


def compute_losses(params: dict, centers: jax.Array, batch: dict, cfg: Config,
                   row_offset, data_axis: str | None = None,
                   kernels: str = "jnp",
                   frame_axis: str | None = None,
                   extractor=None) -> tuple[jax.Array, dict]:
    """Total loss + aux for one (local) batch shard. Exact under DP and SP:
    every cross-device reduction is a psum of numerators/denominators (frame-
    softmax is an online softmax across frame shards), so the value equals the
    single-device run on the full global batch (tested).

    extractor: optional frozen (apply_fn, params) Faster R-CNN; when given and
    the batch carries raw "frames" [B,T,H,W,3], RoI features are computed
    inline — decode -> detector -> losses in ONE XLA program, no disk
    round-trip (BASELINE config 5; SURVEY.md L205-213)."""
    with G.matmul_precision(cfg.model.matmul_precision):
        return _compute_losses_inner(params, centers, batch, cfg, row_offset,
                                     data_axis, kernels, frame_axis,
                                     extractor)


def _compute_losses_inner(params, centers, batch, cfg, row_offset,
                          data_axis, kernels, frame_axis, extractor):
    # kernel routing (cfg.train.kernels): "jnp" = pure-XLA everywhere;
    # "pallas" = fused cross_mil + fused ctx kernels; "auto" = the measured
    # best mix — XLA's batched einsum+reduce for the cross/MIL path, the
    # frame-banded Pallas kernel for the ctx path (see docs/PERF.md).
    # "auto" is backend-aware: off-TPU the ctx kernel would run in
    # interpret mode (orders of magnitude slower than the identical jnp
    # math), so "auto" means Pallas only when a real TPU is the backend.
    pallas_mil = kernels == "pallas"
    pallas_ctx = kernels == "pallas" or (
        kernels == "auto" and jax.default_backend() == "tpu")
    lc, mc = cfg.loss, cfg.model
    all_axes = tuple(a for a in (data_axis, frame_axis) if a)
    if extractor is not None and "frames" in batch:
        apply_fn, det_params = extractor
        frames = batch["frames"]                       # [B,T,H,W,3]
        b_, t_ = frames.shape[:2]
        det = apply_fn(det_params, frames.reshape((b_ * t_,) + frames.shape[2:]))
        det = jax.lax.stop_gradient(det)               # detector is frozen
        batch = dict(batch)
        batch["feats"] = det["feats"].reshape(b_, t_, *det["feats"].shape[1:])
        batch["boxes"] = det["boxes"].reshape(b_, t_, *det["boxes"].shape[1:])
        if "region_valid" in det:  # NMS slots that survived -> region mask
            batch["region_mask"] = det["region_valid"].reshape(
                b_, t_, *det["region_valid"].shape[1:])
    feats = batch["feats"]
    fm, wm = batch["frame_mask"], batch["word_mask"]
    rm = batch.get("region_mask")                  # [B,T,R] or None (=all valid)
    ctx_on = lc.ctx_weight > 0 or mc.frame_pool == "context"
    ctx_window = lc.ctx_window if ctx_on else 0

    cdt = None if mc.dtype == "float32" else jnp.dtype(mc.dtype)
    w_emb = G.embed_words(batch["word_ids"], params["word_emb"],
                          m_sim=params.get("m_sim"))
    if PROJ_FUSED and cdt is not None:
        # same forward bitwise; the normalize backward runs in the compute
        # dtype with bf16 residuals (ops/grounding.project_regions_fused)
        v_emb = G.project_regions_fused(feats, params["w_v"], params["b_v"],
                                        cdt)
    else:
        v_emb = G.project_regions(feats, params["w_v"], params["b_v"],
                                  dtype=jnp.dtype(mc.dtype))
        if cdt is not None:
            # store v̂ in the compute dtype: every consumer (similarity, ctx
            # kernel, select one-hot, cross einsum) casts to it anyway, and
            # the f32 [B,T,R,E] copy is pure HBM traffic — measured -61
            # us/step at config4 shapes. The normalize itself stays f32
            # inside project_regions; f32 mode (oracle parity) is unchanged.
            v_emb = v_emb.astype(cdt)
    s = G.mask_regions(G.similarity_tensor(w_emb, v_emb, dtype=cdt), rm)

    # --- context mixing (shared by context pooling and the ctx loss: the
    # fused kernel is a custom-call XLA cannot CSE, so run it ONCE here) ------
    u = nbr_valid = None
    if ctx_on:
        w_ = lc.ctx_window
        v_ext, fm_ext, rm_ext = G.extend_for_window(v_emb, fm, rm, w_,
                                                    frame_axis=frame_axis)
        u, nbr_valid = G.context_mix(v_ext, fm_ext, w_, lc.ctx_temp,
                                     dtype=cdt, rm_ext=rm_ext,
                                     impl="pallas" if pallas_ctx
                                     else "offset",
                                     scoped_vmem_kib=cfg.train
                                     .scoped_vmem_kib)

    # --- ranking over the global batch (row-shard decomposition) -------------
    g_learned = None
    if mc.frame_pool == "learned":
        g_learned = G.learned_frame_logits(v_emb, fm, rm,
                                           params["attn_w"])
    if data_axis is not None:
        gw, gwm = S.gather_words(w_emb, wm, data_axis)
    else:
        gw, gwm = w_emb, wm
    if frame_axis is not None:
        from nafae_tpu.parallel import sp
        rows = sp.sp_cross_scores(gw, gwm, v_emb, fm, mc.frame_attn_temp,
                                  mc.frame_pool, frame_axis, ctx_window,
                                  lc.ctx_temp, dtype=cdt, region_mask=rm,
                                  ctx_impl="pallas" if pallas_ctx
                                  else "offset", u=u,
                                  frame_logits=g_learned)
    else:
        rows = G.cross_scores(gw, gwm, v_emb, fm, mc.frame_attn_temp,
                              mc.frame_pool, ctx_window, lc.ctx_temp,
                              impl="pallas" if pallas_mil else "jnp", dtype=cdt,
                              region_mask=rm, ctx_impl="pallas" if pallas_ctx
                              else "offset", u=u, frame_logits=g_learned)
    b_loc, b_glob = rows.shape
    gidx = row_offset + jnp.arange(b_loc)
    diag_local = jnp.sum(rows * (jnp.arange(b_glob)[None, :] == gidx[:, None]),
                         axis=1)
    diag_global = (S.gather_diag(diag_local, data_axis)
                   if data_axis is not None else diag_local)
    l_rank = S.ranking_loss_rows(rows, diag_global, row_offset, lc.margin,
                                 data_axis, norm=lc.rank_norm)
    total = l_rank
    score_pos = _global_mean(jnp.sum(diag_local),
                             jnp.asarray(diag_local.shape[0], jnp.float32),
                             data_axis)
    aux = {"l_rank": l_rank, "score_pos": score_pos}

    # --- diag epilogue: ctx loss + top-region select + cluster ---------------
    # fused kernel route (ops/pallas/fused_diag.py): one VMEM pass per video
    # instead of the materialized s/ŝ tensors + XLA's backward remat of the
    # fused argmax. Exact same math (tested, values and grads) but measured
    # SLOWER than XLA's fusions at config4 shapes (1423 vs 1072 us/step —
    # the per-frame argmax/cluster loop is 40 tiny ops XLA batches better),
    # so it rides only the experimental kernels="pallas" mode; "auto" keeps
    # the jnp path below.
    diag_out = None
    # the fused diag kernel hard-codes the stopgrad ctx target; other
    # ctx_target modes take the jnp path below
    if (DIAG_KERNEL and pallas_mil and ctx_on and lc.ctx_target == "stopgrad"
            and lc.ctx_weight > 0 and lc.cluster_weight > 0):
        from nafae_tpu.ops.pallas.fused_diag import diag_epilogue_pallas
        has_ctx = (jnp.sum(nbr_valid, axis=-1) > 0).astype(fm.dtype)
        diag_out = diag_epilogue_pallas(w_emb, v_emb, u, centers, fm, rm,
                                        has_ctx, dtype=cdt)
    if diag_out is not None:
        # NOTE: this block re-derives the ctx/cluster num/den mask algebra
        # from the kernel's per-(k,t) partial sums — it cannot call
        # context_loss_terms/cluster_loss_terms (those consume the dense
        # [B,K,T,R] tensors the kernel exists to avoid materializing).
        # Equality with the canonical forms is pinned by
        # test_sp.py::test_mesh_train_step_with_pallas_kernels and
        # test_pallas.py::test_diag_epilogue_matches_jnp_values_and_grads;
        # any change to the denominators in ops/losses.py must update this
        # block (the tests will fail loudly if forgotten).
        ctx_kt, clu_kt, f_tk = diag_out                # f_tk [B,T,K,E]
        m3 = wm[:, :, None] * fm[:, None, :] * has_ctx[:, None, :]
        rsum = (jnp.sum(rm, axis=-1) if rm is not None
                else jnp.full(fm.shape, float(feats.shape[2])))
        l_ctx = _global_mean(jnp.sum(wm[:, :, None] * ctx_kt),
                             jnp.sum(m3 * rsum[:, None, :]), all_axes)
        total = total + lc.ctx_weight * l_ctx
        aux["l_ctx"] = l_ctx
        any_region = ((jnp.max(rm, axis=-1) > 0).astype(wm.dtype)
                      if rm is not None else jnp.ones_like(fm))
        valid_tk = (fm * any_region)[:, :, None] * wm[:, None, :]  # [B,T,K]
        aux["sel_feats"] = f_tk                        # already stop-grad
        aux["sel_valid"] = valid_tk
        l_clu = _global_mean(
            jnp.sum(clu_kt * valid_tk.transpose(0, 2, 1)),
            jnp.sum(valid_tk), all_axes)
        total = total + lc.cluster_weight * l_clu
        aux["l_clu"] = l_clu
        aux["loss"] = total
        return total, aux

    # --- contextual similarity loss (u computed above) -----------------------
    if ctx_on:
        shat = G.mask_regions(G.similarity_tensor(w_emb, u, dtype=cdt), rm)
        if lc.ctx_weight > 0:
            l_ctx = _global_mean(
                *L.context_loss_terms(s, shat, wm, fm, nbr_valid, rm,
                                      target=lc.ctx_target),
                all_axes)
            total = total + lc.ctx_weight * l_ctx
            aux["l_ctx"] = l_ctx

    # --- visual clustering loss ----------------------------------------------
    r_star = (G.argmax_regions_2d(s)
              if ARGMAX_2D and cdt is not None else None)
    f, valid = L.select_top_regions(s, v_emb, wm, fm, region_mask=rm,
                                    r_star=r_star)
    # aux carries the canonical [B,T,K,...] layout (same as the fused diag
    # route) so the bank path can all_gather the frame axis at dim 1
    aux["sel_feats"] = jax.lax.stop_gradient(f).transpose(0, 2, 1, 3)
    aux["sel_valid"] = valid.transpose(0, 2, 1)
    if lc.cluster_weight > 0:
        num, den, _ = L.cluster_loss_terms(
            f, valid, centers,
            assign_dtype=cdt if ASSIGN_MXU else None)
        l_clu = _global_mean(num, den, all_axes)
        total = total + lc.cluster_weight * l_clu
        aux["l_clu"] = l_clu

    aux["loss"] = total
    return total, aux



def _global_mean(num, den, axes):
    """axes: None, a name, or a tuple of names (empty tuple = no reduction)."""
    if axes:
        num = jax.lax.psum(num, axes)
        den = jax.lax.psum(den, axes)
    return num / jnp.maximum(den, 1.0)


def make_train_step(cfg: Config, tx: optax.GradientTransformation,
                    data_axis: str | None = None,
                    frame_axis: str | None = None,
                    extractor=None):
    """Build the per-device train step. With axis names, call under shard_map."""
    all_axes = tuple(a for a in (data_axis, frame_axis) if a)

    def step_fn(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        if data_axis is not None:
            # word_ids exists in both the features and the raw-frames layouts
            row_offset = (jax.lax.axis_index(data_axis)
                          * batch["word_ids"].shape[0])
        else:
            row_offset = 0
        kernels = cfg.train.resolved_kernels()
        grad_fn = jax.value_and_grad(compute_losses, has_aux=True)
        (_, aux), grads = grad_fn(state.params, state.centers, batch, cfg,
                                  row_offset, data_axis, kernels,
                                  frame_axis, extractor)
        # NOTE: no explicit psum of grads — shard_map transposes replicated
        # (P()) inputs with a built-in psum, so the per-device grads are
        # already the exact global gradient (verified == single-device run).
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        centers = state.centers
        bank, bank_valid = state.bank, state.bank_valid
        if cfg.loss.cluster_weight > 0:
            sel_f = aux.pop("sel_feats")               # [B,T,K,E] local shard
            sel_v = aux.pop("sel_valid")               # [B,T,K]
            if cfg.loss.kmeans_source == "bank" and bank is not None:
                from nafae_tpu.ops.kmeans import bank_write
                bank, bank_valid = bank_write(bank, bank_valid, state.step,
                                              sel_f, sel_v)
                f = bank.reshape(-1, cfg.model.embed_dim)
                valid = bank_valid.reshape(-1)
            else:
                f = sel_f.reshape(-1, cfg.model.embed_dim)
                valid = sel_v.reshape(-1)
            if cfg.loss.kmeans_init == "plusplus":
                # k-means++ seeding from the first step's selections,
                # before the first Lloyd refresh. The mesh form gathers
                # the UNFLATTENED layout back to the global row order so
                # the seeding is bitwise-identical to the single-device
                # run (ops/kmeans.kmeans_plusplus_init).
                from nafae_tpu.ops.kmeans import kmeans_plusplus_init
                if cfg.loss.kmeans_source == "bank" and bank is not None:
                    f_nd, v_nd, bdim, tdim = bank, bank_valid, 1, 2
                else:
                    f_nd, v_nd, bdim, tdim = sel_f, sel_v, 0, 1
                names, dims = [], []
                if data_axis:
                    names.append(data_axis), dims.append(bdim)
                if frame_axis:
                    names.append(frame_axis), dims.append(tdim)
                seed_key = jax.random.PRNGKey(cfg.train.seed)
                centers = jax.lax.cond(
                    state.step == 0,
                    lambda c: kmeans_plusplus_init(
                        seed_key, f_nd, v_nd, cfg.loss.num_clusters,
                        tuple(names), tuple(dims)),
                    lambda c: c, centers)
            # lax.cond so the Lloyd iterations only run on refresh steps
            # (~2 ms/step saved). The predicate is the replicated step
            # counter, so under shard_map every device takes the same branch
            # and the psums inside kmeans_lloyd stay collective-safe.
            do = (state.step % cfg.loss.kmeans_interval) == 0
            adt = (jnp.dtype(cfg.model.dtype)
                   if ASSIGN_MXU and cfg.model.dtype != "float32" else None)
            centers = jax.lax.cond(
                do,
                lambda c: kmeans_lloyd(f, valid, c, cfg.loss.kmeans_iters,
                                       cfg.loss.kmeans_ema,
                                       all_axes if all_axes else None,
                                       assign_dtype=adt),
                lambda c: c,
                centers)
        else:
            aux.pop("sel_feats"), aux.pop("sel_valid")

        metrics = {k: v for k, v in aux.items()}
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(step=state.step + 1, params=params,
                               opt_state=opt_state, centers=centers,
                               bank=bank, bank_valid=bank_valid)
        return new_state, metrics

    return step_fn


def state_partition_spec(cfg: Config, data_axis: str, frame_spec):
    """shard_map spec (prefix pytree) for TrainState.

    Everything is replicated except the selection bank, which shards
    exactly like the activations it stores: [W, B(data), T(frame), K, E].
    """
    from jax.sharding import PartitionSpec as P
    if not (cfg.loss.kmeans_source == "bank"
            and cfg.loss.cluster_weight > 0):
        return P()
    bspec = P(None, data_axis, frame_spec)
    return TrainState(step=P(), params=P(), opt_state=P(), centers=P(),
                      bank=bspec, bank_valid=bspec)


def make_multi_step(step_fn, steps_per_call: int):
    """Scan `step_fn` over batches stacked on a leading [S, ...] axis.

    One XLA execution runs S optimizer steps — essential on dispatch-latency-
    bound hosts (the tunneled single-chip backend here costs 3-12 ms per
    execute) and a throughput win everywhere. Returns (state, metrics of the
    LAST step).
    """

    def multi(state, batches):
        def body(st, batch):
            st, metrics = step_fn(st, batch)
            return st, metrics
        state, ms = jax.lax.scan(body, state, batches, length=steps_per_call)
        return state, jax.tree.map(lambda x: x[-1], ms)

    return multi


def stack_batches(batches: list) -> dict:
    import numpy as np
    return {k: np.stack([b[k] for b in batches]) for k in batches[0]}


def jit_compiler_options(cfg: Config) -> dict | None:
    """compiler_options for the outer jit of this config's programs.

    train.scoped_vmem_kib > 0 raises the TPU compiler's scoped-VMEM stack
    limit so the fused-ctx kernel's full-T backward blocks fit at longer
    clips (docs/PERF.md "long-clip sweep"; the kernel gate in
    ops/pallas/fused_ctx.py extends to the measured envelope in lockstep).
    TPU-only: other backends reject the unknown flag."""
    if cfg.train.scoped_vmem_kib and jax.default_backend() == "tpu":
        return {"xla_tpu_scoped_vmem_limit_kib":
                str(cfg.train.scoped_vmem_kib)}
    return None


def build_train_fn(cfg: Config, mesh=None, extractor=None, with_frames=False):
    """jit(shard_map(step)) over the mesh (data [+ frame] axes), or plain jit.

    extractor: frozen (apply_fn, params) detector for the inline config-5
    path; batches must then carry "frames" instead of "feats"/"boxes".
    """
    tx = make_optimizer(cfg)
    spc = cfg.train.steps_per_call
    copts = jit_compiler_options(cfg)
    if mesh is None:
        step = make_train_step(cfg, tx, extractor=extractor)
        if spc > 1:
            step = make_multi_step(step, spc)
        return jax.jit(step, donate_argnums=(0,) if cfg.train.donate else (),
                       compiler_options=copts)
    from jax.sharding import PartitionSpec as P
    axis = cfg.mesh.data_axis_name
    faxis = cfg.mesh.frame_axis_name
    sp_on = mesh.shape.get(faxis, 1) > 1
    step = make_train_step(cfg, tx, data_axis=axis,
                           frame_axis=faxis if sp_on else None,
                           extractor=extractor)
    if spc > 1:
        step = make_multi_step(step, spc)
    from nafae_tpu.parallel.multihost import global_batch_spec
    batch_spec = global_batch_spec(cfg, mesh, with_frames=with_frames,
                                   leading_scan_axis=spc > 1)
    # NOTE: default check_vma must stay ON — with it OFF the transpose of
    # the in-loss psums reverts to old-style psum-of-cotangents and the
    # gradients stop matching the single-device run (measured: grad_norm
    # off by ~2.6x on an 8-device mesh). Pallas kernels cooperate with the
    # vma system via their wrappers (vma-annotated out_shapes on TPU; jnp
    # fallback in interpret mode, where the kernel-body jaxpr eval cannot
    # mix vma-carrying blocks with literals).
    sspec = state_partition_spec(cfg, axis, faxis if sp_on else None)
    sharded = jax.shard_map(
        step, mesh=mesh,
        in_specs=(sspec, batch_spec),
        out_specs=(sspec, P()),
    )
    fn = jax.jit(sharded, donate_argnums=(0,) if cfg.train.donate else (),
                 compiler_options=copts)
    if jax.process_count() > 1:
        # multi-host: every host's loader yields the identically-seeded
        # GLOBAL batch; each host slices its process_shard rows and the
        # global jax.Arrays are assembled shard-in-place on its own chips
        # (parallel/multihost.py). State is lifted to the global mesh on
        # the first call (replicated put; jit reshards any mesh-sharded
        # leaves like the k-means bank), and stays global thereafter.
        import numpy as np
        from jax.sharding import NamedSharding

        from nafae_tpu.parallel import multihost as MH
        b_shard = MH.batch_sharding(mesh, batch_spec)
        rep = NamedSharding(mesh, P())
        row_axis = 1 if spc > 1 else 0

        def fn_mh(state, batch):
            rows = list(MH.process_shard(
                int(batch["word_ids"].shape[row_axis])))
            local = {k: np.take(np.asarray(v), rows, axis=row_axis)
                     for k, v in batch.items()}
            gbatch = MH.host_local_to_global(local, b_shard)
            leaf = jax.tree.leaves(state)[0]
            if not (isinstance(leaf, jax.Array)
                    and not leaf.is_fully_addressable):
                state = jax.device_put(state, rep)
            return fn(state, gbatch)

        return fn_mh
    return fn


# ---------------------------------------------------------------------------
# Fit loop + CLI
# ---------------------------------------------------------------------------

def fit_device_cached(cfg: Config, state, loader, ckpt, logger,
                      log_fn=None, eval_fn=None, mesh=None):
    """Training loop with the dataset resident in HBM (train.device_cache).

    The whole (padded) dataset uploads once; each call gathers its batches by
    index on device and scans steps_per_call optimizer steps — zero per-step
    host->device feature traffic. Requires a single frame bucket and the
    dataset fitting device memory (e.g. YouCook2 features in f16 ~8 GB).

    With a mesh: the segment axis is replicated across the data axis and the
    frame axis is sharded across the frame (SP) axis (so an sp-way mesh also
    divides the cache's per-chip footprint by sp); the per-step index batch
    is sharded over the data axis and each device gathers only its own rows
    locally — the step math is the same exact DP/SP decomposition as the
    streaming path (build_train_fn).
    """
    import numpy as np

    ds = loader.dataset
    n = len(ds)
    # boxes are eval-only (the train step never reads them) — keep them out
    # of the cache, they would pin N*T*R*4 floats of HBM for nothing.
    # One pass over the dataset (each ds[i] is an npz load + pad).
    samples = [ds[i] for i in range(n)]
    data = {k: np.stack([s[k] for s in samples])
            for k in samples[0] if k != "boxes"}
    del samples
    tx = make_optimizer(cfg)
    spc = max(1, cfg.train.steps_per_call)
    donate = (0,) if cfg.train.donate else ()   # donate the OLD TrainState

    # data must be a runtime ARGUMENT: closing over it would embed ~GBs of
    # constants in the jaxpr (the remote compile service rejects the payload)
    if mesh is None:
        step = make_train_step(cfg, tx)
        data = {k: jnp.asarray(v) for k, v in data.items()}

        @functools.partial(jax.jit, donate_argnums=donate)
        def multi(state, idxs, data):                        # idxs [spc, B]
            def body(st, idx):
                batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
                return step(st, batch)
            state, ms = jax.lax.scan(body, state, idxs)
            return state, jax.tree.map(lambda x: x[-1], ms)
    else:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        axis = cfg.mesh.data_axis_name
        faxis = cfg.mesh.frame_axis_name
        sp_on = mesh.shape.get(faxis, 1) > 1
        fspec = faxis if sp_on else None
        stepm = make_train_step(cfg, tx, data_axis=axis,
                                frame_axis=faxis if sp_on else None)
        # cache specs: segment axis replicated, frame axis SP-sharded.
        # Upload ONCE with the target sharding — without this the cache
        # lives whole on device 0 and every call re-shards GBs.
        data_spec = {k: P() for k in data}
        for k in ("feats", "region_mask", "frame_mask"):
            if k in data_spec:
                data_spec[k] = P(None, fspec)
        data = {k: jax.device_put(v, NamedSharding(mesh, data_spec[k]))
                for k, v in data.items()}

        def multi_core(state, idxs, data):   # idxs local rows of [spc, B]
            def body(st, idx):
                batch = jax.tree.map(lambda a: jnp.take(a, idx, axis=0), data)
                return stepm(st, batch)
            state, ms = jax.lax.scan(body, state, idxs)
            return state, jax.tree.map(lambda x: x[-1], ms)

        sspec = state_partition_spec(cfg, axis, fspec)
        multi = jax.jit(jax.shard_map(
            multi_core, mesh=mesh,
            in_specs=(sspec, P(None, axis), data_spec),
            out_specs=(sspec, P())), donate_argnums=donate)

    start_step = int(state.step)
    total = cfg.train.steps - start_step
    bsz = cfg.data.batch_size
    rng = np.random.RandomState(cfg.train.seed)
    # frames per applied batch from the cached tensors themselves — the
    # single bucket may be smaller than data.max_frames, and an inflated
    # constant would corrupt the frames/sec the benchmark flow records
    frames_per_batch = bsz * int(data["frame_mask"].shape[1])
    # resume: fast-forward the index stream past the already-consumed
    # positions so a restarted run continues the exact same sequence
    order: list = []
    consumed = start_step * bsz
    while consumed > 0:
        ep = np.arange(n)
        rng.shuffle(ep)
        if consumed >= n:
            consumed -= n
        else:
            order = ep[consumed:].tolist()
            consumed = 0
    done = 0
    done_logged = 0
    t0 = t_start = time.perf_counter()
    metrics = {}
    while done < total:
        # the last call shrinks to the remaining step count (scan length =
        # idxs.shape[0], so a short tail just compiles one extra program)
        # instead of overshooting cfg.train.steps by up to spc-1 steps
        take = min(spc, total - done)
        while len(order) < take * bsz:
            ep = np.arange(n)
            rng.shuffle(ep)
            order.extend(ep.tolist())
        idxs = np.asarray(order[:take * bsz], np.int32).reshape(take, bsz)
        order = order[take * bsz:]
        state, metrics = multi(state, idxs, data)
        done += take
        gstep = start_step + done
        due = lambda every: every > 0 and gstep % max(every, spc) < spc
        if due(cfg.train.log_every):
            m = {k: float(v) for k, v in metrics.items()}
            now = time.perf_counter()
            # windowed rate (since last log) — the cumulative average is
            # dragged down by compile + cache upload for the whole run
            m["frames_per_sec"] = (frames_per_batch * (done - done_logged)
                                   / max(now - t0, 1e-9))
            m["frames_per_sec_avg"] = (frames_per_batch * done
                                       / max(now - t_start, 1e-9))
            t0, done_logged = now, done
            m["step"] = gstep
            logger.log(m)
            if log_fn:
                log_fn(m)
        if eval_fn and due(cfg.train.eval_every):
            eval_fn(state)
        if due(cfg.train.ckpt_every):
            ckpt.save(state)
    ckpt.save(state, wait=True)
    return state, metrics


def fit(cfg: Config, mesh=None, log_fn=None, eval_fn=None):
    """Run cfg.train.steps steps; returns the final state and last metrics."""
    from nafae_tpu.data import SegmentDataset
    from nafae_tpu.utils.checkpoint import CheckpointManager
    from nafae_tpu.utils.metrics_log import MetricsLogger

    extractor = None
    if cfg.data.from_videos:
        # config-5 inline: decode in loader workers, frozen detector inside
        # the train step — features never touch the host (SURVEY.md L205-214)
        from nafae_tpu.data.video_dataset import VideoSegmentDataset
        from nafae_tpu.models.detector.faster_rcnn import init_detector
        if not cfg.data.annotations:
            raise ValueError("data.from_videos needs data.annotations "
                             "(segments.jsonl)")
        from nafae_tpu.data.vocab import vocab_from_config
        ds = VideoSegmentDataset(cfg.data.annotations, cfg.data.max_frames,
                                 cfg.detector.image_size, cfg.data.max_words,
                                 frame_rate=cfg.detector.frame_rate,
                                 vocab=vocab_from_config(cfg.data))
        det_model, det_params = init_detector(
            jax.random.PRNGKey(cfg.train.seed), cfg.detector)
        if cfg.detector.weights:
            from nafae_tpu.utils.torch_convert import load_detector_weights
            det_params = load_detector_weights(
                cfg.detector.weights, det_params,
                num_scales=len(cfg.detector.anchor_scales),
                num_ratios=len(cfg.detector.anchor_ratios))
            if cfg.detector.fold_bn:
                from nafae_tpu.models.detector.resnet import fold_frozen_bn
                det_params = fold_frozen_bn(det_params)
        extractor = (det_model.apply, det_params)
    else:
        ds = SegmentDataset(cfg.data.root, cfg.data.split, cfg.data.max_frames,
                            cfg.data.num_regions, cfg.data.feat_dim,
                            cfg.data.max_words,
                            frame_buckets=tuple(cfg.data.frame_buckets),
                            transfer_dtype=cfg.data.transfer_dtype)
    state = TrainState.create(jax.random.PRNGKey(cfg.train.seed), cfg)
    if cfg.model.word_vectors:
        from nafae_tpu.data.vocab import vocab_from_config
        from nafae_tpu.models.grounding import load_word_vectors
        vocab = vocab_from_config(cfg.data)
        if len(vocab) != cfg.model.vocab_size:
            # a silent mismatch would either crash in the optimizer (the
            # opt_state was sized at vocab_size) or, worse, assign every
            # word id the wrong vector
            raise ValueError(
                f"model.word_vectors: the vocab has {len(vocab)} classes "
                f"but model.vocab_size={cfg.model.vocab_size}; point "
                "data.classes_file at the class list the features were "
                "extracted with (and keep vocab_size in sync)")
        vecs, hits = load_word_vectors(cfg.model.word_vectors, vocab,
                                       cfg.model.embed_dim)
        state = state.replace(params={**state.params,
                                      "word_emb": jnp.asarray(vecs)})
    ckpt = CheckpointManager(cfg.train.ckpt_dir, keep=cfg.train.keep_ckpts)
    restored = ckpt.restore_latest(state)
    if restored is not None:
        state = restored
    logger = MetricsLogger(cfg.train.ckpt_dir,
                           tensorboard_dir=cfg.train.tensorboard_dir)
    if cfg.train.device_cache:
        if cfg.data.from_videos:
            raise ValueError("device_cache caches features, not raw frames; "
                             "extract first or disable one of the two")
        if len(ds.frame_buckets) > 1:
            raise ValueError("device_cache requires a single frame bucket")
        loader_like = type("L", (), {"dataset": ds})()
        return fit_device_cached(cfg, state, loader_like, ckpt, logger,
                                 log_fn=log_fn, eval_fn=eval_fn, mesh=mesh)
    # built AFTER the device_cache early-return: the cached path never
    # consumes the streaming loader (a NativePacker pipeline would open and
    # mmap the dataset for nothing)
    from nafae_tpu.data.grain_loader import make_loader
    loader = make_loader(cfg.data, ds, seed=cfg.train.seed,
                         pipeline=cfg.data.pipeline)
    train_fn = build_train_fn(cfg, mesh, extractor=extractor,
                              with_frames=cfg.data.from_videos)

    start_step = int(state.step)
    t0 = time.perf_counter()
    metrics = {}
    spc = cfg.train.steps_per_call
    pending: dict = {}
    # resume the dataloader at its exact deterministic position (epoch +
    # offset derived from the checkpointed step; SURVEY.md §6 checkpoint row).
    # Exact only when batches apply in yield order: spc==1 (immediate apply)
    # or a single bucket (groups of spc flush in order, and checkpoints land
    # on flush boundaries where applied == yielded). With multiple buckets
    # AND spc>1 the per-bucket grouping reorders application, so resume
    # restarts at the epoch boundary instead (never skips unapplied batches).
    eb = loader.batches_per_epoch()
    multi_bucket = len(getattr(loader.dataset, "frame_buckets", ()) or ()) > 1
    exact = spc == 1 or not multi_bucket
    start_epoch = start_step // eb if eb else 0
    skip = (start_step % eb if eb else 0) if exact else 0
    target = cfg.train.steps
    applied = start_step                     # optimizer steps applied so far
    frames_applied = 0   # actual frames in applied batches (bucket-accurate)
    frames_logged = 0
    last_fired = dict.fromkeys(("log", "ckpt", "eval"), start_step)

    def due(kind, every):
        # delta cadence: fires once per `every` applied steps regardless of
        # application stride — the main loop strides spc, the TAIL loop
        # strides 1, where the old `applied % max(every, spc) < spc` window
        # test fired up to spc consecutive times (duplicate evals + ckpt
        # churn at the end of a run)
        return every > 0 and applied - last_fired[kind] >= every

    def emit(state, metrics):
        nonlocal t0, frames_logged
        if due("log", cfg.train.log_every):
            last_fired["log"] = applied
            m = {k: float(v) for k, v in metrics.items()}
            dt = max(time.perf_counter() - t0, 1e-9)
            m["frames_per_sec"] = (frames_applied - frames_logged) / dt
            m["step"] = applied
            logger.log(m)
            if log_fn:
                log_fn(m)
            t0 = time.perf_counter()
            frames_logged = frames_applied
        if due("ckpt", cfg.train.ckpt_every):
            last_fired["ckpt"] = applied
            ckpt.save(state)
        if eval_fn and due("eval", cfg.train.eval_every):
            last_fired["eval"] = applied
            eval_fn(state)

    # yield budget: generous enough to cover per-bucket remainder drops; the
    # loop exits on `applied >= target`, never on the budget in normal runs
    budget = (target - applied) * 2 + spc * 16
    for _, batch in loader.steps(budget, start_epoch=start_epoch, skip=skip):
        if applied >= target:
            break   # e.g. re-running an already-completed checkpoint dir
        if spc > 1:
            # group by frame-bucket shape so every stacked scan is homogeneous
            # (frame_mask exists in both the features and raw-frames layouts)
            key = batch["frame_mask"].shape[1]
            pending.setdefault(key, []).append(batch)
            if target - applied < spc:
                # fewer steps left than one scan: stop collecting once the
                # tail has enough batches (applied one-by-one below — a full
                # flush here would overshoot cfg.train.steps)
                if sum(len(g) for g in pending.values()) >= target - applied:
                    break
                continue
            if len(pending[key]) < spc:
                continue
            grp = pending.pop(key)
            state, metrics = train_fn(state, stack_batches(grp))
            applied += spc
            frames_applied += sum(int(b["frame_mask"].shape[0])
                                  * int(b["frame_mask"].shape[1])
                                  for b in grp)
        else:
            state, metrics = train_fn(state, batch)
            applied += 1
            frames_applied += (int(batch["frame_mask"].shape[0])
                               * int(batch["frame_mask"].shape[1]))
        emit(state, metrics)
        if applied >= target:
            break
    if applied < target and any(pending.values()):
        # tail: (target - applied) < spc remaining, or a tiny dataset never
        # filled a group — apply the pending yielded batches one-by-one via
        # a second spc=1 program (compiles once) so every run/resume reaches
        # exactly cfg.train.steps instead of spinning at a partial group
        import copy
        cfg1 = copy.deepcopy(cfg)
        cfg1.train.steps_per_call = 1
        tail_fn = build_train_fn(cfg1, mesh, extractor=extractor,
                                 with_frames=cfg.data.from_videos)
        leftovers = [b for grp in pending.values() for b in grp]
        for batch in leftovers:
            if applied >= target:
                break
            state, metrics = tail_fn(state, batch)
            applied += 1
            frames_applied += (int(batch["frame_mask"].shape[0])
                               * int(batch["frame_mask"].shape[1]))
            emit(state, metrics)
    ckpt.save(state, wait=True)  # block: async save must not outlive the process
    return state, metrics


def main(argv=None):
    import argparse

    from nafae_tpu.config import load_config
    from nafae_tpu.parallel import make_mesh

    p = argparse.ArgumentParser("nafae_tpu.train")
    p.add_argument("--preset", default="config2")
    p.add_argument("--config", default=None, help="JSON config file")
    p.add_argument("--override", nargs="*", action="extend",
                   default=None)   # repeated flags ACCUMULATE: the
                                   # config scripts pass their own
                                   # --override before the user's

    p.add_argument("--mesh", action="store_true",
                   help="shard over all local devices (DP)")
    p.add_argument("--multihost", action="store_true",
                   help="multi-process SPMD: jax.distributed.initialize "
                        "(autodetected on TPU pods, or JAX_COORDINATOR_"
                        "ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID), then "
                        "mesh over ALL processes' devices; implies --mesh. "
                        "data.batch_size stays the GLOBAL batch")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (debug config, SURVEY.md L275)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the whole run into "
                        "DIR (TensorBoard/Perfetto readable; SURVEY.md L274)")
    args = p.parse_args(argv)
    from nafae_tpu.utils import cli_startup
    cli_startup()
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    cfg = load_config(args.config, args.preset, args.override or [])
    if args.multihost:
        from nafae_tpu.parallel.multihost import init_multihost
        init_multihost()
    mesh = make_mesh(cfg.mesh.data_axis, cfg.mesh.frame_axis,
                     cfg.mesh.data_axis_name,
                     cfg.mesh.frame_axis_name) \
        if (args.mesh or args.multihost) else None

    def log_fn(m):
        print(" ".join(f"{k}={v:.4g}" if isinstance(v, float) else f"{k}={v}"
                       for k, v in sorted(m.items())), flush=True)

    def eval_fn(state):
        import os
        if not os.path.exists(os.path.join(cfg.data.root, "val",
                                           "index.jsonl")):
            return
        from nafae_tpu.evaluate import evaluate_config
        r = evaluate_config(cfg, params=state.params)
        r.pop("per_class_acc", None)
        r["step"] = int(state.step)
        print("eval " + " ".join(f"{k}={v}" for k, v in sorted(r.items())),
              flush=True)

    if args.profile:
        from nafae_tpu.utils.profiling import trace
        with trace(args.profile):
            fit(cfg, mesh, log_fn=log_fn, eval_fn=eval_fn)
        print(f"profile trace written to {args.profile}", flush=True)
    else:
        fit(cfg, mesh, log_fn=log_fn, eval_fn=eval_fn)


if __name__ == "__main__":
    main()
