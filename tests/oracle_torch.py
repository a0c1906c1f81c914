"""Torch-cpu oracle: independent re-implementation of docs/MATH.md.

Written in deliberately naive per-sample/per-frame loop style — the way the
reference PyTorch code computes these quantities (SURVEY.md L179-183) — so that
agreement with the vectorized JAX ops is a genuine cross-check of the math, not
of shared code. Used ONLY by tests (SURVEY.md §5 item 1: torch-cpu oracle).
"""

from __future__ import annotations

import torch

NEG = -1e9


def normalize(x, dim=-1, eps=1e-8):
    return x / torch.sqrt((x * x).sum(dim=dim, keepdim=True) + eps)


def forward(params, feats, word_ids, frame_mask, word_mask,
            temp=0.1, pool="attention", ctx_window=0, ctx_temp=0.1,
            region_mask=None):
    """Naive loop implementation. All inputs torch tensors (float64 ok).

    region_mask [B,T,R] (docs/MATH.md region-mask semantics): invalid
    region slots are filled with NEG before any max/argmax, and excluded
    from the context affinity softmax."""
    emb, w_v, b_v = params["word_emb"], params["w_v"], params["b_v"]
    B, T, R, D = feats.shape
    K = word_ids.shape[1]
    w_emb = normalize(emb[word_ids.long()])                  # [B,K,E]
    v = feats @ w_v + b_v
    v_emb = normalize(v)                                     # [B,T,R,E]

    s = torch.zeros(B, K, T, R, dtype=feats.dtype)
    for b in range(B):
        for k in range(K):
            # bilinear similarity (docs/MATH.md step 3 [CHOICE],
            # model.similarity="bilinear"): s = ŵᵀ·M·v̂
            wk = (w_emb[b, k] @ params["m_sim"] if "m_sim" in params
                  else w_emb[b, k])
            for t in range(T):
                for r in range(R):
                    if region_mask is not None and region_mask[b, t, r] <= 0:
                        s[b, k, t, r] = NEG
                    else:
                        s[b, k, t, r] = (wk * v_emb[b, t, r]).sum()

    a = torch.zeros(B, K, T, dtype=feats.dtype)
    for b in range(B):
        for k in range(K):
            for t in range(T):
                a[b, k, t] = s[b, k, t].max() if frame_mask[b, t] > 0 else 0.0

    out = {"w_emb": w_emb, "v_emb": v_emb, "s": s, "a": a}
    if ctx_window > 0:
        shat, nbr_valid = context_similarity(s, v_emb, frame_mask,
                                             ctx_window, ctx_temp,
                                             region_mask=region_mask)
        ahat = torch.zeros_like(a)
        for b in range(B):
            for k in range(K):
                for t in range(T):
                    ahat[b, k, t] = shat[b, k, t].max() if frame_mask[b, t] > 0 else 0.0
        out.update(shat=shat, nbr_valid=nbr_valid, ahat=ahat)

    # list-append + stack (not in-place index writes) so torch autograd can
    # differentiate through the oracle — the [CHOICE]-variant tests check
    # GRADIENTS against jax.grad, not just values
    g_src = out["ahat"] if (pool == "context" and ctx_window > 0) else a
    score_rows, beta_rows = [], []
    for b in range(B):
        kv = word_mask[b].sum().clamp(min=1.0)
        if pool == "learned":
            # docs/MATH.md step 5 [CHOICE] "learned": linear scorer on the
            # frame's pooled region embedding
            g_vals = []
            for t in range(T):
                if frame_mask[b, t] <= 0:
                    g_vals.append(torch.zeros((), dtype=feats.dtype))
                    continue
                vb = torch.zeros(v_emb.shape[-1], dtype=feats.dtype)
                n = 0.0
                for r in range(R):
                    if region_mask is None or region_mask[b, t, r] > 0:
                        vb = vb + v_emb[b, t, r]
                        n += 1.0
                vb = vb / max(n, 1.0)
                g_vals.append((vb * params["attn_w"]).sum())
            g = torch.stack(g_vals)
        else:
            g = (g_src[b] * word_mask[b, :, None]).sum(0) / kv   # [T]
        if pool == "mean":
            beta_b = frame_mask[b] / frame_mask[b].sum().clamp(min=1.0)
        else:
            logits = torch.where(frame_mask[b] > 0, g / temp,
                                 torch.full_like(g, NEG))
            beta_b = torch.softmax(logits, dim=0) * frame_mask[b]
        s_w = (beta_b[None, :] * a[b]).sum(-1)               # [K]
        score_rows.append((s_w * word_mask[b]).sum() / kv)
        beta_rows.append(beta_b)
    out.update(score=torch.stack(score_rows), beta=torch.stack(beta_rows))
    return out


def context_similarity(s, v_emb, frame_mask, window, temp, region_mask=None):
    """Naive windowed context similarity. s [B,K,T,R], v_emb [B,T,R,E].

    region_mask: invalid NEIGHBOR regions are excluded from the affinity
    softmax (weight exactly 0 — the masked-logit softmax of the jnp path
    underflows to 0 in f32); ŝ is still produced for every center region,
    the ctx loss's region_mask term excludes invalid centers."""
    B, K, T, R = s.shape
    shat = torch.zeros_like(s)
    offsets = [o for o in range(-window, window + 1) if o != 0]
    nbr_valid = torch.zeros(B, T, len(offsets), dtype=s.dtype)
    for b in range(B):
        for t in range(T):
            if frame_mask[b, t] <= 0:
                continue
            valid_os = []
            for oi, o in enumerate(offsets):
                tp = t + o
                if 0 <= tp < T and frame_mask[b, tp] > 0:
                    nbr_valid[b, t, oi] = 1.0
                    valid_os.append((oi, tp))
            if not valid_os:
                continue
            for r in range(R):
                acc = torch.zeros(K, dtype=s.dtype)
                for oi, tp in valid_os:
                    aff = v_emb[b, tp] @ v_emb[b, t, r]      # [R']
                    if region_mask is not None:
                        aff = torch.where(region_mask[b, tp] > 0, aff,
                                          torch.full_like(aff, NEG))
                    alpha = torch.softmax(aff / temp, dim=0)
                    if region_mask is not None:
                        alpha = alpha * (region_mask[b, tp] > 0)
                        # masked softmax weight on invalid slots is an exact
                        # 0 after underflow; zeroing keeps the NEG-filled
                        # s entries out of the mix in f64 too
                        sc = alpha.sum().clamp(min=1e-30)
                        alpha = alpha / sc
                    acc += s[b, :, tp, :] @ alpha            # [K]
                shat[b, :, t, r] = acc / len(valid_os)
    return shat, nbr_valid


def cross_scores(params, feats, word_ids, frame_mask, word_mask,
                 temp=0.1, pool="attention", ctx_window=0, ctx_temp=0.1):
    """Naive B×B score matrix: score(video i, sentence j)."""
    B = feats.shape[0]
    mat = torch.zeros(B, B, dtype=feats.dtype)
    for i in range(B):
        for j in range(B):
            out = forward(params, feats[i:i + 1], word_ids[j:j + 1],
                          frame_mask[i:i + 1], word_mask[j:j + 1],
                          temp=temp, pool=pool, ctx_window=ctx_window,
                          ctx_temp=ctx_temp)
            mat[i, j] = out["score"][0]
    return mat


def ranking_loss(mat, margin, norm="pairs"):
    B = mat.shape[0]
    total, n = torch.zeros((), dtype=mat.dtype), 0
    for i in range(B):
        for j in range(B):
            if i == j:
                continue
            total = total + torch.relu(margin + mat[i, j] - mat[i, i])
            total = total + torch.relu(margin + mat[j, i] - mat[i, i])
            n += 1  # docs/MATH.md: normalize by ordered pairs, two hinges each
    denom = {"pairs": max(n, 1), "hinges": max(2 * n, 1),
             "batch": max(B, 1)}[norm]
    return total / denom


def context_loss(s, shat, word_mask, frame_mask, nbr_valid,
                 region_mask=None, target="stopgrad"):
    """Gradient flow per `target` (docs/MATH.md [CHOICE], loss.ctx_target):
    torch .detach() mirrors jax stop_gradient so autograd through this
    oracle cross-checks each variant's gradients, not just the value."""
    B, K, T, R = s.shape
    num, den = torch.zeros((), dtype=s.dtype), 0.0
    for b in range(B):
        for k in range(K):
            for t in range(T):
                if (word_mask[b, k] > 0 and frame_mask[b, t] > 0
                        and nbr_valid[b, t].sum() > 0):
                    for r in range(R):
                        if region_mask is not None \
                                and region_mask[b, t, r] <= 0:
                            continue   # NEG-filled slot: excluded from both
                        sv, hv = s[b, k, t, r], shat[b, k, t, r]
                        if target == "stopgrad":
                            sq = (sv - hv.detach()) ** 2
                        elif target == "live":
                            sq = (sv - hv) ** 2
                        else:          # symmetric
                            sq = 0.5 * ((sv - hv.detach()) ** 2
                                        + (hv - sv.detach()) ** 2)
                        num = num + sq
                        den += 1.0
    return num / max(den, 1.0)


def cluster_loss(s, v_emb, word_mask, frame_mask, centers):
    B, K, T, R = s.shape
    cn = normalize(centers)
    num, den = torch.zeros((), dtype=s.dtype), 0.0
    for b in range(B):
        for k in range(K):
            for t in range(T):
                r_star = int(s[b, k, t].argmax())
                f = v_emb[b, t, r_star]
                c_star = int((cn @ f).argmax())
                if word_mask[b, k] > 0 and frame_mask[b, t] > 0:
                    num = num + ((f - centers[c_star]) ** 2).sum()
                    den += 1.0
    return num / max(den, 1.0)


def box_iou(a, b):
    lt = torch.maximum(a[..., :2], b[..., :2])
    rb = torch.minimum(a[..., 2:], b[..., 2:])
    wh = (rb - lt).clamp(min=0)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[..., 2] - a[..., 0]).clamp(min=0) * (a[..., 3] - a[..., 1]).clamp(min=0)
    ab = (b[..., 2] - b[..., 0]).clamp(min=0) * (b[..., 3] - b[..., 1]).clamp(min=0)
    union = aa + ab - inter
    return torch.where(union > 0, inter / union.clamp(min=1e-12),
                       torch.zeros_like(union))
