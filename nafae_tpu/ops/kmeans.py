"""On-device batched k-means (Lloyd) for the visual clustering loss.

The reference runs k-means on host CPU (numpy/sklearn) between epochs
(SURVEY.md L145, L220-225). Here assignment + centroid update are jitted XLA:
distance matrix on the MXU, argmin, one-hot segment-sums; optional `axis_name`
psum makes the update exact under data parallelism (SURVEY.md §3 parallelism
table: "centroid update across a sharded batch needs psum-ed segment sums").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nafae_tpu.ops import grounding as G
from nafae_tpu.ops.grounding import l2_normalize




def kmeans_assign(f: jax.Array, centers: jax.Array,
                  dtype=None) -> jax.Array:
    """Cosine assignment c* = argmax_c f·Ĉ[c].  f [..,E], centers [Kc,E] -> [..].

    dtype: compute dtype for the sims contraction (the production bf16
    mode passes model.dtype). None keeps the f32 einsum at module
    PRECISION — the oracle-parity path. With a dtype the sims run as ONE
    transposed 2-D dot on the MXU ([Kc,E]x[N,E] -> [Kc,N]) and the argmax
    reduces over the Kc SUBLANE axis: XLA loop-fuses the default
    [..,E]x[Kc,E] form into a VPU multiply+reduce (40.6 us/step at config4
    shapes, ~4 TF/s — docs/PERF.md r4 trace) because the argmax over the
    Kc=67 lane axis blocks the dot emitter. Same products, same
    first-index tie rule (argmax over axis 0 = lowest c wins, like
    argmax over the last axis of the untransposed sims).
    """
    cn = l2_normalize(centers)
    if dtype is None:
        sims = jnp.einsum("...e,ce->...c", f, cn,
                          preferred_element_type=jnp.float32,
                          precision=G.PRECISION)
        return jnp.argmax(sims, axis=-1)
    f2 = f.reshape(-1, f.shape[-1]).astype(dtype)
    sims = jax.lax.dot_general(cn.astype(dtype), f2,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=G.PRECISION)          # [Kc, N]
    return jnp.argmax(sims, axis=0).reshape(f.shape[:-1])


def _lloyd_step(carry, _, f, valid, axis_name, assign_dtype=None):
    centers = carry
    assign = kmeans_assign(f, centers, dtype=assign_dtype)    # [N]
    onehot = jax.nn.one_hot(assign, centers.shape[0], dtype=f.dtype)  # [N,Kc]
    onehot = onehot * valid[:, None]
    sums = jnp.einsum("nc,ne->ce", onehot, f,
                      preferred_element_type=jnp.float32,
                      precision=G.PRECISION)                 # [Kc,E]
    counts = jnp.sum(onehot, axis=0)                          # [Kc]
    if axis_name is not None:
        sums = jax.lax.psum(sums, axis_name)
        counts = jax.lax.psum(counts, axis_name)
    new = l2_normalize(sums / jnp.maximum(counts, 1.0)[:, None])
    # empty-cluster handling: keep the old (normalized) center
    keep = (counts < 0.5)[:, None]
    centers = jnp.where(keep, centers, new)
    return centers, None


def kmeans_lloyd(f: jax.Array, valid: jax.Array, centers: jax.Array,
                 iters: int, ema: float = 0.0,
                 axis_name: str | None = None,
                 assign_dtype=None) -> jax.Array:
    """Run `iters` Lloyd iterations; returns updated, normalized centers.

    f [N,E] flattened selected features, valid [N] (0/1), centers [Kc,E].
    ema: blend toward the OLD centers (docs/MATH.md: C ← norm((1−ρ)C_lloyd + ρC_old)).
    assign_dtype: forwarded to kmeans_assign (MXU sims in the compute dtype).
    """
    old = l2_normalize(centers)
    step = lambda c, x: _lloyd_step(c, x, f, valid, axis_name,
                                    assign_dtype=assign_dtype)
    new, _ = jax.lax.scan(step, old, None, length=iters)
    if ema > 0.0:
        new = l2_normalize((1.0 - ema) * new + ema * old)
    return new


def bank_write(bank: jax.Array, bank_valid: jax.Array, step: jax.Array,
               f: jax.Array, valid: jax.Array
               ) -> tuple[jax.Array, jax.Array]:
    """Write one step's selected features into the step-granular ring bank.

    bank [W, *sel_shape, E], bank_valid [W, *sel_shape]; slot = step % W.
    The bank accumulates the last W steps' selections — the TPU-native
    answer to the reference's dynamically-sized host-side accumulation of
    selected region features across the epoch (SURVEY.md L220-225): whole
    steps are evicted at once, so the ring layout is identical on a single
    device and on any mesh (the bank shards exactly like the activations it
    stores; no collectives are needed to maintain it).

    Smaller writes (a batch from a smaller frame bucket than the bank was
    sized for) zero-pad each dim up to the slot shape with valid=0 — the
    whole-slot overwrite evicts stale rows, and Lloyd ignores invalid rows,
    so multi-bucket datasets share one bank.
    """
    if f.shape != bank.shape[1:]:
        pads = [(0, b - s) for s, b in zip(f.shape, bank.shape[1:])]
        f = jnp.pad(f, pads)
        valid = jnp.pad(valid, pads[:valid.ndim])
    slot = step % bank.shape[0]
    return (bank.at[slot].set(f.astype(bank.dtype)),
            bank_valid.at[slot].set(valid.astype(bank_valid.dtype)))


def kmeans_init(key: jax.Array, num_clusters: int, dim: int) -> jax.Array:
    """Random unit-norm initial centers."""
    return l2_normalize(jax.random.normal(key, (num_clusters, dim)))


MAX_SEED_ROWS = 16384   # k-means++ candidate cap (bounds the seeding gather)


def kmeans_plusplus_init(key: jax.Array, f: jax.Array, valid: jax.Array,
                         num_clusters: int,
                         axis_names: tuple = (),
                         gather_dims: tuple = (),
                         max_rows: int = MAX_SEED_ROWS) -> jax.Array:
    """On-device k-means++ seeding: next center drawn ∝ min-sq-distance.

    f [..., E] candidate features (flattened internally), valid f.shape[:-1]
    (0/1). Uses the Gumbel-max trick for the weighted draw so the whole init
    is one jitted fori_loop (no host round-trips). Wired into training via
    ``loss.kmeans_init="plusplus"`` (seeds the centers from the first step's
    selections, before the first Lloyd refresh).

    Mesh form (exact, tested == single device): pass the UNFLATTENED shard
    with ``axis_names``/``gather_dims`` zipped — each named mesh axis is
    all_gathered back along its layout dim, reconstructing the global row
    order; every device then runs the identical seeding with the same
    (replicated) key, and the bitwise-identical result is pmax-replicated
    so the replicated-centers invariant holds under vma checking. Init-time
    only, so the one-off gather is the entire collective cost.

    max_rows bounds that cost (VERDICT r4 weak #6: the bank-sourced form
    would otherwise all_gather W·B·T·K·E bytes to every device): when the
    GLOBAL candidate count exceeds it, dim 0 — the bank's slot ring W,
    never a sharded dim at the call sites — is stride-subsampled BEFORE
    the gather. The subsample is static and identical on every mesh shape
    (dim 0 is unsharded), so mesh == single-device exactness is preserved;
    statistically, a strided subset of ring slots is still an unbiased
    sample of recent selections, and k-means++ over a bounded subsample is
    the standard scalable form. When dim 0 itself is gathered (the batch
    source, whose global count is B·T·K ≈ a few thousand) the cap is a
    no-op by construction.
    """
    if max_rows and f.ndim >= 2 and 0 not in gather_dims:
        rows = 1
        for d in f.shape[:-1]:
            rows *= d
        for ax in axis_names:
            rows *= jax.lax.axis_size(ax)
        if rows > max_rows:
            per_slot = rows // f.shape[0]
            keep = max(1, max_rows // max(per_slot, 1))
            stride = -(-f.shape[0] // keep)
            f = f[::stride]
            valid = valid[::stride]
    for ax, dim in zip(axis_names, gather_dims):
        f = jax.lax.all_gather(f, ax, axis=dim, tiled=True)
        valid = jax.lax.all_gather(valid, ax, axis=dim, tiled=True)
    f = f.reshape(-1, f.shape[-1])
    valid = valid.reshape(-1)
    n, e = f.shape
    neg = -1e30

    k0, key = jax.random.split(key)
    logits0 = jnp.where(valid > 0, 0.0, neg)
    first = jnp.argmax(logits0 + jax.random.gumbel(k0, (n,)))
    centers = jnp.zeros((num_clusters, e), f.dtype).at[0].set(f[first])
    d2 = jnp.sum((f - f[first]) ** 2, axis=-1)

    def body(i, carry):
        centers, d2, key = carry
        key, kd = jax.random.split(key)
        logits = jnp.where(valid > 0, jnp.log(jnp.maximum(d2, 1e-12)), neg)
        nxt = jnp.argmax(logits + jax.random.gumbel(kd, (n,)))
        c = f[nxt]
        centers = centers.at[i].set(c)
        d2 = jnp.minimum(d2, jnp.sum((f - c) ** 2, axis=-1))
        return centers, d2, key

    centers, _, _ = jax.lax.fori_loop(1, num_clusters, body, (centers, d2, key))
    centers = l2_normalize(centers)
    if axis_names:
        # every device computed the identical value from the gathered rows;
        # pmax is bitwise-exact on equal inputs and marks the result
        # device-invariant (replicated centers, like kmeans_lloyd's psums)
        centers = jax.lax.pmax(centers, axis_names)
    return centers
