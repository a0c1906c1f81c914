"""Pallas kernels vs pure-jnp references (interpret mode on CPU).

SURVEY.md §5 item 2: unit tests per kernel on random shapes incl. padding/mask
edge cases. On TPU the same tests run compiled (see bench/verify flows).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nafae_tpu.ops import grounding as G
from nafae_tpu.ops.pallas.fused_ground import cross_mil


def _ref_a(w, v, fm):
    s = jnp.einsum("jke,itre->ijktr", w, v,
                   precision=jax.lax.Precision.HIGHEST)
    return G.frame_mil_max(s, fm[:, None, :])


@pytest.mark.parametrize("shapes", [
    (3, 3, 2, 4, 5, 16),    # tiny, ragged
    (5, 4, 3, 7, 20, 32),   # R=20 (production R), odd T
    (2, 2, 1, 1, 1, 8),     # degenerate single frame/region
    (4, 4, 2, 6, 33, 16),   # R > 32 (two lane groups)
])
def test_cross_mil_matches_reference(shapes):
    I, J, K, T, R, E = shapes
    rng = np.random.RandomState(I + R)
    w = jnp.asarray(rng.randn(J, K, E).astype(np.float32))
    v = jnp.asarray(rng.randn(I, T, R, E).astype(np.float32))
    fm = jnp.asarray((rng.rand(I, T) > 0.3).astype(np.float32))
    np.testing.assert_allclose(np.asarray(cross_mil(w, v, fm)),
                               np.asarray(_ref_a(w, v, fm)),
                               rtol=1e-5, atol=1e-5)


def test_cross_mil_gradients_match():
    I, J, K, T, R, E = 4, 4, 3, 5, 6, 16
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(J, K, E).astype(np.float32))
    v = jnp.asarray(rng.randn(I, T, R, E).astype(np.float32))
    fm = jnp.asarray((rng.rand(I, T) > 0.3).astype(np.float32))
    # nonlinear reduction so grads exercise all elements
    loss_ref = lambda w, v: jnp.sum(jnp.sin(_ref_a(w, v, fm) * 1.7))
    loss_pl = lambda w, v: jnp.sum(jnp.sin(cross_mil(w, v, fm) * 1.7))
    gr = jax.grad(loss_ref, argnums=(0, 1))(w, v)
    gp = jax.grad(loss_pl, argnums=(0, 1))(w, v)
    np.testing.assert_allclose(np.asarray(gp[0]), np.asarray(gr[0]),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gp[1]), np.asarray(gr[1]),
                               rtol=1e-4, atol=1e-5)


def test_cross_scores_pallas_impl_matches():
    rng = np.random.RandomState(1)
    B, K, T, R, E = 4, 3, 6, 5, 16
    w = G.l2_normalize(jnp.asarray(rng.randn(B, K, E).astype(np.float32)))
    v = G.l2_normalize(jnp.asarray(rng.randn(B, T, R, E).astype(np.float32)))
    fm = jnp.asarray((rng.rand(B, T) > 0.2).astype(np.float32))
    wm = jnp.asarray((rng.rand(B, K) > 0.2).astype(np.float32))
    for pool in ("attention", "mean"):
        sj = G.cross_scores(w, wm, v, fm, 0.1, pool, impl="jnp")
        sp = G.cross_scores(w, wm, v, fm, 0.1, pool, impl="pallas")
        np.testing.assert_allclose(np.asarray(sp), np.asarray(sj),
                                   rtol=1e-5, atol=1e-6)
