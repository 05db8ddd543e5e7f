"""Distributed block-cyclic Cholesky / MLL parity on the virtual 8-device mesh.

The reference has no distributed linear algebra at all (SURVEY.md §2.5:
training never spans processes); this tier is TPU-native-only coverage for
GP dataset sizes beyond the single-chip Pallas window.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.parallel.mesh import make_mesh
from meta_learning_pacoh_tpu.parallel.dist_chol import (
    distributed_cholesky,
    distributed_gp_mll,
)


def _spd(n, seed=0):
    rs = np.random.RandomState(seed)
    a = rs.randn(n + 16, n).astype(np.float32)
    return (a.T @ a) / n + 0.5 * np.eye(n, dtype=np.float32)


@pytest.mark.parametrize("n,block", [(256, 32), (72, 16)])
def test_distributed_cholesky_matches_xla(n, block):
    # 72/16 exercises the identity-tail padding path (72 % 128 != 0)
    mesh = make_mesh(8)
    k = _spd(n, seed=n)
    l_dist = distributed_cholesky(jnp.asarray(k), mesh, "task", block)
    l_ref = jnp.linalg.cholesky(jnp.asarray(k))
    assert l_dist.shape == (n, n)
    np.testing.assert_allclose(np.asarray(l_dist), np.asarray(l_ref),
                               atol=2e-5, rtol=1e-5)


def test_distributed_mll_matches_closed_form():
    n = 192
    mesh = make_mesh(8)
    k = _spd(n, seed=7)
    rs = np.random.RandomState(1)
    y = rs.randn(n).astype(np.float32)
    mean = rs.randn(n).astype(np.float32)

    mll = distributed_gp_mll(jnp.asarray(mean), jnp.asarray(k),
                             jnp.asarray(y), mesh, block_size=24)

    l_ref = np.linalg.cholesky(k.astype(np.float64))
    z = np.linalg.solve(l_ref, (y - mean).astype(np.float64))
    ref = -0.5 * (z @ z + 2.0 * np.log(np.diag(l_ref)).sum()
                  + n * np.log(2.0 * np.pi))
    np.testing.assert_allclose(float(mll), ref, rtol=1e-5, atol=1e-3)


def test_distributed_mll_gradient_matches_xla_autodiff():
    import jax

    n = 96
    mesh = make_mesh(8)
    k = _spd(n, seed=3)
    rs = np.random.RandomState(2)
    y = jnp.asarray(rs.randn(n).astype(np.float32))
    mean = jnp.asarray(rs.randn(n).astype(np.float32))

    def dist(m, kk, yy):
        return distributed_gp_mll(m, kk, yy, mesh, block_size=12)

    def ref(m, kk, yy):
        l = jnp.linalg.cholesky(kk)
        z = jnp.linalg.solve(l, (yy - m)[:, None])[:, 0]
        return -0.5 * (z @ z + 2.0 * jnp.log(jnp.diagonal(l)).sum()
                       + n * jnp.log(2.0 * jnp.pi))

    g_d = jax.grad(dist, argnums=(0, 1, 2))(mean, jnp.asarray(k), y)
    g_r = jax.grad(ref, argnums=(0, 1, 2))(mean, jnp.asarray(k), y)
    for gd, gr in zip(g_d, g_r):
        np.testing.assert_allclose(np.asarray(gd), np.asarray(gr),
                                   atol=5e-4, rtol=1e-3)
