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


def test_batched_distributed_mll_and_dispatch_match_xla():
    """gp_mll_batch under the distributed_linalg context == plain XLA path,
    values AND jitted gradients, incl. masked (padded) tasks."""
    import jax
    from meta_learning_pacoh_tpu.ops import gp as gp_ops

    mesh = make_mesh(8)
    rs = np.random.RandomState(0)
    b, n = 3, 96
    a = rs.randn(b, n + 16, n).astype(np.float32)
    k = np.einsum("bij,bik->bjk", a, a) / n + 0.5 * np.eye(n, dtype=np.float32)
    y = rs.randn(b, n).astype(np.float32)
    mean = rs.randn(b, n).astype(np.float32)
    mask = np.ones((b, n), np.float32)
    mask[:, 90:] = 0.0
    k, y, mean, mask = map(jnp.asarray, (k, y, mean, mask))

    ref = gp_ops.gp_mll_batch(mean, k, y, 0.1, mask)
    with gp_ops.distributed_linalg(mesh, min_n=64, block_size=16):
        dist = gp_ops.gp_mll_batch(mean, k, y, 0.1, mask)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    def loss_dist(k_):
        with gp_ops.distributed_linalg(mesh, min_n=64, block_size=16):
            return jnp.sum(gp_ops.gp_mll_batch(mean, k_, y, 0.1, mask))

    g_d = jax.jit(jax.grad(loss_dist))(k)
    g_r = jax.grad(
        lambda k_: jnp.sum(gp_ops.gp_mll_batch(mean, k_, y, 0.1, mask)))(k)
    np.testing.assert_allclose(np.asarray(g_d), np.asarray(g_r),
                               rtol=1e-3, atol=5e-4)

    # a vmapped caller inside the context must FALL BACK to XLA, not fail
    with gp_ops.distributed_linalg(mesh, min_n=64, block_size=16):
        v = jax.vmap(
            lambda k_: gp_ops.gp_mll_batch(mean, k_, y, 0.1, mask))(k[None])
    np.testing.assert_allclose(np.asarray(v[0]), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_map_learner_routes_large_n_through_distributed_tier():
    """A PACOH-MAP learner constructed with mesh= and N > BLOCKED_MAX_N
    meta-fits THROUGH the distributed Cholesky, and its training trajectory
    matches the plain single-device learner (same seed)."""
    from meta_learning_pacoh_tpu import GPRegressionMetaLearned
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=2, n_samples=520)
    test = env.generate_meta_test_data(
        n_tasks=2, n_samples_context=8, n_samples_test=16)
    mesh = make_mesh(8)

    kw = dict(num_iter_fit=3, task_batch_size=-1, random_seed=30,
              mean_nn_layers=(8,), kernel_nn_layers=(8,))
    m_dist = GPRegressionMetaLearned(train, mesh=mesh, **kw)
    assert m_dist._dist_linalg is not None, "N=520 must route distributed"
    m_ref = GPRegressionMetaLearned(train, **kw)
    m_dist.meta_fit(verbose=False)
    m_ref.meta_fit(verbose=False)

    ll_d, rmse_d, _ = m_dist.eval_datasets(test)
    ll_r, rmse_r, _ = m_ref.eval_datasets(test)
    np.testing.assert_allclose(ll_d, ll_r, rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(rmse_d, rmse_r, rtol=2e-3, atol=2e-3)


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
