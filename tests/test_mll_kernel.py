"""Fused batched MLL kernel (interpret mode on CPU): values, grads, masks,
jitter escalation."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.ops.pallas.mll_kernel import mll_quad_logdet
from meta_learning_pacoh_tpu.ops.gp import gp_mll, gp_mll_batch


def _psd(b, n, seed=0, scale=0.5):
    rs = np.random.RandomState(seed)
    A = rs.randn(b, n + 3, n).astype(np.float32)
    return (np.einsum("bin,bim->bnm", A, A) / n
            + scale * np.eye(n, dtype=np.float32)).astype(np.float32)


@pytest.mark.parametrize("b,n", [(3, 9), (7, 12), (130, 16)])
def test_values_match_xla(b, n):
    Kn = jnp.asarray(_psd(b, n, seed=n))
    r = jnp.asarray(np.random.RandomState(1).randn(b, n).astype(np.float32))
    quad, logdet = mll_quad_logdet(Kn, r)
    quad_ref = jnp.einsum("bn,bn->b", r, jnp.linalg.solve(Kn, r[..., None])[..., 0])
    logdet_ref = jnp.linalg.slogdet(Kn)[1]
    np.testing.assert_allclose(np.asarray(quad), np.asarray(quad_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(logdet), np.asarray(logdet_ref),
                               rtol=2e-5, atol=1e-5)


def test_grads_match_autodiff():
    Kn = jnp.asarray(_psd(5, 10, seed=2))
    r = jnp.asarray(np.random.RandomState(3).randn(5, 10).astype(np.float32))

    def loss_pallas(K, rr):
        q, l = mll_quad_logdet(K, rr)
        return jnp.sum(0.7 * q + 0.3 * l)

    def loss_ref(K, rr):
        L = jnp.linalg.cholesky(K)
        z = jax.scipy.linalg.solve_triangular(L, rr[..., None], lower=True)[..., 0]
        return jnp.sum(0.7 * jnp.sum(z * z, -1)
                       + 0.3 * 2 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1))

    gK, gr = jax.grad(loss_pallas, argnums=(0, 1))(Kn, r)
    gK_ref, gr_ref = jax.grad(loss_ref, argnums=(0, 1))(Kn, r)
    sym = lambda M: 0.5 * (M + jnp.swapaxes(M, -1, -2))
    np.testing.assert_allclose(np.asarray(sym(gK)), np.asarray(sym(gK_ref)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref), rtol=1e-4, atol=1e-5)


def test_jitter_escalation_per_lane():
    """One near-singular system in the batch: only that lane escalates."""
    Kn = _psd(4, 10, seed=4)
    Kn[2] = 1e-9 * np.eye(10)  # singular-ish lane
    r = np.random.RandomState(5).randn(4, 10).astype(np.float32)
    quad, logdet = mll_quad_logdet(jnp.asarray(Kn), jnp.asarray(r))
    assert np.all(np.isfinite(np.asarray(quad)))
    assert np.all(np.isfinite(np.asarray(logdet)))
    # healthy lanes unaffected by the bad one
    quad_ref = r[0] @ np.linalg.solve(Kn[0], r[0])
    assert abs(float(quad[0]) - quad_ref) / abs(quad_ref) < 1e-4


def test_gp_mll_batch_matches_per_task_path():
    """Batched dispatch == vmapped reference gp_mll, incl. masked padding."""
    b, n = 6, 14
    rs = np.random.RandomState(6)
    mean = jnp.asarray(rs.randn(b, n).astype(np.float32))
    y = jnp.asarray(rs.randn(b, n).astype(np.float32))
    K = jnp.asarray(_psd(b, n, seed=7, scale=0.1))
    mask = np.ones((b, n), np.float32)
    mask[1, -4:] = 0.0
    mask[4, -1:] = 0.0
    mask = jnp.asarray(mask)
    noise = 0.3

    ll_batch = gp_mll_batch(mean, K, y, noise, mask)
    ll_ref = jax.vmap(lambda m, k, yy, mm: gp_mll(m, k, yy, noise, mm))(
        mean, K, y, mask
    )
    np.testing.assert_allclose(np.asarray(ll_batch), np.asarray(ll_ref),
                               rtol=5e-5, atol=5e-5)
