"""Blocked large-N MLL kernel (interpret mode on CPU): values, grads,
N-padding, per-system jitter escalation, and dispatch wiring."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
    blocked_mll_quad_logdet,
)
from meta_learning_pacoh_tpu.ops.gp import gp_mll, gp_mll_batch


def _psd(b, n, seed=0, scale=0.5):
    rs = np.random.RandomState(seed)
    A = rs.randn(b, n + 3, n).astype(np.float32)
    return (np.einsum("bin,bim->bnm", A, A) / n
            + scale * np.eye(n, dtype=np.float32)).astype(np.float32)


def _xla_quad_logdet(Kn, r):
    L = jnp.linalg.cholesky(Kn)
    z = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)[..., 0]
    quad = jnp.sum(z * z, -1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    return quad, logdet


def test_values_and_grads_match_xla_with_padding():
    """N=72 pads to one 128 panel; B=2 pads to the VMEM group size."""
    b, n = 2, 72
    Kn = jnp.asarray(_psd(b, n, seed=n))
    r = jnp.asarray(np.random.RandomState(1).randn(b, n).astype(np.float32))

    quad, logdet = blocked_mll_quad_logdet(Kn, r)
    quad_ref, logdet_ref = _xla_quad_logdet(Kn, r)
    np.testing.assert_allclose(np.asarray(quad), np.asarray(quad_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(logdet), np.asarray(logdet_ref),
                               rtol=2e-5, atol=1e-5)

    def loss(ql):
        return lambda K, rr: jnp.sum(0.7 * ql(K, rr)[0] + 0.3 * ql(K, rr)[1])

    gK, gr = jax.grad(loss(blocked_mll_quad_logdet), argnums=(0, 1))(Kn, r)
    gK_ref, gr_ref = jax.grad(loss(_xla_quad_logdet), argnums=(0, 1))(Kn, r)
    sym = lambda M: 0.5 * (M + jnp.swapaxes(M, -1, -2))
    np.testing.assert_allclose(np.asarray(sym(gK)), np.asarray(sym(gK_ref)),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                               rtol=1e-4, atol=1e-5)


def test_multi_panel_n200_matches_xla():
    """N=200 -> two 128-panels: exercises the off-diagonal panel solve,
    trailing SYRK, and blocked z-substitution (the Swissfel shape)."""
    b, n = 1, 200
    Kn = jnp.asarray(_psd(b, n, seed=9))
    r = jnp.asarray(np.random.RandomState(2).randn(b, n).astype(np.float32))

    quad, logdet = blocked_mll_quad_logdet(Kn, r)
    quad_ref, logdet_ref = _xla_quad_logdet(Kn, r)
    np.testing.assert_allclose(np.asarray(quad), np.asarray(quad_ref), rtol=5e-5)
    np.testing.assert_allclose(np.asarray(logdet), np.asarray(logdet_ref),
                               rtol=5e-5, atol=5e-5)

    def loss(K, rr):
        q, l = blocked_mll_quad_logdet(K, rr)
        return jnp.sum(0.7 * q + 0.3 * l)

    def loss_ref(K, rr):
        q, l = _xla_quad_logdet(K, rr)
        return jnp.sum(0.7 * q + 0.3 * l)

    gK, gr = jax.grad(loss, argnums=(0, 1))(Kn, r)
    gK_ref, gr_ref = jax.grad(loss_ref, argnums=(0, 1))(Kn, r)
    sym = lambda M: 0.5 * (M + jnp.swapaxes(M, -1, -2))
    np.testing.assert_allclose(np.asarray(sym(gK)), np.asarray(sym(gK_ref)),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref),
                               rtol=2e-4, atol=2e-5)


def test_batch_major_and_lane_major_layouts_agree(monkeypatch):
    """The diagonal-panel factorization dispatches on group size G:
    batch-major (fused Gauss + MXU couplings) at G <= _BATCH_MAX_G,
    lane-major above. Both layouts must produce the same values and grads
    (the small-b tests above now ride batch-major; this pins the pair)."""
    from meta_learning_pacoh_tpu.ops.pallas import blocked_mll_kernel as bk

    b, n = 2, 150  # multi-panel, padded N
    Kn = jnp.asarray(_psd(b, n, seed=12))
    r = jnp.asarray(np.random.RandomState(3).randn(b, n).astype(np.float32))

    def loss(K, rr):
        q, l = blocked_mll_quad_logdet(K, rr)
        return jnp.sum(0.7 * q + 0.3 * l)

    outs = {}
    for label, max_g in (("batch", 8), ("lanes", 0)):
        monkeypatch.setattr(bk, "_BATCH_MAX_G", max_g)
        jax.clear_caches()
        outs[label] = (blocked_mll_quad_logdet(Kn, r),
                       jax.grad(loss, argnums=(0, 1))(Kn, r))
    (qb, lb), (gKb, grb) = outs["batch"]
    (ql, ll), (gKl, grl) = outs["lanes"]
    np.testing.assert_allclose(np.asarray(qb), np.asarray(ql), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(ll),
                               rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gKb), np.asarray(gKl),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(grb), np.asarray(grl),
                               rtol=2e-4, atol=2e-5)
    quad_ref, logdet_ref = _xla_quad_logdet(Kn, r)
    np.testing.assert_allclose(np.asarray(qb), np.asarray(quad_ref),
                               rtol=5e-5)
    np.testing.assert_allclose(np.asarray(lb), np.asarray(logdet_ref),
                               rtol=5e-5, atol=5e-5)


def test_jitter_escalation_per_system():
    """A singular system escalates its own jitter; healthy systems in the
    same VMEM group keep exact (jitter-free) results."""
    b, n = 3, 52
    Kn = _psd(b, n, seed=4)
    Kn[1] = 1e-9 * np.eye(n, dtype=np.float32)
    r = np.random.RandomState(5).randn(b, n).astype(np.float32)

    quad, logdet = blocked_mll_quad_logdet(jnp.asarray(Kn), jnp.asarray(r))
    assert np.all(np.isfinite(np.asarray(quad)))
    assert np.all(np.isfinite(np.asarray(logdet)))
    quad_ref = r[0] @ np.linalg.solve(Kn[0].astype(np.float64), r[0])
    assert abs(float(quad[0]) - quad_ref) / abs(quad_ref) < 1e-4


def test_blocked_cholesky_matches_xla():
    from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
        blocked_cholesky,
    )

    A = jnp.asarray(_psd(2, 200, seed=11))
    L = blocked_cholesky(A)
    L_ref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=2e-5, atol=2e-5)
    # nested batch dims reshape through
    A4 = jnp.reshape(A, (2, 1, 200, 200))
    L4 = blocked_cholesky(A4)
    np.testing.assert_allclose(np.asarray(L4[:, 0]), np.asarray(L_ref),
                               rtol=2e-5, atol=2e-5)


def test_gp_mll_batch_dispatches_to_blocked_kernel(monkeypatch):
    """With Pallas forced on, the large-N batched MLL routes through the
    blocked kernel and matches the vmapped XLA path, incl. ragged masks."""
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    b, n = 3, 56
    rs = np.random.RandomState(6)
    mean = jnp.asarray(rs.randn(b, n).astype(np.float32))
    y = jnp.asarray(rs.randn(b, n).astype(np.float32))
    K = jnp.asarray(_psd(b, n, seed=7, scale=0.1))
    mask = np.ones((b, n), np.float32)
    mask[1, -9:] = 0.0
    mask = jnp.asarray(mask)

    ll_batch = gp_mll_batch(mean, K, y, 0.3, mask)
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "0")
    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    ll_ref = jax.vmap(lambda m, k, yy, mm: gp_mll(m, k, yy, 0.3, mm))(
        mean, K, y, mask
    )
    np.testing.assert_allclose(np.asarray(ll_batch), np.asarray(ll_ref),
                               rtol=5e-5, atol=5e-5)
