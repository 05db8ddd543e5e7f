"""Fused SVGD Pallas kernel vs the jnp reference (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.ops.svgd import rbf_phi
from meta_learning_pacoh_tpu.ops.pallas.svgd_kernel import svgd_phi_fused


@pytest.mark.parametrize("k,p", [(4, 16), (10, 300), (16, 2304)])
def test_fused_matches_reference(k, p):
    rs = np.random.RandomState(k + p)
    X = jnp.asarray(rs.randn(k, p).astype(np.float32))
    S = jnp.asarray(rs.randn(k, p).astype(np.float32))
    phi_ref = np.asarray(rbf_phi(X, S))
    phi_fused = np.asarray(svgd_phi_fused(X, S))
    # bisected median picks an order statistic; numpy midpoint-averages the
    # two middles for even K^2 — compare update directions on a normalized
    # scale rather than elementwise relative error
    denom = np.abs(phi_ref).max()
    assert np.abs(phi_fused - phi_ref).max() / denom < 0.03


def test_fused_median_exactness_odd_count():
    """With distinct distances, the bisected median converges to an actual
    order statistic; phi should be near-identical when K^2 is odd-ish."""
    rs = np.random.RandomState(0)
    X = jnp.asarray(rs.randn(5, 64).astype(np.float32))
    S = jnp.asarray(rs.randn(5, 64).astype(np.float32))
    phi_ref = np.asarray(rbf_phi(X, S))
    phi_fused = np.asarray(svgd_phi_fused(X, S))
    np.testing.assert_allclose(phi_fused, phi_ref, rtol=5e-2, atol=5e-3)
