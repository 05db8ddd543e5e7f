"""Pallas Cholesky kernel: correctness + custom VJP vs XLA autodiff.

Runs the kernel in interpreter mode on CPU (PACOH_TPU_FORCE_PALLAS); on real
TPU the same dispatch path compiles the kernel.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _rand_psd(n, seed=0, noise=0.1, batch=()):
    rs = np.random.RandomState(seed)
    A = rs.randn(*batch, n + 2, n).astype(np.float32)
    K = np.einsum("...in,...im->...nm", A, A) / n
    return (K + noise * np.eye(n)).astype(np.float32)


class TestXLAPath:
    def test_cholesky_dispatch_matches_xla(self):
        from meta_learning_pacoh_tpu.ops.chol import cholesky

        K = jnp.asarray(_rand_psd(12, seed=1))
        np.testing.assert_allclose(
            np.asarray(cholesky(K)), np.asarray(jnp.linalg.cholesky(K)), atol=1e-5
        )

    def test_custom_vjp_matches_autodiff(self):
        from meta_learning_pacoh_tpu.ops.chol import cholesky

        K = jnp.asarray(_rand_psd(8, seed=2))

        def f_custom(M):
            L = cholesky(M)
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L**2)

        def f_ref(M):
            L = jnp.linalg.cholesky(M)
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(L**2)

        g = jax.grad(f_custom)(K)
        g_ref = jax.grad(f_ref)(K)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-4, atol=1e-5)


class TestPallasKernel:
    """Interpreter-mode runs of the actual TPU kernel."""

    def _pallas_chol(self, K):
        from meta_learning_pacoh_tpu.ops.pallas import chol_kernel

        return chol_kernel.cholesky_pallas(jnp.asarray(K))

    @pytest.mark.parametrize("n", [3, 5, 8, 17, 64])
    def test_single_matrix(self, n):
        K = _rand_psd(n, seed=n)
        L = np.asarray(self._pallas_chol(K))
        np.testing.assert_allclose(L @ L.T, K, atol=5e-4)
        assert np.allclose(L, np.tril(L))

    def test_batched(self):
        K = _rand_psd(6, seed=3, batch=(4,))
        L = np.asarray(self._pallas_chol(K))
        ref = np.linalg.cholesky(K)
        np.testing.assert_allclose(L, ref, atol=1e-4)

    def test_under_vmap(self):
        from meta_learning_pacoh_tpu.ops.pallas import chol_kernel

        K = jnp.asarray(_rand_psd(5, seed=4, batch=(3,)))
        L = jax.vmap(chol_kernel.cholesky_pallas)(K)
        np.testing.assert_allclose(np.asarray(L), np.linalg.cholesky(np.asarray(K)), atol=1e-4)
