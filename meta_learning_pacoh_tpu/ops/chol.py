"""Differentiable Cholesky with backend dispatch (Pallas TPU kernel / XLA).

`cholesky(A)` is the single entry point the GP engine uses. On TPU, small and
medium matrices route to the in-VMEM Pallas kernel
(ops/pallas/chol_kernel.py); everything else uses XLA's blocked
factorization. A custom VJP (Murray 2016, "Differentiation of the Cholesky
decomposition") makes the Pallas forward differentiable with two triangular
solves — the same backward XLA itself uses, verified against autodiff in
tests/test_chol.py.
"""

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from meta_learning_pacoh_tpu import config


def _cholesky_impl(a):
    n = a.shape[-1]
    if (
        config.pallas_enabled()
        and config.PALLAS_CHOL_MIN_N <= n <= config.PALLAS_CHOL_MAX_N
        and a.ndim >= 3  # the lane-parallel kernel needs a batch to fill lanes
        and a.dtype == jnp.float32
    ):
        from meta_learning_pacoh_tpu.ops.pallas.chol_kernel import cholesky_pallas

        return cholesky_pallas(a)
    return jnp.linalg.cholesky(a)


@jax.custom_vjp
def cholesky(a):
    """Lower-triangular Cholesky factor of PSD matrix/matrices [..., N, N]."""
    return _cholesky_impl(a)


def _cholesky_fwd(a):
    L = _cholesky_impl(a)
    return L, L


def _phi(x):
    """Lower triangle with halved diagonal."""
    return jnp.tril(x) - 0.5 * jnp.tril(jnp.triu(x))


def _cholesky_bwd(L, L_bar):
    # A_bar = L^{-T} Phi(L^T L_bar)_sym L^{-1}, with Phi = tril, half diagonal.
    M = jnp.matmul(jnp.swapaxes(L, -1, -2), L_bar)
    P = _phi(M)
    S = 0.5 * (P + jnp.swapaxes(P, -1, -2))
    X = solve_triangular(L, S, lower=True, trans=1)  # L^T X = S
    A_bar = jnp.swapaxes(
        solve_triangular(L, jnp.swapaxes(X, -1, -2), lower=True, trans=1), -1, -2
    )
    return (A_bar,)


cholesky.defvjp(_cholesky_fwd, _cholesky_bwd)


def safe_cholesky(K, jitters=(1e-6, 1e-4, 1e-2)):
    """Cholesky with escalating diagonal jitter (gpytorch psd_safe_cholesky
    semantics, reference fallback: GPR_meta_mlap.py:439-448), jit-compatible.

    The jitter *selection* runs on a stop-gradient copy so the picked level is
    a constant w.r.t. autodiff and no NaN from failed trial factorizations can
    leak into the backward pass; the returned factor is a single clean
    cholesky at the selected jitter.
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    K_nd = jax.lax.stop_gradient(K)

    def ok(j):
        L = _cholesky_impl(K_nd + j * eye)
        d = jnp.diagonal(L, axis1=-2, axis2=-1)
        return jnp.all(jnp.isfinite(d)) & jnp.all(d > 0)

    jitter = jnp.asarray(jitters[-1], K.dtype)
    for j in reversed(jitters[:-1]):
        jitter = jnp.where(ok(j), jnp.asarray(j, K.dtype), jitter)
    return cholesky(K + jitter * eye)
