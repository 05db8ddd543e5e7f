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
    if (
        config.pallas_enabled()
        and config.PALLAS_CHOL_MAX_N < n
        and a.dtype == jnp.float32
    ):
        from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
            BLOCKED_MAX_N,
            blocked_cholesky,
        )

        if n <= BLOCKED_MAX_N:
            return blocked_cholesky(a)
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


# ---------------------------------------------------------------------------
# Fully-unrolled factorization for tiny N: XLA lowers cholesky/triangular-
# solve HLOs to while-loops whose fixed overhead dwarfs the O(N^3) arithmetic
# at N <= ~8. Unrolling to plain expressions lets XLA fuse the whole GP MLL
# into one kernel; under vmap each scalar step becomes a [batch]-wide VPU op.
# Autodiff flows through the expressions directly (no custom VJP needed).
# ---------------------------------------------------------------------------

UNROLL_MAX_N = 8


def unrolled_cholesky(a):
    """Cholesky of [..., N, N] for small static N via unrolled Banachiewicz."""
    n = a.shape[-1]
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = a[..., i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    zero = jnp.zeros_like(a[..., 0, 0])
    rows = [
        jnp.stack([L[i][j] if j <= i else zero for j in range(n)], axis=-1)
        for i in range(n)
    ]
    return jnp.stack(rows, axis=-2)


def unrolled_solve_lower(L, b):
    """Solve L x = b (L lower-triangular [..., N, N], b [..., N]), unrolled."""
    n = b.shape[-1]
    x = []
    for i in range(n):
        s = b[..., i]
        for k in range(i):
            s = s - L[..., i, k] * x[k]
        x.append(s / L[..., i, i])
    return jnp.stack(x, axis=-1)


def unrolled_solve_lower_T(L, b):
    """Solve L^T x = b (back-substitution on the transposed lower factor)."""
    n = b.shape[-1]
    x = [None] * n
    for i in reversed(range(n)):
        s = b[..., i]
        for k in range(i + 1, n):
            s = s - L[..., k, i] * x[k]
        x[i] = s / L[..., i, i]
    return jnp.stack(x, axis=-1)


def unrolled_solve_lower_mat(L, B):
    """Solve L X = B for UNBATCHED L [N, N] and matrix RHS B [N, M]
    (vmap supplies any batch axes at the call sites)."""
    Xt = unrolled_solve_lower(L, jnp.swapaxes(B, -1, -2))  # rows as batch
    return jnp.swapaxes(Xt, -1, -2)


def safe_cholesky(K, jitters=(1e-6, 1e-4, 1e-2), relative=False):
    """Cholesky with escalating diagonal jitter (gpytorch psd_safe_cholesky
    semantics, reference fallback: GPR_meta_mlap.py:439-448), jit-compatible.

    The jitter *selection* runs on a stop-gradient copy so the picked level is
    a constant w.r.t. autodiff and no NaN from failed trial factorizations can
    leak into the backward pass; the returned factor is a single clean
    cholesky at the selected jitter.

    relative=True scales the jitter levels by mean(diag(K)) — needed when the
    matrix scale is data-dependent (e.g. mixture-component predictive
    covariances whose f32 cancellation error grows with the diagonal).
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    K_nd = jax.lax.stop_gradient(K)
    if relative:
        scale = jnp.mean(jnp.diagonal(K_nd, axis1=-2, axis2=-1))
        scale = jnp.maximum(jax.lax.stop_gradient(scale), 1e-12)
    else:
        scale = jnp.asarray(1.0, K.dtype)

    def ok(j):
        L = _cholesky_impl(K_nd + j * scale * eye)
        d = jnp.diagonal(L, axis1=-2, axis2=-1)
        return jnp.all(jnp.isfinite(d)) & jnp.all(d > 0)

    jitter = jnp.asarray(jitters[-1], K.dtype)
    for j in reversed(jitters[:-1]):
        jitter = jnp.where(ok(j), jnp.asarray(j, K.dtype), jitter)
    return cholesky(K + jitter * scale * eye)
