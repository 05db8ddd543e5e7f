"""Variational-GP building blocks: Gaussian KL, expected log-likelihood,
and the sparse-GP predictive.

These own the roles gpytorch's VariationalStrategy/CholeskyVariationalDistribution
play for the reference (meta_learn/models.py:545-601, GPR_pac.py:89-152,
GPR_meta_mlap.py:247-355), in a single coherent *unwhitened* parameterization:
q(f) = N(m, L L^T) directly over the latent function at the train/context
points. (The reference mixes whitened and unwhitened conventions across its
meta-train and meta-test paths; here both use the same math.)
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from meta_learning_pacoh_tpu.ops.chol import cholesky, safe_cholesky

_LOG_2PI = math.log(2.0 * math.pi)


def _kl_factorize(m0, L0, m1, K1, jitter):
    """Shared forward core: jitter-select + factorize + whitened residuals.

    Returns (kl, L1, M, d) with L1 = chol(K1 + j*I), M = L1^{-1} L0,
    d = L1^{-1} (m1 - m0)."""
    from meta_learning_pacoh_tpu.ops.chol import (
        UNROLL_MAX_N, unrolled_cholesky, unrolled_solve_lower,
        unrolled_solve_lower_mat,
    )

    n = m0.shape[-1]
    if n <= UNROLL_MAX_N:
        K_nd = jax.lax.stop_gradient(K1)
        eye = jnp.eye(n, dtype=K1.dtype)

        def ok(j):
            d = jnp.diagonal(unrolled_cholesky(K_nd + j * eye))
            return jnp.all(jnp.isfinite(d)) & jnp.all(d > 0)

        jit_sel = jnp.where(ok(jitter), jitter, jnp.where(ok(1e-4), 1e-4, 1e-2))
        L1 = unrolled_cholesky(K1 + jit_sel * eye)
        M = unrolled_solve_lower_mat(L1, L0)
        d = unrolled_solve_lower(L1, m1 - m0)
    else:
        L1 = safe_cholesky(K1, jitters=(jitter, 1e-4, 1e-2))
        M = solve_triangular(L1, L0, lower=True)  # L1^{-1} L0
        d = solve_triangular(L1, (m1 - m0)[:, None], lower=True)[:, 0]
    trace = jnp.sum(M * M)
    quad = jnp.sum(d * d)
    logdet1 = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L1)))
    logdet0 = 2.0 * jnp.sum(jnp.log(jnp.abs(jnp.diagonal(L0)) + 1e-12))
    kl = 0.5 * (trace + quad - n + logdet1 - logdet0)
    return kl, L1, M, d


def _solve_upper_from_lower(L1, B):
    """Solve L1^T X = B for matrix B [N, M] (L1 lower). Static-shape dispatch
    mirrors _kl_factorize: unrolled back-substitution for small N."""
    from meta_learning_pacoh_tpu.ops.chol import (
        UNROLL_MAX_N, unrolled_solve_lower_T,
    )

    if L1.shape[-1] <= UNROLL_MAX_N:
        return jnp.swapaxes(
            unrolled_solve_lower_T(L1, jnp.swapaxes(B, -1, -2)), -1, -2)
    return solve_triangular(L1, B, lower=True, trans=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def gaussian_kl_chol(m0, L0, m1, K1, jitter=1e-6):
    """KL( N(m0, L0 L0^T) || N(m1, K1) ). m0, m1: [N]; L0: [N, N] lower;
    K1: [N, N] PSD. Returns scalar.

    Closed-form custom VJP: with P = (K1 + j*I)^{-1} and d = m1 - m0,

        dKL/dm0 = -P d            dKL/dm1 = +P d
        dKL/dK1 = 0.5 (P - P S0 P - (P d)(P d)^T),   S0 = L0 L0^T
        dKL/dL0 = P L0 - diag(sign(l_ii) / (|l_ii| + 1e-12))

    so the backward pass is two triangular solves instead of autodiff
    through the (unrolled) Cholesky + jitter-selection graph — this is the
    MLAP inner-KL hot path (reference: GPR_meta_mlap.py:318-355, T x S
    KL terms per step)."""
    kl, _, _, _ = _kl_factorize(m0, L0, m1, K1, jitter)
    return kl


def _gaussian_kl_chol_fwd(m0, L0, m1, K1, jitter):
    kl, L1, M, d = _kl_factorize(m0, L0, m1, K1, jitter)
    return kl, (L1, M, d, jnp.diagonal(L0))


def _gaussian_kl_chol_bwd(jitter, res, g):
    L1, M, d, diag0 = res
    w = _solve_upper_from_lower(L1, d[:, None])[:, 0]      # P (m1 - m0)
    W = _solve_upper_from_lower(L1, M)                     # P L0
    Linv = _solve_upper_from_lower(
        L1, jnp.eye(L1.shape[-1], dtype=L1.dtype))         # L1^{-T}
    P = Linv @ Linv.T                                      # K1j^{-1}
    gm1 = g * w
    gm0 = -gm1
    gK1 = (0.5 * g) * (P - W @ W.T - jnp.outer(w, w))
    gL0 = g * (W - jnp.diag(jnp.sign(diag0) / (jnp.abs(diag0) + 1e-12)))
    return gm0, gL0, gm1, gK1


gaussian_kl_chol.defvjp(_gaussian_kl_chol_fwd, _gaussian_kl_chol_bwd)


def expected_log_prob_gaussian(y, f_mean, f_var, noise_var):
    """E_{f~N(f_mean, f_var)}[ log N(y | f, noise_var) ], elementwise [N].

    Reference formula: meta_learn/models.py:482-487 (GaussianLikelihoodLight).
    """
    return -0.5 * (((y - f_mean) ** 2 + f_var) / noise_var
                   + jnp.log(noise_var) + _LOG_2PI)


def svgp_predict(q_mean, q_chol, mean_c, K_cc, K_ct, mean_t, K_tt, jitter=1e-6):
    """Predictive q(f*) from a variational posterior at the context points.

    q(f_c) = N(q_mean, q_chol q_chol^T); prior mean/cov (mean_c, K_cc) at
    context, (mean_t, K_tt) at test, cross K_ct [Nc, Nt].

        A      = K_cc^{-1} K_ct
        mean*  = mean_t + A^T (q_mean - mean_c)
        cov*   = K_tt - K_tc K_cc^{-1} K_ct + A^T S A
    """
    nc = q_mean.shape[-1]
    L = safe_cholesky(K_cc, jitters=(jitter, 1e-4, 1e-2))
    A = jax.scipy.linalg.cho_solve((L, True), K_ct)  # [Nc, Nt]
    post_mean = mean_t + A.T @ (q_mean - mean_c)
    SA = jnp.tril(q_chol).T @ A  # [Nc, Nt]
    V = solve_triangular(L, K_ct, lower=True)
    post_cov = K_tt - V.T @ V + SA.T @ SA
    return post_mean, post_cov
