"""Stein Variational Gradient Descent: kernels and the particle update.

Semantics match the reference SVGD engine (reference: meta_learn/svgd.py):

    phi = (K_XX @ score + grad_K) / K
    grad_K_i = -sum_j d/dx_i k(x_i, x_j)   (bandwidth treated as a constant)

with the RBF kernel's median-heuristic bandwidth computed over *all* K^2
pairwise squared distances, h = median(d2) / (2 log(K+1)), gamma =
1 / (1e-8 + 2 h) (reference: meta_learn/svgd.py:44-51), and the IMQ kernel's
per-dimension median over strictly-upper-triangular pairs
(reference: meta_learn/svgd.py:75-86).

Unlike the reference, the kernel gradient is analytic (no autodiff through
the kernel), so the whole update is two batched matmuls plus elementwise ops
— one XLA fusion, and a single Pallas kernel on the TPU fast path.
"""

import math

import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.ops.kernels import sq_dists


def rbf_median_gamma(d2):
    """gamma = 1/(1e-8 + 2h), h = median(d2)/(2 log(K+1)). d2: [K, K]."""
    k = d2.shape[0]
    h = jnp.median(d2) / (2.0 * math.log(k + 1))
    return 1.0 / (1e-8 + 2.0 * h)


def rbf_phi(particles, score, bandwidth=None):
    """SVGD update direction with the RBF kernel.

    particles, score: [K, P]. Returns phi [K, P].
    """
    k = particles.shape[0]
    d2 = sq_dists(particles, particles)
    if bandwidth is None:
        gamma = jax.lax.stop_gradient(rbf_median_gamma(d2))
    else:
        gamma = 1.0 / (1e-8 + 2.0 * bandwidth**2)
    K_xx = jnp.exp(-gamma * d2)
    # grad_K_i = 2 gamma * (x_i * sum_j k_ij - sum_j k_ij x_j)
    row_sum = jnp.sum(K_xx, axis=1, keepdims=True)
    grad_K = 2.0 * gamma * (particles * row_sum - K_xx @ particles)
    return (K_xx @ score + grad_K) / k


def imq_phi(particles, score, alpha=0.5, beta=-0.5, bandwidth=None):
    """SVGD update direction with the IMQ Stein kernel.

    k(x, y) = (alpha + sum_d (x_d - y_d)^2 / h_d)^beta, per-dim bandwidth.
    particles, score: [K, P]. Returns phi [K, P].
    """
    k, p = particles.shape
    diffs = particles[:, None, :] - particles[None, :, :]  # [K, K, P]
    norm_sq = diffs**2
    if bandwidth is None:
        iu, ju = jnp.triu_indices(k, k=1)
        off_diag = norm_sq[iu, ju, :]  # [K(K-1)/2, P]
        h = jnp.median(off_diag, axis=0) / math.log(k + 1)  # [P]
        h = jax.lax.stop_gradient(h)
    else:
        h = jnp.broadcast_to(jnp.asarray(bandwidth, particles.dtype), (p,))
    base = alpha + jnp.sum(norm_sq / h, axis=-1)  # [K, K]
    K_xx = base**beta
    # d/dx_i k_ij = beta * base^(beta-1) * 2 (x_i - x_j)_d / h_d ; grad_K = -sum_j
    w = beta * base ** (beta - 1.0)  # [K, K]
    grad_K = -2.0 * jnp.einsum("ij,ijd->id", w, diffs) / h
    return (K_xx @ score + grad_K) / k


def svgd_phi(particles, score, kernel="RBF", bandwidth=None):
    if kernel == "RBF":
        if bandwidth is None:
            from meta_learning_pacoh_tpu import config

            if config.pallas_enabled():
                from meta_learning_pacoh_tpu.ops.pallas.svgd_kernel import (
                    svgd_phi_fused,
                )

                return svgd_phi_fused(particles, score)
        return rbf_phi(particles, score, bandwidth=bandwidth)
    elif kernel == "IMQ":
        return imq_phi(particles, score, bandwidth=bandwidth)
    raise NotImplementedError(f"unknown SVGD kernel {kernel!r}")
