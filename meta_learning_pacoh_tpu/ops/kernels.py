"""Covariance-kernel primitives for the exact-GP engine.

Semantics match the reference's squared-exponential kernels: gpytorch's
`ScaleKernel(RBFKernel(ard))` on the PACOH-MAP path (reference:
meta_learn/GPR_meta_mll.py:218) and the batch-friendly `SEKernelLight`
(output_scale fixed to 1) on the SVGD/VI path (reference:
meta_learn/models.py:418-446, meta_learn/random_gp.py:69-74):

    k(x1, x2) = outputscale * exp(-0.5 * sum_d ((x1_d - x2_d) / ls_d)^2)

All functions are shape-polymorphic pure functions built from matmuls so XLA
maps the pairwise-distance contraction onto the MXU.
"""

import jax.numpy as jnp
import jax.nn


def softplus(x):
    return jax.nn.softplus(x)


def inv_softplus(y):
    """Inverse of softplus, for initializing raw parameters from constrained values."""
    y = jnp.asarray(y)
    return jnp.where(y > 20.0, y, jnp.log(jnp.expm1(jnp.clip(y, 1e-8, 20.0))))


def sq_dists(x1, x2):
    """Pairwise squared Euclidean distances.

    x1: [..., N, D], x2: [..., M, D] -> [..., N, M]

    Uses the |a|^2 + |b|^2 - 2ab expansion: the cross term is one batched
    matmul (MXU-friendly), the norms are cheap VPU reductions.
    """
    x1_sq = jnp.sum(x1 * x1, axis=-1)[..., :, None]
    x2_sq = jnp.sum(x2 * x2, axis=-1)[..., None, :]
    cross = jnp.einsum("...nd,...md->...nm", x1, x2)
    return jnp.maximum(x1_sq + x2_sq - 2.0 * cross, 0.0)


def rbf_ard(x1, x2, lengthscale, outputscale=1.0):
    """ARD squared-exponential kernel.

    x1: [..., N, D], x2: [..., M, D], lengthscale: [..., D] or scalar.
    Returns [..., N, M].
    """
    ls = jnp.asarray(lengthscale)
    if ls.ndim > 0:
        ls = ls[..., None, :]  # broadcast over the points axis
    d2 = sq_dists(x1 / ls, x2 / ls) if ls.ndim > 0 else sq_dists(x1 / ls, x2 / ls)
    return outputscale * jnp.exp(-0.5 * d2)


def rbf_ard_diag(x, lengthscale, outputscale=1.0):
    """Diagonal of rbf_ard(x, x, ...): constant = outputscale. x: [..., N, D]."""
    return jnp.broadcast_to(jnp.asarray(outputscale), x.shape[:-1])
