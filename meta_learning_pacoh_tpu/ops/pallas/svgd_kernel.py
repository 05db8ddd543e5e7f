"""Pallas TPU kernel: fused SVGD particle update (pairwise RBF + transport).

Fuses the whole Stein update (reference: meta_learn/svgd.py:12-28 — pairwise
squared distances, median-heuristic bandwidth, kernel matrix, kernel gradient,
and phi) into ONE kernel: everything stays VMEM-resident between the two MXU
matmuls, with no HBM round-trips for the [K, K] kernel matrix or the [K, P]
kernel-gradient intermediate.

    d2      = |x_i|^2 + |x_j|^2 - 2 x_i.x_j          (MXU: X @ X^T)
    gamma   = 1 / (1e-8 + median(d2) / log(K+1))     (median via in-kernel
                                                      bisection counting)
    K_xx    = exp(-gamma * d2)
    phi     = (K_xx @ score + 2 gamma (X * rowsum(K_xx) - K_xx @ X)) / K

The median is computed by ~30 rounds of value-bisection counting on the
[K, K] distance matrix (pure VPU reductions) — bitonic sorts don't map to the
TPU vector unit; the bisected median converges to the true order statistic to
~1e-7 relative, and (unlike numpy) takes the lower-middle element rather than
midpoint-averaging for even K^2. Verified against the jnp reference
implementation in tests/test_svgd_kernel.py.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401

from meta_learning_pacoh_tpu import config


def _svgd_kernel(x_ref, s_ref, phi_ref, *, log_kp1):
    X = x_ref[...]  # [K, P]
    S = s_ref[...]
    k = X.shape[0]

    XX = jnp.dot(X, X.T, preferred_element_type=jnp.float32)  # [K, K]
    sq = jnp.diagonal(XX)[:, None]  # stay 2-D for the VPU
    d2 = jnp.maximum(sq + sq.reshape(1, k) - 2.0 * XX, 0.0)

    # median(d2) over all K^2 entries via bisection counting
    n_half = (k * k) // 2  # rank of the upper-middle element (0-indexed count)

    def bisect(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d2 <= mid).astype(jnp.float32))
        take_low = cnt > n_half  # enough mass below -> median is <= mid
        lo = jnp.where(take_low, lo, mid)
        hi = jnp.where(take_low, mid, hi)
        return lo, hi

    lo0 = jnp.min(d2)
    hi0 = jnp.max(d2)
    lo, hi = jax.lax.fori_loop(0, 30, bisect, (lo0, hi0))
    median = 0.5 * (lo + hi)

    h = median / (2.0 * log_kp1)
    gamma = 1.0 / (1e-8 + 2.0 * h)

    K_xx = jnp.exp(-gamma * d2)
    row_sum = jnp.sum(K_xx, axis=1, keepdims=True)  # [K, 1]
    KS = jnp.dot(K_xx, S, preferred_element_type=jnp.float32)
    KX = jnp.dot(K_xx, X, preferred_element_type=jnp.float32)
    phi_ref[...] = (KS + 2.0 * gamma * (X * row_sum - KX)) / k


@functools.partial(jax.jit, static_argnames=("interpret",))
def _svgd_phi_call(x, s, interpret=False):
    k, p = x.shape
    return pl.pallas_call(
        functools.partial(_svgd_kernel, log_kp1=math.log(k + 1)),
        out_shape=jax.ShapeDtypeStruct((k, p), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * k * p * 3 + 30 * k * k,
            bytes_accessed=3 * k * p * 4,
            transcendentals=k * k,
        ),
        interpret=interpret,
    )(x, s)


def svgd_phi_fused(particles, score):
    """phi for the RBF/median-heuristic case, fully fused on TPU."""
    return _svgd_phi_call(particles, score, interpret=config.pallas_interpret())
