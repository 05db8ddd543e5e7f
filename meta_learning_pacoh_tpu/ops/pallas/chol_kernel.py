"""Pallas TPU kernel: in-VMEM Cholesky factorization for small/medium N.

This is the native compute kernel that owns the role gpytorch's C++/CUDA
LazyTensor Cholesky plays for the reference (the O(N^3) op inside every exact
marginal-log-likelihood evaluation, reference: meta_learn/GPR_meta_mll.py:111-113
via gpytorch ExactMarginalLogLikelihood).

Design: a right-looking (outer-product) factorization expressed entirely as
full-matrix VPU ops — no dynamic row/column slicing, which TPUs dislike.
Each of the N steps extracts the pivot with a mask-reduce, scales column j,
and applies a rank-1 Schur update to the trailing block:

    for j in 0..N-1:
        p      = rsqrt(A[j, j])
        col    = A[:, j] * p            (rows >= j)
        A     -= trail(col) trail(col)^T  (rows, cols > j)
        A[:, j] = col

The whole matrix lives in VMEM/registers; the fori_loop carries it as a
value. For the meta-learning workloads here (N = 5..512 context points,
batched over tasks x particles via vmap -> kernel grid) this keeps every
factorization on-chip with zero HBM traffic between steps.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu  # noqa: F401  (memory spaces)

from meta_learning_pacoh_tpu import config


def _chol_body(A, rows, cols):
    n = A.shape[0]

    def step(j, A):
        jj = jnp.sum(jnp.where((rows == j) & (cols == j), A, 0.0))
        inv_p = jax.lax.rsqrt(jj)
        # column j of the partially-factored matrix, scaled by 1/sqrt(pivot)
        col = jnp.sum(jnp.where(cols == j, A, 0.0), axis=1, keepdims=True) * inv_p
        col = jnp.where(rows[:, :1] >= j, col, 0.0)  # [N, 1]
        trail = jnp.where(rows[:, :1] > j, col, 0.0)
        A = A - trail * trail.reshape(1, n)  # rank-1 Schur update (VPU broadcast)
        A = jnp.where(cols == j, col, A)  # write final column j
        return A

    A = jax.lax.fori_loop(0, n, step, A)
    return jnp.where(rows >= cols, A, 0.0)


def _chol_kernel(a_ref, l_ref):
    A = a_ref[...]
    n = A.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    l_ref[...] = _chol_body(A.reshape(n, n), rows, cols).reshape(A.shape)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_single(a, interpret=False):
    n = a.shape[-1]
    return pl.pallas_call(
        _chol_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=max(1, n**3 // 3), bytes_accessed=2 * n * n * 4, transcendentals=n
        ),
        interpret=interpret,
    )(a)


def cholesky_pallas(a):
    """Cholesky of PSD matrix/matrices [..., N, N] via the Pallas TPU kernel.

    Leading batch axes are flattened into the kernel grid (pallas_call's
    batching rule handles vmap-introduced axes the same way).
    """
    interpret = config.pallas_interpret()
    if a.ndim == 2:
        return _chol_single(a, interpret=interpret)
    batch_shape = a.shape[:-2]
    n = a.shape[-1]
    flat = a.reshape((-1, n, n))
    out = jax.vmap(lambda m: _chol_single(m, interpret=interpret))(flat)
    return out.reshape(batch_shape + (n, n))
