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


def _chol_lanes_kernel(a_ref, l_ref):
    """Factorize a whole block of matrices AT ONCE with the batch riding the
    TPU lane dimension: layout [N, N, B], so every step of the right-looking
    factorization is a [N, N, B] VPU op across all B matrices simultaneously
    (the single-matrix kernel above serializes the batch over the grid, which
    loses badly to XLA's vectorized batched factorization)."""
    A = a_ref[...]  # [B, N, N]
    b, n = A.shape[0], A.shape[-1]
    At = jnp.transpose(A, (1, 2, 0))  # [N, N, B]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    rows_c = rows[:, :1, :]  # [N, 1, 1]

    def step(j, M):
        pivot = jnp.sum(jnp.where((rows == j) & (cols == j), M, 0.0),
                        axis=(0, 1), keepdims=True)  # [1, 1, B]
        inv_p = jax.lax.rsqrt(pivot)
        col = jnp.sum(jnp.where(cols == j, M, 0.0), axis=1, keepdims=True) * inv_p
        col = jnp.where(rows_c >= j, col, 0.0)  # [N, 1, B]
        trail = jnp.where(rows_c > j, col, 0.0)
        M = M - trail * jnp.transpose(trail, (1, 0, 2))  # rank-1, all lanes
        M = jnp.where(cols == j, col, M)
        return M

    Mf = jax.lax.fori_loop(0, n, step, At)
    Mf = jnp.where(rows >= cols, Mf, 0.0)
    l_ref[...] = jnp.transpose(Mf, (2, 0, 1))


# Per-program batch block: 128 matrices ride the 128 lanes exactly.
_LANE_BLOCK = 128
# Above this N the [N, N, 128] working set outgrows VMEM.
_LANES_MAX_N = 64


@functools.partial(jax.jit, static_argnames=("interpret",))
def _chol_batched(a, interpret=False):
    b, n = a.shape[0], a.shape[-1]
    grid = (pl.cdiv(b, _LANE_BLOCK),)
    return pl.pallas_call(
        _chol_lanes_kernel,
        out_shape=jax.ShapeDtypeStruct(a.shape, a.dtype),
        grid=grid,
        in_specs=[pl.BlockSpec((_LANE_BLOCK, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_LANE_BLOCK, n, n), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=max(1, b * n**3 // 3), bytes_accessed=2 * b * n * n * 4,
            transcendentals=b * n,
        ),
        interpret=interpret,
    )(a)


def cholesky_pallas(a):
    """Cholesky of PSD matrix/matrices [..., N, N] via Pallas TPU kernels.

    Batched inputs use the lane-parallel kernel (all matrices factored
    simultaneously); single matrices use the in-VMEM single kernel.
    """
    interpret = config.pallas_interpret()
    if a.ndim == 2:
        return _chol_single(a, interpret=interpret)
    batch_shape = a.shape[:-2]
    n = a.shape[-1]
    flat = a.reshape((-1, n, n))
    if n <= _LANES_MAX_N:
        out = _chol_batched(flat, interpret=interpret)
    else:
        out = jax.vmap(lambda m: _chol_single(m, interpret=interpret))(flat)
    return out.reshape(batch_shape + (n, n))
