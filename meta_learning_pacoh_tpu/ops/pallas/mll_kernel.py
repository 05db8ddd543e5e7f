"""Pallas TPU kernel: fused batched GP marginal-likelihood core with custom VJP.

This is the north-star native op (BASELINE.json): the quadratic form and
log-determinant of B independent N x N systems — the O(N^3) heart of every
exact-GP marginal likelihood — computed in ONE kernel launch per direction,
with the batch riding the 128-lane dimension:

  forward:   L = chol(Kn)  (three jitter levels factored in-kernel, first
             finite one selected PER LANE — the jit-compatible analogue of
             gpytorch's psd_safe escalation)
             z = L^{-1} r                      (lane-wide forward substitution)
             quad = |z|^2,  logdet = 2 sum log diag L
  backward:  alpha = L^{-T} z                  (lane-wide back substitution)
             W = L^{-1}                        (lane-wide triangular inverse)
             dKn = gl * (W^T W) - gq * alpha alpha^T,   dr = 2 gq * alpha

XLA lowers each cholesky / triangular-solve to while-loop HLOs whose fixed
cost dominates at small-to-moderate N; this kernel replaces ~6 of those per
MLL evaluation with 2 launches for the whole [B, N, N] batch. Used for
9 <= N <= 48 (below: fully-unrolled jnp expressions win; above: VMEM).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meta_learning_pacoh_tpu import config

_LANE_BLOCK = 128
MLL_KERNEL_MIN_N = 9
MLL_KERNEL_MAX_N = 48  # N=64 exceeds the 16M VMEM scoped limit (3 jitter factors resident)
_JITTERS = (0.0, 1e-4, 1e-2)


def _lane_chol(Mt, rows, cols):
    """Right-looking Cholesky on [N, N, B] with the batch in lanes."""
    n = Mt.shape[0]
    rows_c = rows[:, :1, :]

    def step(j, M):
        pivot = jnp.sum(jnp.where((rows == j) & (cols == j), M, 0.0),
                        axis=(0, 1), keepdims=True)  # [1,1,B]
        inv_p = jax.lax.rsqrt(pivot)
        col = jnp.sum(jnp.where(cols == j, M, 0.0), axis=1, keepdims=True) * inv_p
        col = jnp.where(rows_c >= j, col, 0.0)
        trail = jnp.where(rows_c > j, col, 0.0)
        M = M - trail * jnp.transpose(trail, (1, 0, 2))
        M = jnp.where(cols == j, col, M)
        return M

    Mf = jax.lax.fori_loop(0, n, step, Mt)
    return jnp.where(rows >= cols, Mf, 0.0)


def _row3(M, i, rows):
    """Row i of [N, N, B] -> [N, 1, B] (mask-reduce, rank-preserving: Mosaic
    does not support rank-reducing reductions on 3-D vectors)."""
    r = jnp.sum(jnp.where(rows == i, M, 0.0), axis=0, keepdims=True)  # [1, N, B]
    return jnp.transpose(r, (1, 0, 2))  # [N, 1, B]


def _col3(M, i, cols):
    """Column i of [N, N, B] -> [N, 1, B]."""
    return jnp.sum(jnp.where(cols == i, M, 0.0), axis=1, keepdims=True)


def _solve_lower(L, b, rows, k3):
    """z = L^{-1} b; b, z: [N, 1, B]; lane-wide forward substitution."""
    n = b.shape[0]

    def step(i, z):
        row_i = _row3(L, i, rows)  # [N, 1, B]
        s = jnp.sum(jnp.where(k3 < i, row_i * z, 0.0), axis=0, keepdims=True)
        b_i = jnp.sum(jnp.where(k3 == i, b, 0.0), axis=0, keepdims=True)
        L_ii = jnp.sum(jnp.where(k3 == i, row_i, 0.0), axis=0, keepdims=True)
        z_i = (b_i - s) / L_ii  # [1, 1, B]
        return jnp.where(k3 == i, z_i, z)

    return jax.lax.fori_loop(0, n, step, jnp.zeros_like(b))


def _solve_lower_T(L, b, cols, k3):
    """alpha = L^{-T} b; b, alpha: [N, 1, B]; lane-wide back substitution."""
    n = b.shape[0]

    def step(t, a):
        i = n - 1 - t
        col_i = _col3(L, i, cols)  # [N, 1, B]: entries L[k, i]
        s = jnp.sum(jnp.where(k3 > i, col_i * a, 0.0), axis=0, keepdims=True)
        b_i = jnp.sum(jnp.where(k3 == i, b, 0.0), axis=0, keepdims=True)
        L_ii = jnp.sum(jnp.where(k3 == i, col_i, 0.0), axis=0, keepdims=True)
        a_i = (b_i - s) / L_ii
        return jnp.where(k3 == i, a_i, a)

    return jax.lax.fori_loop(0, n, step, jnp.zeros_like(b))


def _mll_fwd_kernel(kn_ref, r_ref, quad_ref, logdet_ref, l_ref, z_ref):
    Kt = jnp.transpose(kn_ref[...], (1, 2, 0))  # [N, N, B]
    n = Kt.shape[0]
    rt = jnp.transpose(r_ref[...], (1, 0))[:, None, :]  # [N, 1, B]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    k3 = rows[:, :1, :]  # [N, 1, 1]
    eye_t = jnp.where(rows == cols, 1.0, 0.0)

    def diag_ok(L):
        d = jnp.sum(jnp.where(rows == cols, L, 0.0), axis=1, keepdims=True)  # [N,1,B]
        fin = (jnp.isfinite(d) & (d > 0.0)).astype(jnp.float32)
        return jnp.min(fin, axis=0, keepdims=True) > 0.5  # [1, 1, B]

    # single-factorization fast path: jitter escalation (gpytorch psd-safe
    # semantics, levels 0 -> 1e-4 -> 1e-2 per lane) only runs in the rare
    # pl.when branch where some lane's no-jitter factorization failed
    # (pl.when is real predication; a value-level lax.cond would lower to a
    # both-branches select and factor all levels unconditionally)
    L0 = _lane_chol(Kt, rows, cols)
    ok0 = diag_ok(L0)
    l_ref[...] = jnp.transpose(L0, (2, 0, 1))

    @pl.when(jnp.min(ok0.astype(jnp.float32)) < 0.5)
    def _():
        L1 = _lane_chol(Kt + _JITTERS[1] * eye_t, rows, cols)
        L2 = _lane_chol(Kt + _JITTERS[2] * eye_t, rows, cols)
        Lsel = jnp.where(ok0, L0, jnp.where(diag_ok(L1), L1, L2))
        l_ref[...] = jnp.transpose(Lsel, (2, 0, 1))

    L = jnp.transpose(l_ref[...], (1, 2, 0))

    z = _solve_lower(L, rt, rows, k3)  # [N, 1, B]
    quad = jnp.sum(z * z, axis=0, keepdims=True)  # [1, 1, B]
    diag = jnp.sum(jnp.where(rows == cols, L, 0.0), axis=1, keepdims=True)  # [N,1,B]
    logdet = 2.0 * jnp.sum(jnp.log(diag), axis=0, keepdims=True)  # [1, 1, B]

    quad_ref[...] = jnp.transpose(quad[0], (1, 0))  # [B, 1]
    logdet_ref[...] = jnp.transpose(logdet[0], (1, 0))
    # l_ref already holds the selected factor (written in the fast path /
    # escalation branch above)
    z_ref[...] = jnp.transpose(z[:, 0, :], (1, 0))


def _mll_bwd_kernel(l_ref, z_ref, gq_ref, gl_ref, dkn_ref, dr_ref):
    L = jnp.transpose(l_ref[...], (1, 2, 0))  # [N, N, B]
    n = L.shape[0]
    z = jnp.transpose(z_ref[...], (1, 0))[:, None, :]  # [N, 1, B]
    gq = jnp.transpose(gq_ref[...], (1, 0))[None, :, :]  # [1, 1, B]
    gl = jnp.transpose(gl_ref[...], (1, 0))[None, :, :]
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
    k3 = rows[:, :1, :]

    alpha = _solve_lower_T(L, z, cols, k3)  # [N, 1, B]

    # W = L^{-1} row by row:
    #   W[i, :, :] = (e_i - sum_{k<i} L[i,k] W[k, :, :]) / L[i,i]
    eye_t = jnp.where(rows == cols, 1.0, 0.0)

    def w_step(i, W):
        L_row = _row3(L, i, rows)  # [N, 1, B] entries L[i, k]
        contrib = jnp.sum(jnp.where(rows < i, L_row * W, 0.0),
                          axis=0, keepdims=True)  # [1, N, B]
        e_i = jnp.sum(jnp.where(rows == i, eye_t, 0.0), axis=0, keepdims=True)
        L_ii = jnp.sum(jnp.where(k3 == i, L_row, 0.0), axis=0, keepdims=True)
        w_i = (e_i - contrib) / L_ii  # [1, N, B]
        return jnp.where(rows == i, w_i, W)

    W = jax.lax.fori_loop(0, n, w_step, jnp.zeros_like(L))  # rows of L^{-1}

    # Kinv = W^T W: accumulate outer products of W's rows
    def kinv_step(k, acc):
        w_k = _row3(W, k, rows)  # [N, 1, B]
        return acc + w_k * jnp.transpose(w_k, (1, 0, 2))

    Kinv = jax.lax.fori_loop(0, n, kinv_step, jnp.zeros_like(L))

    outer = alpha * jnp.transpose(alpha, (1, 0, 2))  # [N, N, B]
    dKn = gl * Kinv - gq * outer
    dr = 2.0 * gq * alpha  # [N, 1, B]

    dkn_ref[...] = jnp.transpose(dKn, (2, 0, 1))
    dr_ref[...] = jnp.transpose(dr[:, 0, :], (1, 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mll_fwd_call(kn, r, interpret=False):
    b, n = kn.shape[0], kn.shape[-1]
    grid = (pl.cdiv(b, _LANE_BLOCK),)
    specs = dict(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mll_fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_LANE_BLOCK, n, n), lambda i: (i, 0, 0), **specs),
            pl.BlockSpec((_LANE_BLOCK, n), lambda i: (i, 0), **specs),
        ],
        out_specs=(
            pl.BlockSpec((_LANE_BLOCK, 1), lambda i: (i, 0), **specs),
            pl.BlockSpec((_LANE_BLOCK, 1), lambda i: (i, 0), **specs),
            pl.BlockSpec((_LANE_BLOCK, n, n), lambda i: (i, 0, 0), **specs),
            pl.BlockSpec((_LANE_BLOCK, n), lambda i: (i, 0), **specs),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, 1), kn.dtype),
            jax.ShapeDtypeStruct((b, 1), kn.dtype),
            jax.ShapeDtypeStruct((b, n, n), kn.dtype),
            jax.ShapeDtypeStruct((b, n), kn.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=b * n**3, bytes_accessed=3 * b * n * n * 4, transcendentals=3 * b * n,
        ),
        interpret=interpret,
    )(kn, r)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _mll_bwd_call(L, z, gq, gl, interpret=False):
    b, n = L.shape[0], L.shape[-1]
    grid = (pl.cdiv(b, _LANE_BLOCK),)
    specs = dict(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _mll_bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_LANE_BLOCK, n, n), lambda i: (i, 0, 0), **specs),
            pl.BlockSpec((_LANE_BLOCK, n), lambda i: (i, 0), **specs),
            pl.BlockSpec((_LANE_BLOCK, 1), lambda i: (i, 0), **specs),
            pl.BlockSpec((_LANE_BLOCK, 1), lambda i: (i, 0), **specs),
        ],
        out_specs=(
            pl.BlockSpec((_LANE_BLOCK, n, n), lambda i: (i, 0, 0), **specs),
            pl.BlockSpec((_LANE_BLOCK, n), lambda i: (i, 0), **specs),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n, n), L.dtype),
            jax.ShapeDtypeStruct((b, n), L.dtype),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n**3, bytes_accessed=4 * b * n * n * 4, transcendentals=0,
        ),
        interpret=interpret,
    )(L, z, gq, gl)


@jax.custom_vjp
def mll_quad_logdet(kn, r):
    """(quad, logdet) of B independent GP systems. kn [B, N, N], r [B, N].

    quad = r^T Kn^{-1} r, logdet = log |Kn|; per-lane jitter escalation
    (0, 1e-4, 1e-2) applied inside the kernel.
    """
    quad, logdet, _, _ = _mll_fwd_call(kn, r, interpret=config.pallas_interpret())
    return quad[:, 0], logdet[:, 0]


def _mll_fwd_rule(kn, r):
    quad, logdet, L, z = _mll_fwd_call(kn, r, interpret=config.pallas_interpret())
    return (quad[:, 0], logdet[:, 0]), (L, z)


def _mll_bwd_rule(res, g):
    L, z = res
    gq, gl = g
    dkn, dr = _mll_bwd_call(
        L, z, gq[:, None], gl[:, None], interpret=config.pallas_interpret()
    )
    return dkn, dr


mll_quad_logdet.defvjp(_mll_fwd_rule, _mll_bwd_rule)
