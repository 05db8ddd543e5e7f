"""Distributed block-cyclic Cholesky over a mesh axis (the SP/CP analog).

The reference has no sequence axis; its "long context" is the per-task GP
dataset size N, paid as an O(N^3) Cholesky inside every MLL (SURVEY.md §5
long-context row). Single-chip coverage: unrolled (N<=8), lane-parallel
Pallas (N<=64), fused Pallas MLL (N<=48), blocked Pallas (N<=512), XLA above.
This module adds the final tier — a multi-chip right-looking factorization
that shards block-ROWS of the Gram matrix cyclically over a mesh axis so the
O(N^2) memory and O(N^3) update FLOPs split across chips, with the per-step
panel exchanged via XLA collectives (psum broadcast of the diagonal block +
all_gather of the column panel) riding ICI.

Algorithm (right-looking, block size `nb`, D devices, nB = N/nb blocks):
  for k in 0..nB-1:
    owner(k) = k mod D factors the diagonal block  L_kk = chol(A_kk)
    psum-broadcasts L_kk; every device panel-solves its rows  L_ik = A_ik L_kk^-T
    all_gather of the column panel {L_ik}; every device applies the
    full-width symmetric trailing update  A_i,: -= L_ik * panel^T
Full-width row updates keep the trailing matrix symmetric, so only the
lower triangle is ever *read* — no (i, j<=i) bookkeeping inside the loop.

This is deliberately NOT a Pallas kernel: the per-device block math (chol,
triangular solve, GEMM) is large, static-shaped XLA that already maps onto
the MXU; the distribution layer is where a hand-rolled design is needed.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular
from jax.sharding import NamedSharding, PartitionSpec as P
from jax import shard_map


def _block_cyclic_perm(n_blocks, n_dev):
    """Global block order so device d holds blocks d, d+D, ... contiguously."""
    perm = np.concatenate([np.arange(d, n_blocks, n_dev) for d in range(n_dev)])
    inv = np.empty_like(perm)
    inv[perm] = np.arange(n_blocks)
    return perm, inv


def _dist_chol_body(a_loc, *, n_dev, n_blocks, nb, axis_name):
    """Runs per device under shard_map. a_loc: [Lb, nb, N] local block rows."""
    lb = n_blocks // n_dev
    d = jax.lax.axis_index(axis_name)
    gidx = d + n_dev * jnp.arange(lb)  # global block index of each local slot

    for k in range(n_blocks):
        ck = k * nb
        a_col = jax.lax.dynamic_slice_in_dim(a_loc, ck, nb, axis=2)  # [Lb,nb,nb]

        # broadcast the (updated) diagonal block from its owner
        owner, slot = k % n_dev, k // n_dev
        diag = jnp.where(d == owner, a_col[slot], jnp.zeros((nb, nb), a_loc.dtype))
        l_kk = jnp.linalg.cholesky(jax.lax.psum(diag, axis_name))

        # panel solve on every device's rows below the diagonal
        sol = jax.vmap(lambda b: solve_triangular(l_kk, b, lower=True))(
            jnp.swapaxes(a_col, -1, -2))
        l_col = jnp.swapaxes(sol, -1, -2)  # A_ik L_kk^-T
        below = (gidx > k)[:, None, None]
        at_k = (gidx == k)[:, None, None]
        l_col = jnp.where(below, l_col, jnp.where(at_k, l_kk, 0.0))
        a_loc = jax.lax.dynamic_update_slice_in_dim(a_loc, l_col, ck, axis=2)

        if k == n_blocks - 1:
            break

        # gather the column panel and apply the trailing update full-width
        panel = jax.lax.all_gather(
            jnp.where(below, l_col, 0.0), axis_name)  # [D, Lb, nb, nb]
        panel = jnp.moveaxis(panel, 0, 1).reshape(n_blocks, nb, nb)
        tail = panel[k + 1:]  # blocks j > k, global order
        m = tail.shape[0] * nb
        tail_t = jnp.moveaxis(jnp.swapaxes(tail, -1, -2), 0, 1).reshape(nb, m)
        upd = jnp.matmul(jnp.where(below, l_col, 0.0), tail_t)  # [Lb, nb, m]
        trail = jax.lax.dynamic_slice_in_dim(a_loc, ck + nb, m, axis=2)
        a_loc = jax.lax.dynamic_update_slice_in_dim(
            a_loc, trail - upd, ck + nb, axis=2)

    # zero everything right of each row's diagonal block (junk from updates)
    col = jnp.arange(n_blocks * nb)[None, None, :]
    keep = col < ((gidx + 1) * nb)[:, None, None]
    return jnp.where(keep, a_loc, 0.0)


def distributed_cholesky(a, mesh, axis_name="task", block_size=128):
    """Lower Cholesky factor of one [N, N] PSD matrix, computed with block
    rows sharded over `mesh`'s `axis_name` axis.

    For N beyond the single-chip Pallas window this splits both the O(N^2)
    Gram residency and the O(N^3) trailing-update FLOPs across devices.
    Returns the full [N, N] lower factor (replicated). Requires f32 input;
    the caller adds jitter, exactly as with `ops.chol.cholesky`.
    """
    assert a.ndim == 2 and a.shape[0] == a.shape[1], "one square matrix"
    n = a.shape[0]
    n_dev = mesh.shape[axis_name]
    nb = min(block_size, max(8, n))
    step = nb * n_dev
    n_pad = int(np.ceil(n / step) * step)
    n_blocks = n_pad // nb

    if n_pad != n:
        # pad with an identity tail so the factorization stays well-posed
        pad = n_pad - n
        a = jnp.block([
            [a, jnp.zeros((n, pad), a.dtype)],
            [jnp.zeros((pad, n), a.dtype), jnp.eye(pad, dtype=a.dtype)],
        ])

    perm, inv = _block_cyclic_perm(n_blocks, n_dev)
    a_rows = a.reshape(n_blocks, nb, n_pad)[perm]  # block-cyclic row order

    body = functools.partial(
        _dist_chol_body, n_dev=n_dev, n_blocks=n_blocks, nb=nb,
        axis_name=axis_name)
    sharded = shard_map(
        body, mesh=mesh,
        in_specs=P(axis_name),
        out_specs=P(axis_name),
        check_vma=False,
    )
    spec = NamedSharding(mesh, P(axis_name))
    l_rows = sharded(jax.device_put(a_rows, spec))
    l_full = l_rows[inv].reshape(n_pad, n_pad)
    return l_full[:n, :n]


def _distributed_kinv(chol_l, mesh, axis_name):
    """K^-1 from the (replicated) lower factor, with the O(N^3) back-solve
    COLUMN-SHARDED: device d solves K x = e_j for its own slice of identity
    columns (two triangular solves on [N, N/D] RHS, O(N^3/D) FLOPs each),
    and the slices concatenate to the full symmetric inverse. No device ever
    runs the full N-RHS solve the naive `w = L^-1; w.T @ w` would."""
    n = chol_l.shape[0]
    n_dev = mesh.shape[axis_name]
    cols_per = int(np.ceil(n / n_dev))
    n_pad = cols_per * n_dev

    def body(l_loc):
        d = jax.lax.axis_index(axis_name)
        start = d * cols_per
        e = (jnp.arange(n)[:, None]
             == (start + jnp.arange(cols_per))[None, :]).astype(l_loc.dtype)
        x = solve_triangular(l_loc, e, lower=True)
        return solve_triangular(l_loc, x, lower=True, trans=1)

    k_inv = shard_map(
        body, mesh=mesh, in_specs=P(), out_specs=P(None, axis_name),
        check_vma=False,
    )(chol_l)
    return k_inv[:, :n] if n_pad != n else k_inv


def distributed_gp_mll(mean, k_noisy, y, mesh, axis_name="task",
                       block_size=128, n_eff=None):
    """Exact GP marginal log-likelihood (NOT divided by n) for one task whose
    Gram matrix is factored across the mesh via `distributed_cholesky`.

    Reference semantics: gpytorch ExactMarginalLogLikelihood without the /n
    (the callers divide); matches `ops.gp.gp_mll` for the single-matrix case.
    `n_eff` (default: y's length) is the number of REAL points for the
    n·log(2π) constant — pass the mask sum for padded systems whose Gram
    rows/cols were replaced by identity rows (ops.gp.add_noise_masked): those
    rows contribute 0 to the quadratic form and the log-determinant already,
    so only the constant needs the effective count.

    Differentiable: the backward is the closed-form MLL gradient
    (d/dK = 0.5*(aa^T - K^-1) with a = K^-1 (y - mean)). The O(N^3)
    factorization is never repeated or autodiffed through, and the backward's
    own O(N^3) term — building K^-1 — is column-sharded across the same mesh
    axis (`_distributed_kinv`), so backward FLOPs split across devices like
    the forward's trailing updates do.
    """
    if n_eff is None:
        n_eff = float(y.shape[-1])
    n_eff = jnp.asarray(n_eff, dtype=y.dtype)

    @jax.custom_vjp
    def _mll(mean_, k_, y_, n_eff_):
        return _mll_fwd(mean_, k_, y_, n_eff_)[0]

    def _mll_fwd(mean_, k_, y_, n_eff_):
        chol_l = distributed_cholesky(k_, mesh, axis_name, block_size)
        z = solve_triangular(chol_l, (y_ - mean_)[:, None], lower=True)[:, 0]
        logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol_l)))
        mll = -0.5 * (jnp.sum(z * z) + logdet + n_eff_ * jnp.log(2.0 * jnp.pi))
        return mll, (chol_l, z)

    def _mll_bwd(res, g):
        chol_l, z = res
        alpha = solve_triangular(chol_l, z[:, None], lower=True, trans=1)[:, 0]
        k_inv = _distributed_kinv(chol_l, mesh, axis_name)
        dk = 0.5 * (jnp.outer(alpha, alpha) - k_inv)
        return (g * alpha, g * dk, -g * alpha, jnp.zeros_like(g))

    _mll.defvjp(_mll_fwd, _mll_bwd)
    return _mll(mean, k_noisy, y, n_eff)


def distributed_gp_mll_batch(means, ks_noisy, ys, mesh, axis_name="task",
                             block_size=128, n_eff=None):
    """Batched multi-task distributed MLL: B tasks, each an [N, N] system
    factored ACROSS the mesh (matrix parallelism, not task parallelism).

    means, ys: [B, N]; ks_noisy: [B, N, N]; n_eff: [B] real-point counts or
    None. Returns [B] MLLs (NOT divided by n — callers divide, matching
    `distributed_gp_mll`).

    The tasks run SEQUENTIALLY (lax.map): this tier exists for N large enough
    that one Gram matrix is worth sharding over every device, so all chips
    cooperate on one factorization at a time — the opposite regime from the
    task-axis DP sharding in parallel/mesh.py (many small tasks, one per
    device group). Reference analog: the per-task ExactMarginalLogLikelihood
    sum of GPR_meta_mll.py:109-115, for dataset sizes the reference never
    reaches.
    """
    if n_eff is None:
        n_eff = jnp.full(ys.shape[:-1], float(ys.shape[-1]), dtype=ys.dtype)

    def one(args):
        m, k, y, ne = args
        return distributed_gp_mll(m, k, y, mesh, axis_name, block_size,
                                  n_eff=ne)

    return jax.lax.map(one, (means, ks_noisy, ys, n_eff))
