"""Masked exact-GP engine: marginal log-likelihood and posterior conditioning.

This is the numerical core that replaces gpytorch's ExactGP machinery
(reference: meta_learn/models.py:489-538 + gpytorch's ExactMarginalLogLikelihood,
invoked from meta_learn/GPR_meta_mll.py:111-113). Design deltas for TPU:

- Pure functions of (mean-vector, Gram-matrix, targets) with canonical
  *unbatched* shapes; `vmap` supplies the task/particle axes and `pjit`
  shards them. No modules, no caching objects.
- Padding masks make ragged task sets (e.g. Physionet) static-shape: a padded
  point's Gram row/column is replaced by the identity row and its residual by
  zero, so it contributes exactly 0 to both the quadratic form and the
  log-determinant, and the Cholesky factorization of the real block is
  untouched.
- Cholesky goes through `ops.chol.cholesky`, which dispatches to a Pallas
  TPU kernel for batched small-N factorizations and to XLA elsewhere
  (pallas_call has batching rules, so the vmapped axes reach the kernel grid).

Conventions matching the reference numerics:
- `gp_mll` returns the joint Gaussian log-density divided by the number of
  (real) data points — gpytorch's ExactMarginalLogLikelihood scales by
  num_data, and both the PACOH-MAP loss and the RandomGP score functions
  inherit that scale.
- `noise_var` is a *variance* (gpytorch GaussianLikelihood convention).
"""

import contextlib
import math

import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.ops.chol import (
    UNROLL_MAX_N,
    cholesky,
    safe_cholesky,
    unrolled_cholesky,
    unrolled_solve_lower,
)

_LOG_2PI = math.log(2.0 * math.pi)


# ------------------------------------------------- distributed-linalg tier
#
# Final dispatch tier above the blocked Pallas window (BLOCKED_MAX_N = 512):
# with a mesh registered here, `gp_mll`/`gp_mll_batch` route systems with
# N >= min_n through parallel/dist_chol.py — block rows of each Gram matrix
# sharded over the mesh axis, panel exchange via psum/all_gather over ICI
# (SURVEY.md §5 long-context row). Registration is an explicit, scoped
# opt-in (learners activate it around their loss when constructed with
# `mesh=` and large-N data) rather than ambient global state, because
# shard_map cannot nest under vmap: a particle-vmapped score (SVGD/VI)
# must never reach this tier — `_dispatch_ctx` additionally refuses
# batch-traced operands so a stray vmapped call falls back to XLA instead
# of failing.

_DIST_LINALG = None


@contextlib.contextmanager
def distributed_linalg(mesh, axis_name="task", block_size=128, min_n=None):
    """Route large-N Gram factorizations through the distributed tier.

    min_n: smallest N to distribute (default: BLOCKED_MAX_N + 1, i.e. just
    past the single-chip blocked Pallas window; tests pass smaller values).
    The context must be active while the loss is TRACED (dispatch is
    Python-level), so wrap the jit/grad call site, not the runtime call.
    """
    global _DIST_LINALG
    if min_n is None:
        from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
            BLOCKED_MAX_N,
        )

        min_n = BLOCKED_MAX_N + 1
    prev = _DIST_LINALG
    _DIST_LINALG = (mesh, axis_name, block_size, int(min_n))
    try:
        yield
    finally:
        _DIST_LINALG = prev


def _dispatch_ctx(n, *operands):
    """The active distributed-linalg context if this call should use it."""
    if _DIST_LINALG is None or n < _DIST_LINALG[3]:
        return None
    from jax._src.interpreters import batching

    if any(isinstance(op, batching.BatchTracer) for op in operands):
        return None  # vmapped caller: shard_map can't nest under vmap
    return _DIST_LINALG


def add_noise_masked(K, noise_var, mask=None, jitter=1e-6):
    """K [N, N] + noise*I, with padded rows/cols replaced by identity rows.

    mask: [N] with 1.0 = real point, 0.0 = padding (None = all real).
    noise_var: scalar observation-noise variance.
    """
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    if mask is None:
        return K + (noise_var + jitter) * eye
    m2 = mask[:, None] * mask[None, :]
    diag = jnp.where(mask > 0, noise_var + jitter, 1.0)
    return K * m2 + diag[:, None] * eye


def gp_mll(mean, K, y, noise_var, mask=None, jitter=1e-6):
    """Exact GP marginal log-likelihood, divided by the number of real points.

    mean, y: [N]; K: [N, N]; noise_var: scalar. Returns a scalar.
    """
    Kn = add_noise_masked(K, noise_var, mask, jitter)
    r = y - mean
    if mask is not None:
        r = r * mask
        n_eff = jnp.sum(mask)
    else:
        n_eff = jnp.asarray(float(y.shape[-1]), dtype=y.dtype)

    n = y.shape[-1]
    dist = _dispatch_ctx(n, mean, K, y)
    if dist is not None:
        from meta_learning_pacoh_tpu.parallel.dist_chol import (
            distributed_gp_mll,
        )

        d_mesh, d_axis, d_block, _ = dist
        mll = distributed_gp_mll(jnp.zeros_like(r), Kn, r, d_mesh, d_axis,
                                 d_block, n_eff=n_eff)
        return mll / n_eff
    if n <= UNROLL_MAX_N:
        # tiny N: fully-unrolled factorization + solve fuse into the
        # surrounding kernel — no while-loop HLOs in the hot path. Jitter
        # escalation via stop-gradient trials stays cheap at this size.
        Kn_nd = jax.lax.stop_gradient(Kn)
        eye = jnp.eye(n, dtype=Kn.dtype)

        def ok(j):
            d = jnp.diagonal(unrolled_cholesky(Kn_nd + j * eye))
            return jnp.all(jnp.isfinite(d)) & jnp.all(d > 0)

        jit_sel = jnp.where(ok(0.0), 0.0, jnp.where(ok(1e-4), 1e-4, 1e-2))
        L = unrolled_cholesky(Kn + jit_sel * eye)
        z = unrolled_solve_lower(L, r)
    else:
        from meta_learning_pacoh_tpu import config
        from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
            BLOCKED_MAX_N,
            BLOCKED_MIN_N,
            blocked_mll_quad_logdet,
        )

        if (config.pallas_enabled() and BLOCKED_MIN_N <= n <= BLOCKED_MAX_N
                and y.dtype == jnp.float32):
            # large-N single system (e.g. swissfel single-task training):
            # the blocked Pallas kernel, B=1 (in-kernel jitter escalation)
            quad, logdet = blocked_mll_quad_logdet(Kn[None], r[None])
            ll = -0.5 * (quad[0] + logdet[0] + n_eff * _LOG_2PI)
            return ll / n_eff
        # escalating jitter: sampled GP-prior params can drive the likelihood
        # noise to ~0 (softplus, no floor on the random-GP flavor), where the
        # base 1e-6 jitter under-regularizes the f32 factorization
        L = safe_cholesky(Kn, jitters=(0.0, 1e-4, 1e-2))
        z = jax.scipy.linalg.solve_triangular(L, r[:, None], lower=True)[:, 0]
    quad = jnp.sum(z * z)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    ll = -0.5 * (quad + logdet + n_eff * _LOG_2PI)
    return ll / n_eff


def gp_mll_batch(mean, K, y, noise_var, mask=None, jitter=1e-6):
    """Batched exact GP MLL / n over B independent systems.

    mean, y: [B, N]; K: [B, N, N]; noise_var: [B] or scalar; mask: [B, N].
    Dispatch: N <= 8 -> vmapped fully-unrolled expressions; 9 <= N <= 64 on
    TPU -> the fused Pallas MLL kernel (ONE launch per direction for the
    whole batch, ops/pallas/mll_kernel.py); otherwise vmapped XLA linalg.
    """
    from meta_learning_pacoh_tpu import config
    from meta_learning_pacoh_tpu.ops.pallas.mll_kernel import (
        MLL_KERNEL_MAX_N,
        MLL_KERNEL_MIN_N,
        mll_quad_logdet,
    )

    from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
        BLOCKED_MAX_N,
        BLOCKED_MIN_N,
        blocked_mll_quad_logdet,
    )

    n = y.shape[-1]
    noise_b = jnp.broadcast_to(jnp.asarray(noise_var), y.shape[:-1])
    dist = _dispatch_ctx(n, mean, K, y)
    if dist is not None:
        from meta_learning_pacoh_tpu.parallel.dist_chol import (
            distributed_gp_mll_batch,
        )

        d_mesh, d_axis, d_block, _ = dist
        Kn = jax.vmap(lambda k, nv, m: add_noise_masked(k, nv, m, jitter),
                      in_axes=(0, 0, 0 if mask is not None else None))(
                          K, noise_b, mask)
        r = y - mean
        if mask is not None:
            r = r * mask
            n_eff = jnp.sum(mask, axis=-1)
        else:
            n_eff = jnp.full(y.shape[:-1], float(n), dtype=y.dtype)
        mlls = distributed_gp_mll_batch(jnp.zeros_like(r), Kn, r, d_mesh,
                                        d_axis, d_block, n_eff=n_eff)
        return mlls / n_eff
    use_lane = (
        config.pallas_enabled()
        and MLL_KERNEL_MIN_N <= n <= MLL_KERNEL_MAX_N
        and y.dtype == jnp.float32
    )
    use_blocked = (
        config.pallas_enabled()
        and BLOCKED_MIN_N <= n <= BLOCKED_MAX_N
        and y.dtype == jnp.float32
    )
    if not (use_lane or use_blocked):
        return jax.vmap(gp_mll, in_axes=(0, 0, 0, 0, 0 if mask is not None else None,
                                         None))(mean, K, y, noise_b, mask, jitter)

    Kn = jax.vmap(lambda k, nv, m: add_noise_masked(k, nv, m, jitter),
                  in_axes=(0, 0, 0 if mask is not None else None))(K, noise_b, mask)
    r = y - mean
    if mask is not None:
        r = r * mask
        n_eff = jnp.sum(mask, axis=-1)
    else:
        n_eff = jnp.full(y.shape[:-1], float(n), dtype=y.dtype)
    quad_logdet = mll_quad_logdet if use_lane else blocked_mll_quad_logdet
    quad, logdet = quad_logdet(Kn, r)
    ll = -0.5 * (quad + logdet + n_eff * _LOG_2PI)
    return ll / n_eff


def gp_posterior(mean_c, K_cc, K_ct, mean_t, K_tt, y_c, noise_var, mask_c=None,
                 jitter=1e-6):
    """Exact GP posterior over the latent f at test points, given context data.

    mean_c, y_c: [Nc]; K_cc: [Nc, Nc]; K_ct: [Nc, Nt]; mean_t: [Nt];
    K_tt: [Nt, Nt]. Returns (post_mean [Nt], post_cov [Nt, Nt]).
    """
    Kn = add_noise_masked(K_cc, noise_var, mask_c, jitter)
    r = y_c - mean_c
    if mask_c is not None:
        r = r * mask_c
        K_ct = K_ct * mask_c[:, None]

    nc = y_c.shape[-1]
    if nc <= UNROLL_MAX_N:
        from meta_learning_pacoh_tpu.ops.chol import (
            unrolled_solve_lower_T,
            unrolled_solve_lower_mat,
        )

        L = unrolled_cholesky(Kn)
        z = unrolled_solve_lower(L, r)
        alpha = unrolled_solve_lower_T(L, z)
        V = unrolled_solve_lower_mat(L, K_ct)
    else:
        L = cholesky(Kn)
        alpha = jax.scipy.linalg.cho_solve((L, True), r[:, None])[:, 0]
        V = jax.scipy.linalg.solve_triangular(L, K_ct, lower=True)
    post_mean = mean_t + K_ct.T @ alpha
    post_cov = K_tt - V.T @ V
    return post_mean, post_cov


def mvn_log_prob(y, mean, cov, jitter=1e-6):
    """Joint log-density of y under N(mean, cov). y, mean: [N]; cov: [N, N].

    Relative (diag-scaled) jitter escalation up to 10%: degenerate mixture
    components (near-zero noise + tiny lengthscale particles) produce
    predictive covariances indefinite by ~1e-2 of their scale in f32 — a
    smoothed-but-finite density beats a NaN that poisons the whole
    logsumexp."""
    n = y.shape[-1]
    L = safe_cholesky(cov, jitters=(jitter, 1e-2, 1e-1, 1.0), relative=True)
    r = y - mean
    z = jax.scipy.linalg.solve_triangular(L, r[:, None], lower=True)[:, 0]
    quad = jnp.sum(z * z)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    return -0.5 * (quad + logdet + n * _LOG_2PI)
