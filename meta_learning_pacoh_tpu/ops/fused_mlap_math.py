"""Closed-form PACOH-MLAP step: hand-derived backward, no autodiff.

This module is the mathematical spec (and the always-available XLA
implementation) for the fully-fused Pallas MLAP training kernel
(ops/pallas/fused_mlap_kernel.py). One iteration of the nested two-level
PAC-Bayes bound fit (reference semantics: meta_learn/GPR_meta_mlap.py:318-370;
learner: algos/pacoh_mlap.py _build_step_fn):

    theta_s      = loc + exp(log_scale) * eps_s            eps_s ~ N(0, I)
    kl_outer     = lambda_m * KL(q_hyper || hyper_prior)           (closed form)
    per task t:  avg_ll_t   = mean_n E_{q_t}[log N(y | f, sigma^2)]
                 KL_ts      = KL( q_t || GP-prior(theta_s) at x_t )
                 kl_inner_t = lambda_t * mean_s KL_ts
                 bound_t    = -avg_ll_t + sqrt((kl_outer + kl_inner_t + c_t)
                                               / (2 (n_t - 1)))
    loss         = sum_t (count_t / B) * bound_t + meta_complexity

where count_t is how often the step's task minibatch (sampled WITH
replacement, reference GPR_meta_mlap.py:299) drew task t — weighting
full-batch bounds by counts is exactly the sampled mean and keeps the fused
path on the XLA step's random trajectory without gathers.

Every gradient is analytic:
  - the inner KLs use the closed-form Gaussian-KL VJP
    (ops/variational.py gaussian_kl_chol): with P = K1^-1,
        dKL/dK1 = 0.5 (P - (P L0)(P L0)^T - (P d)(P d)^T)
        dKL/dL0 = P L0 - diag(sign(l)/( |l| + 1e-12 ))
        dKL/dm1 = P d = -dKL/dm0
    chained through the NN-gram backward of ops/fused_svgd_math.
  - hyper-posterior (loc, log_scale) gradients combine the
    reparameterization reduction over the S theta samples with the
    closed-form outer-KL gradients
        dKL_outer/dloc = (loc - mu_p)/sigma_p^2
        dKL_outer/dlog_scale = exp(2 log_scale)/sigma_p^2 - 1.
  - q_t / noise gradients from the expected-log-likelihood and the
    sqrt-complexity chain factors beta_t = u_t / (2 * 2(n_t-1) * C_t).

Constraints (same window as the SVGD/VI specs): NN/NN RandomGP flavor,
feature_dim 1, cov_type 'diag', N <= 8. Verified against jax.grad of the
live learner's loss in tests/test_fused_mlap.py.
"""

import math

import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.ops.chol import (
    unrolled_cholesky as _unrolled_chol_batched,
    unrolled_solve_lower as _unrolled_solve_lower,
)
from meta_learning_pacoh_tpu.ops.fused_svgd_math import (
    _mlp_bwd,
    _mlp_fwd,
    _sigmoid,
    _softplus,
    _unrolled_lower_inv,
    blocks_to_particles,
    particles_to_blocks,
)

_LOG_2PI = math.log(2.0 * math.pi)


def mlap_loss_and_grads(params, eps, counts, X, Y, mask, hyper_prior, *,
                        task_kl_weight, meta_kl_weight, delta):
    """One MLAP loss evaluation + hand-derived gradients, no autodiff.

    params: the learner's pytree {'hyper_post': {'loc' [P], 'log_scale' [P]},
    'raw_noise' [], 'q_means' [T, N], 'q_trils' [T, N, N]}; eps [S, P] is the
    step's reparameterization noise, counts [T] the step's task-draw counts
    (sum = B). X [T, N, D], Y [T, N], mask [T, N].

    Returns (loss, grads, diag) with grads matching params' structure and
    diag = {'avg_ll', 'kl_outer_weighted', 'kl_inner_weighted'} equal to the
    XLA step's logged values.
    """
    loc, lsc = params["hyper_post"]["loc"], params["hyper_post"]["log_scale"]
    qm, qt = params["q_means"], params["q_trils"]
    nu = params["raw_noise"]
    T, N, D = X.shape
    S = eps.shape[0]
    B = jnp.sum(counts)
    u = counts / B  # [T]

    scale = jnp.exp(lsc)
    theta = loc[None, :] + scale[None, :] * eps  # [S, P]

    # ---- outer KL (closed form, matches random_gp.posterior_kl_to_prior)
    mu_p = jnp.asarray(hyper_prior.loc, jnp.float32)
    sig_p = jnp.asarray(hyper_prior.scale, jnp.float32)
    rq = (loc - mu_p) / sig_p
    kl_outer_raw = 0.5 * (jnp.sum((scale / sig_p) ** 2) + jnp.sum(rq * rq)
                          - loc.shape[0]
                          + 2.0 * jnp.sum(jnp.log(sig_p)) - 2.0 * jnp.sum(lsc))
    kl_outer = meta_kl_weight * kl_outer_raw

    noise_var = _softplus(nu) + 1e-4

    # ---- q-side quantities (theta-independent)
    m2 = mask[:, :, None] * mask[:, None, :]              # [T, N, N]
    eye = jnp.eye(N, dtype=X.dtype)
    diag_pad = jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(1.0 - mask)
    Leff = jnp.tril(qt) * m2 + diag_pad                   # [T, N, N]
    qm_eff = qm * mask                                    # [T, N]
    f_var = jnp.sum(Leff * Leff, axis=-1)                 # [T, N]
    n_eff = jnp.sum(mask, axis=-1)                        # [T]
    r = Y - qm_eff                                        # [T, N]
    lp = -0.5 * ((r * r + f_var) / noise_var
                 + jnp.log(noise_var) + _LOG_2PI)         # [T, N]
    avg_ll = jnp.sum(lp * mask, axis=-1) / n_eff          # [T]
    ldiag0 = jnp.diagonal(Leff, axis1=-2, axis2=-1)       # [T, N]
    logdet0 = 2.0 * jnp.sum(jnp.log(jnp.abs(ldiag0) + 1e-12), axis=-1)  # [T]
    Sig0 = jnp.einsum("tik,tjk->tij", Leff, Leff)         # [T, N, N]

    # ---- GP prior per theta sample (NN/NN forward)
    blocks = particles_to_blocks(hyper_prior, theta)
    x_flat = X.reshape(T * N, D)
    mu_flat, m_acts = _mlp_fwd(blocks["mean_ws"], blocks["mean_bs"], x_flat)
    phi_flat, k_acts = _mlp_fwd(blocks["kernel_ws"], blocks["kernel_bs"],
                                x_flat)
    mu = mu_flat[..., 0].reshape(S, T, N)
    F = phi_flat.shape[-1]
    phi = phi_flat.reshape(S, T, N, F)
    ls = _softplus(blocks["ls_raw"])                      # [S, F]
    z = phi / ls[:, None, None, :]                        # [S, T, N, F]

    zn = jnp.sum(z * z, axis=-1)
    cross = jnp.einsum("stnf,stmf->stnm", z, z)
    d2 = jnp.maximum(zn[..., :, None] + zn[..., None, :] - 2.0 * cross, 0.0)
    Km = jnp.exp(-0.5 * d2)                               # [S, T, N, N]

    K1 = Km * m2[None] + diag_pad[None]                   # [S, T, N, N]

    # jitter escalation identical to ops/variational.gaussian_kl_chol
    K1_nd = jax.lax.stop_gradient(K1)

    def ok(j):
        dgn = jnp.diagonal(_unrolled_chol_batched(K1_nd + j * eye),
                           axis1=-2, axis2=-1)
        return jnp.all(jnp.isfinite(dgn), axis=-1) & jnp.all(dgn > 0, axis=-1)

    jit_sel = jnp.where(ok(1e-6), 1e-6, jnp.where(ok(1e-4), 1e-4, 1e-2))
    K1 = K1 + jit_sel[..., None, None] * eye

    L1 = _unrolled_chol_batched(K1)
    W1 = _unrolled_lower_inv(L1)                          # [S, T, N, N] L1^-1
    Kinv = jnp.einsum("stni,stnj->stij", W1, W1)          # [S, T, N, N]

    mu_eff = mu * mask[None]                              # [S, T, N]
    dvec = mu_eff - qm_eff[None]                          # [S, T, N]
    w = jnp.einsum("stij,stj->sti", Kinv, dvec)           # P d
    quad = jnp.sum(dvec * w, axis=-1)                     # [S, T]
    trace = jnp.einsum("stij,tij->st", Kinv, Sig0)        # tr(P Sig0)
    logdet1 = 2.0 * jnp.sum(
        jnp.log(jnp.diagonal(L1, axis1=-2, axis2=-1)), axis=-1)  # [S, T]
    KL_st = 0.5 * (trace + quad - N + logdet1 - logdet0[None])   # [S, T]

    kl_inner = task_kl_weight * jnp.mean(KL_st, axis=0)   # [T]
    c_t = (math.log(2.0) + jnp.log(n_eff) + math.log(float(T))
           - math.log(delta))
    c2 = 2.0 * (n_eff - 1.0)
    complexity = jnp.sqrt((kl_outer + kl_inner + c_t) / c2)       # [T]
    bound = -avg_ll + complexity
    cm2 = 2.0 * (T - 1.0)
    meta_c = jnp.sqrt((kl_outer + math.log(2.0) + math.log(float(T))
                       - math.log(delta)) / cm2)
    loss = jnp.sum(u * bound) + meta_c

    # =================== backward (all closed form) ===================
    beta = u / (2.0 * c2 * complexity)                    # dloss/dA_t
    chi = jnp.sum(beta) + 1.0 / (2.0 * cm2 * meta_c)      # dloss/dkl_outer
    gamma = beta * task_kl_weight / S                     # [T] per-KL_st cot

    # ---- theta-side: dKL/dK1 chained through the NN gram backward
    PL = jnp.einsum("stij,tjk->stik", Kinv, Leff)         # P L0
    G_K1 = (0.5 * gamma[None, :, None, None]
            * (Kinv - jnp.einsum("stik,stjk->stij", PL, PL)
               - w[..., :, None] * w[..., None, :]))      # [S, T, N, N]
    d_mu = gamma[None, :, None] * w * mask[None]          # [S, T, N]

    dKm = G_K1 * m2[None]
    dd2 = dKm * Km * (-0.5)
    A2 = dd2 + jnp.swapaxes(dd2, -1, -2)
    rowsum = jnp.sum(A2, axis=-1)
    dz = 2.0 * (rowsum[..., None] * z - jnp.einsum("stnm,stmf->stnf", A2, z))
    d_ls = _sigmoid(blocks["ls_raw"]) * (
        -jnp.einsum("stnf,stnf->sf", dz, z) / ls)
    d_phi = dz / ls[:, None, None, :]

    d_mws, d_mbs = _mlp_bwd(blocks["mean_ws"], blocks["mean_bs"], x_flat,
                            m_acts, d_mu.reshape(S, T * N, 1))
    d_kws, d_kbs = _mlp_bwd(blocks["kernel_ws"], blocks["kernel_bs"], x_flat,
                            k_acts, d_phi.reshape(S, T * N, F))
    score_blocks = {
        "mean_ws": d_mws, "mean_bs": d_mbs,
        "kernel_ws": d_kws, "kernel_bs": d_kbs,
        "ls_raw": d_ls,
        "noise_raw": jnp.zeros_like(blocks["noise_raw"]),
    }
    score = blocks_to_particles(hyper_prior, score_blocks)  # [S, P]

    g_loc = (jnp.sum(score, axis=0)
             + chi * meta_kl_weight * (loc - mu_p) / (sig_p * sig_p))
    g_lsc = (scale * jnp.sum(score * eps, axis=0)
             + chi * meta_kl_weight * ((scale / sig_p) ** 2 - 1.0))

    # ---- q-side
    ll_coef = u / (noise_var * n_eff)                     # [T]
    g_qm = (-ll_coef[:, None] * mask * r
            - mask * jnp.einsum("t,sti->ti", gamma, w))   # [T, N]

    # dKL_ts/dLeff = (P L0)_s - diag(sign(l)/(|l|+1e-12)); the diag term is
    # sample-independent, so its total cotangent is S * gamma_t
    dL_diag = jnp.vectorize(jnp.diag, signature="(n)->(n,n)")(
        jnp.sign(ldiag0) / (jnp.abs(ldiag0) + 1e-12))
    G_L = (jnp.einsum("t,stij->tij", gamma, PL)
           - (S * gamma)[:, None, None] * dL_diag)
    g_qt = jnp.tril((ll_coef[:, None, None] * Leff + G_L) * m2)

    davg_dvar = jnp.sum(
        mask * (0.5 * (r * r + f_var) / (noise_var * noise_var)
                - 0.5 / noise_var), axis=-1) / n_eff      # [T]
    g_nu = _sigmoid(nu) * jnp.sum(u * (-davg_dvar))

    grads = {
        "hyper_post": {"loc": g_loc, "log_scale": g_lsc},
        "raw_noise": g_nu,
        "q_means": g_qm,
        "q_trils": g_qt,
    }
    diag = {
        "avg_ll": jnp.sum(u * avg_ll),
        "kl_outer_weighted": kl_outer,
        "kl_inner_weighted": jnp.sum(u * kl_inner),
    }
    return loss, grads, diag
