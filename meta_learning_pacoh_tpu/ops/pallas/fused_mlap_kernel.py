"""Pallas TPU kernel: an ENTIRE PACOH-MLAP training run in one kernel launch.

PACOH-MLAP (reference: meta_learn/GPR_meta_mlap.py:299-370) trains a
Gaussian hyper-posterior q(theta), a global likelihood noise, and one
variational Gaussian q_t(f) per task jointly on the nested two-level
PAC-Bayes bound. The XLA step is launch-latency-bound on the TPU
(tools/mlap_profile.py: S=1 == S=5 per-iter, ~118 us) — so this kernel runs
the WHOLE loop inside one `pl.pallas_call`. Per iteration it

  1. streams that iteration's packed page (reparameterization noise eps_s
     AND the step's task-minibatch draw counts) HBM->VMEM via async DMA,
  2. samples theta_s = loc + exp(log_scale) * eps_s into the S-lane
     particle layout (fused_vi_kernel.make_lane_sample_ops),
  3. runs the NN/NN GP-prior forward (fused_train_kernel.make_net_fns) and
     the entry-wise [T, S] linalg of the S*T inner Gaussian KLs
     KL(q_t || GP-prior(theta_s)) — Cholesky, triangular inverse, K^-1 —
     with the spec's 1e-6/1e-4/1e-2 jitter escalation,
  4. assembles the count-weighted PAC bound (expected log-likelihood,
     sqrt-complexity per task, outer KL in closed form, meta-complexity)
     and EVERY gradient analytically — the closed-form KL VJP chained
     through the NN gram backward for theta, the reparameterization
     reduction + closed-form outer-KL gradients for (loc, log_scale), the
     expected-LL / sqrt-chain factors for q_t and the noise — no autodiff
     (math spec: ops/fused_mlap_math.py, verified == jax.grad of the live
     learner's loss),
  5. applies exact optax multi_transform Adam: lr for the hyper-posterior
     + noise ("main"), lr * posterior_lr_multiplier for the per-task
     posteriors ("posterior").

The per-step randomness (task draws with replacement + eps) is generated
HOST-side with the XLA learner step's exact fold_in/split key discipline
(algos/pacoh_mlap.py single_step), so fused and XLA paths follow the SAME
random trajectory. Sampled task minibatches are expressed as count-weighted
full-batch bounds (counts stream in the noise page), which is exactly the
sampled mean without gathers.

Layouts: hyper-posterior (loc, log_scale) in the K=1 packed layout of
fused_train_kernel.pack_state; q_means as [T*N, 1] n-major rows (row
i*T + t, matching x/y/mask); q_trils ENTRY-major [N*N*T, 1] (row
(i*N + j)*T + t), so every per-task linalg quantity is a contiguous [T, *]
sublane slice. Adam moments live in the same layouts.

Fast-path constraints (the general XLA path remains for the rest):
mean_module == covar_module == 'NN' with one shared hidden width,
feature_dim == 1, cov_type == 'diag', Adam (optionally staircase StepLR
via launch_sched boundary-aligned launches), N <= 8
(the unrolled-linalg window), f32. The Adam step counter is f32 SMEM —
the 2^24-step caveat of fused_map_kernel.py applies.
"""

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
    _block_sum_mat,
    _chol_e,
    _kinv_e,
    _lower_inv_e,
    _mm,
    _sigmoid,
    _softplus,
    hyper_prior_loc_scale,
    make_net_fns,
    state_names,
)
from meta_learning_pacoh_tpu.ops.pallas.fused_vi_kernel import (
    eps_layout,
    make_lane_sample_ops,
    pack_eps_page,
)

_LOG_2PI = math.log(2.0 * math.pi)


# ------------------------------------------------------------- page layout


def mlap_page_layout(hidden, d, s, t):
    """The VI eps page plus T count rows (lane 0): one page per iteration."""
    rows, r_off, lanes_pad = eps_layout(hidden, d, s)
    # eps_layout already rounded r_off up to a multiple of 8; append counts
    # after the aligned block so pack_eps_page's output drops in unchanged
    rows = rows + [("counts", r_off, t, 1)]
    r_pad = -(-(r_off + t) // 8) * 8
    return rows, r_pad, lanes_pad


def pack_mlap_page(hyper_prior, eps_flat, counts, hidden):
    """([S, P] normals, [T] draw counts) -> one [R_pad, LANES] page."""
    t = counts.shape[0]
    eps_page = pack_eps_page(hyper_prior, eps_flat, hidden)
    d = _page_d(hyper_prior, hidden)
    _, r_pad, lanes = mlap_page_layout(hidden, d, eps_flat.shape[0], t)
    page = jnp.zeros((r_pad, lanes), jnp.float32)
    page = jax.lax.dynamic_update_slice(page, eps_page, (0, 0))
    cnt = counts.reshape(t, 1).astype(jnp.float32)
    page = jax.lax.dynamic_update_slice(page, cnt, (eps_page.shape[0], 0))
    return page


def _page_d(hyper_prior, hidden):
    """Input dim D recovered from the hyper-prior's first-layer width."""
    from meta_learning_pacoh_tpu.ops.fused_svgd_math import (
        particles_to_blocks,
    )

    blocks = particles_to_blocks(
        hyper_prior, jnp.zeros((1, hyper_prior.dim), jnp.float32))
    return blocks["mean_ws"][0].shape[1]


# ------------------------------------------------------------- kernel body


def _make_mlap_kernel(*, S, T, N, D, B, hidden, wps, bps, p_dim,
                      sum_log_sigma_p, n_steps, meta_test=False, b1=0.9,
                      b2=0.999, eps_adam=1e-8):
    """B = task minibatch size (counts sum); S = theta sample count.

    meta_test=True builds the MLAP meta-test inference kernel instead
    (reference: GPR_meta_mlap.py:372-390 / algos/pacoh_mlap.py
    run_inference): the hyper-posterior and noise are FROZEN (theta still
    sampled per step from them), the loss is the plain SUM of per-task
    bounds (u = 1, no meta-complexity term), and only (q_means, q_trils)
    receive gradients + Adam updates (single group, lr_post). The entire
    net backward, reparameterization reduction, and outer-KL gradient
    sections drop out — the per-iteration cost is forward + q-side only."""
    n_hidden = len(hidden)
    M = T * N
    names = state_names(n_hidden)
    NS = len(names)
    H = hidden[0]
    prior_ls = hyper_prior_loc_scale(n_hidden, wps, bps)
    layout, r_pad, lanes = mlap_page_layout(hidden, D, S, T)
    eps_slices = {nm: (off, nr, nl) for nm, off, nr, nl in layout}
    net_fwd, net_bwd = make_net_fns(K=S, D=D, hidden=hidden)
    build_mats, sample_st, reduce_pair = make_lane_sample_ops(
        S=S, hidden=hidden, layout=layout)
    log2_logT = math.log(2.0) + math.log(float(T))
    cm2 = 2.0 * (T - 1.0)
    # number of hyper-posterior state tensors followed by (qm, qt, nu)
    NP = 2 * NS + 3

    def kernel(*refs):
        state_refs = refs[:NP]
        m_refs = refs[NP:2 * NP]
        v_refs = refs[2 * NP:3 * NP]
        x_ref, y_ref, mask_ref, neff_ref = refs[3 * NP:3 * NP + 4]
        pages_hbm = refs[3 * NP + 4]
        scal_ref = refs[3 * NP + 5]
        out_refs = refs[3 * NP + 6:6 * NP + 6]
        out_scalars = refs[6 * NP + 6:6 * NP + 11]
        page_scr = refs[6 * NP + 11]
        dma_sem = refs[6 * NP + 12]

        x = x_ref[...]        # [M, D], rows n-major (row n*T + t)
        y_nm = y_ref[...]     # [M, 1]
        msk = mask_ref[...]   # [M, 1]
        n_eff = neff_ref[...]  # [T, 1]
        # runtime scalars (SMEM): everything a hyperparameter sweep varies
        # is TRACED, so lr / kl-weight / delta sweeps share ONE compiled
        # kernel per shape config
        step0 = scal_ref[0, 0]
        lr_main = scal_ref[0, 1]
        lr_post = scal_ref[0, 2]
        tkw = scal_ref[0, 3]
        mkw = scal_ref[0, 4]
        neg_log_delta = scal_ref[0, 5]
        meta_ct = log2_logT + neg_log_delta

        mats = build_mats()
        sumL = _block_sum_mat(S, hidden[-1])
        ones_m = jnp.ones((1, M), jnp.float32)

        # loop-invariant per-task constants
        c_t = meta_ct + jnp.log(n_eff)        # [T, 1]
        c2 = 2.0 * (n_eff - 1.0)              # [T, 1]
        m_e = [msk[i * T:(i + 1) * T, :] for i in range(N)]    # [T, 1]
        y_e = [y_nm[i * T:(i + 1) * T, :] for i in range(N)]   # [T, 1]

        # Lane sums MUST be ones-column dots (contraction (1,)x(0,)):
        # Mosaic lowers a dot whose rhs contracts its dim 1 (_mm_nt with a
        # [1, S] ones row) to vector.multi_reduction, and MLIR then folds a
        # directly-added non-constant into the reduction accumulator —
        # which Mosaic rejects ("only constant accumulators supported").
        # The [S, 1] ones-column form lowers through the matmul path.
        ones_s1 = jnp.ones((S, 1), jnp.float32)

        def lane_sum(a):
            """[T, S] -> [T, 1]."""
            return _mm(a, ones_s1)

        def _adam(g, th, m_, v_, i, lr):
            t_f = step0 + jnp.asarray(i, jnp.float32) + 1.0
            bc1 = 1.0 - jnp.exp(t_f * math.log(b1))
            bc2 = 1.0 - jnp.exp(t_f * math.log(b2))
            m_n = b1 * m_ + (1.0 - b1) * g
            v_n = b2 * v_ + (1.0 - b2) * g * g
            upd = (m_n / bc1) / (jnp.sqrt(v_n / bc2) + eps_adam)
            return th - lr * upd, m_n, v_n

        def body(i, carry):
            st_l, m_l, v_l, _scal = carry
            loc = dict(zip(names, st_l[:NS]))
            lsc = dict(zip(names, st_l[NS:2 * NS]))
            qm, qt, nu = st_l[2 * NS], st_l[2 * NS + 1], st_l[2 * NS + 2]

            # stream this iteration's page (eps + counts) HBM -> VMEM
            dma = pltpu.make_async_copy(pages_hbm.at[i], page_scr, dma_sem)
            dma.start()
            dma.wait()
            page = page_scr[...]

            def eps_of(nm):
                off, nr, nl = eps_slices[nm]
                return page[off:off + nr, :nl]

            cnt_off = eps_slices["counts"][0]
            counts = page[cnt_off:cnt_off + T, 0:1]     # [T, 1]
            u = counts * (1.0 / B)

            # ---- sample theta_s into the S-lane layout -----------------
            scale = {nm: jnp.exp(lsc[nm]) for nm in names}
            st, eps_lane = sample_st(loc, scale, eps_of, mats)

            # ---- outer KL (closed form on the K=1 packed state) --------
            s_sq = s_rq = s_lsc = None
            for nm in names:
                p_loc, p_scale = prior_ls[nm]
                a = jnp.sum((scale[nm] / p_scale) ** 2)
                rq = (loc[nm] - p_loc) / p_scale
                b_ = jnp.sum(rq * rq)
                c_ = jnp.sum(lsc[nm])
                s_sq = a if s_sq is None else s_sq + a
                s_rq = b_ if s_rq is None else s_rq + b_
                s_lsc = c_ if s_lsc is None else s_lsc + c_
            kl_outer = mkw * 0.5 * (s_sq + s_rq - p_dim
                                    + 2.0 * sum_log_sigma_p - 2.0 * s_lsc)

            # ---- q-side (theta-independent) ----------------------------
            noise_var = _softplus(nu[0, 0]) + 1e-4      # scalar
            qm_eff = [qm[i2 * T:(i2 + 1) * T, :] * m_e[i2]
                      for i2 in range(N)]               # [T, 1]

            def qt_e(i2, j2):
                return qt[(i2 * N + j2) * T:(i2 * N + j2 + 1) * T, :]

            L0 = {}
            for i2 in range(N):
                for j2 in range(i2 + 1):
                    v_ = qt_e(i2, j2) * m_e[i2] * m_e[j2]
                    if i2 == j2:
                        v_ = v_ + (1.0 - m_e[i2])
                    L0[(i2, j2)] = v_
            f_var = [None] * N
            for i2 in range(N):
                acc = None
                for k2 in range(i2 + 1):
                    t_ = L0[(i2, k2)] * L0[(i2, k2)]
                    acc = t_ if acc is None else acc + t_
                f_var[i2] = acc
            r_rows = [y_e[i2] - qm_eff[i2] for i2 in range(N)]
            lp_sum = None
            for i2 in range(N):
                lp = -0.5 * ((r_rows[i2] * r_rows[i2] + f_var[i2]) / noise_var
                             + jnp.log(noise_var) + _LOG_2PI)
                t_ = lp * m_e[i2]
                lp_sum = t_ if lp_sum is None else lp_sum + t_
            avg_ll = lp_sum / n_eff                     # [T, 1]
            ld0 = [L0[(i2, i2)] for i2 in range(N)]
            logdet0 = None
            for i2 in range(N):
                t_ = 2.0 * jnp.log(jnp.abs(ld0[i2]) + 1e-12)
                logdet0 = t_ if logdet0 is None else logdet0 + t_
            Sig0 = {}
            for i2 in range(N):
                for j2 in range(i2 + 1):
                    acc = None
                    for k2 in range(j2 + 1):
                        t_ = L0[(i2, k2)] * L0[(j2, k2)]
                        acc = t_ if acc is None else acc + t_
                    Sig0[(i2, j2)] = acc
                    Sig0[(j2, i2)] = acc

            # ---- GP prior per theta sample (NN/NN forward) --------------
            mu, m_acts = net_fwd(st, "m", x, sumL)      # [M, S]
            phi, k_acts = net_fwd(st, "k", x, sumL)     # [M, S]
            sp_ls = _softplus(st["ls"])                 # [1, S]
            mu_e = [mu[i2 * T:(i2 + 1) * T, :] for i2 in range(N)]  # [T, S]
            z_e = [phi[i2 * T:(i2 + 1) * T, :] / sp_ls
                   for i2 in range(N)]                  # [T, S]

            # d2 in the ops/kernels.sq_dists form (zi^2 + zj^2 - 2 zi zj,
            # clamped at 0) so the fused gram rounds EXACTLY like the XLA
            # learner's — the inner-KL gram has no likelihood noise, so its
            # ~1e6 condition number amplifies any rounding difference into
            # visible KL/trajectory divergence
            zz = [z_e[i2] * z_e[i2] for i2 in range(N)]
            Km_e, K1 = {}, {}
            for i2 in range(N):
                for j2 in range(i2 + 1):
                    d2_ = jnp.maximum(
                        zz[i2] + zz[j2] - 2.0 * (z_e[i2] * z_e[j2]), 0.0)
                    km = jnp.exp(-0.5 * d2_)
                    Km_e[(i2, j2)] = km
                    Km_e[(j2, i2)] = km
                    v_ = km * m_e[i2] * m_e[j2]
                    if i2 == j2:
                        v_ = v_ + (1.0 - m_e[i2])
                    K1[(i2, j2)] = v_
                    K1[(j2, i2)] = v_

            # jitter escalation (matches ops/variational.gaussian_kl_chol /
            # the math spec: trials at 1e-6 / 1e-4, else 1e-2)
            def diag_ok(jit):
                A = dict(K1)
                for i2 in range(N):
                    A[(i2, i2)] = K1[(i2, i2)] + jit
                Lt = _chol_e(A, N)
                ok = None
                for i2 in range(N):
                    d_ = Lt[(i2, i2)]
                    c = jnp.isfinite(d_) & (d_ > 0)
                    ok = c if ok is None else (ok & c)
                return ok

            jit_sel = jnp.where(diag_ok(1e-6), 1e-6,
                                jnp.where(diag_ok(1e-4), 1e-4, 1e-2))
            for i2 in range(N):
                K1[(i2, i2)] = K1[(i2, i2)] + jit_sel

            L1 = _chol_e(K1, N)
            W1 = _lower_inv_e(L1, N)
            Kinv = _kinv_e(W1, N)

            d_vec = [mu_e[i2] * m_e[i2] - qm_eff[i2] for i2 in range(N)]
            w = []
            for i2 in range(N):
                acc = None
                for j2 in range(N):
                    t_ = Kinv[(i2, j2)] * d_vec[j2]
                    acc = t_ if acc is None else acc + t_
                w.append(acc)                            # [T, S]
            quad = trace = logdet1 = None
            for i2 in range(N):
                tq = d_vec[i2] * w[i2]
                quad = tq if quad is None else quad + tq
                tl = 2.0 * jnp.log(L1[(i2, i2)])
                logdet1 = tl if logdet1 is None else logdet1 + tl
                for j2 in range(N):
                    tt = Kinv[(i2, j2)] * Sig0[(i2, j2)]
                    trace = tt if trace is None else trace + tt
            KL_st = 0.5 * (trace + quad - N + logdet1 - logdet0)  # [T, S]
            kl_inner = tkw * lane_sum(KL_st) / S                  # [T, 1]

            complexity = jnp.sqrt((kl_outer + kl_inner + c_t) / c2)
            bound = -avg_ll + complexity
            if meta_test:
                loss = jnp.sum(u * bound)
            else:
                meta_c = jnp.sqrt((kl_outer + meta_ct) / cm2)     # scalar
                loss = jnp.sum(u * bound) + meta_c

            # =============== backward (all closed form) ===============
            beta = u / (2.0 * c2 * complexity)          # [T, 1]
            gamma = beta * tkw / S                      # [T, 1]

            # PL[(i,k)] = (Kinv L0)_{ik}: [T, S]
            PL = {}
            for i2 in range(N):
                for k2 in range(N):
                    acc = None
                    for j2 in range(k2, N):  # L0 is lower: (j2, k2), j2 >= k2
                        t_ = Kinv[(i2, j2)] * L0[(j2, k2)]
                        acc = t_ if acc is None else acc + t_
                    PL[(i2, k2)] = acc

            if not meta_test:
                chi = (jnp.sum(beta) + 1.0 / (2.0 * cm2 * meta_c))
                # gram backward: dKL/dK1 chained to dz (same structure as
                # the MLL backward in make_score_section)
                dmu_rows = []
                dz_rows = []
                dls_acc = None
                for i2 in range(N):
                    dmu_rows.append(gamma * w[i2] * m_e[i2])
                    acc = None
                    for j2 in range(N):
                        plpl = None
                        for k2 in range(N):
                            t_ = PL[(i2, k2)] * PL[(j2, k2)]
                            plpl = t_ if plpl is None else plpl + t_
                        g_ij = 0.5 * gamma * (Kinv[(i2, j2)] - plpl
                                              - w[i2] * w[j2])
                        dkm = g_ij * m_e[i2] * m_e[j2]
                        dd2 = -0.5 * dkm * Km_e[(i2, j2)]
                        term = 2.0 * dd2 * (z_e[i2] - z_e[j2])
                        acc = term if acc is None else acc + term
                    dz_i = 2.0 * acc  # A_ij = dd2_ij + dd2_ji = 2 dd2_ij
                    dz_rows.append(dz_i)
                    c_ = dz_i * (-z_e[i2]) / sp_ls
                    dls_acc = c_ if dls_acc is None else dls_acc + c_

                d_ls = (jnp.sum(dls_acc, axis=0, keepdims=True)
                        * _sigmoid(st["ls"]))           # [1, S]
                DPHI = jnp.concatenate(
                    [dz_rows[i2] / sp_ls for i2 in range(N)],
                    axis=0)                                        # [M, S]
                DMU = jnp.concatenate(dmu_rows, axis=0)            # [M, S]

                score = {}
                score.update(net_bwd(st, "m", m_acts, DMU, x, sumL, ones_m))
                score.update(net_bwd(st, "k", k_acts, DPHI, x, sumL, ones_m))
                score["ls"] = d_ls
                score["nz"] = jnp.zeros((1, S), jnp.float32)

                # hyper-posterior gradients: reparameterization reduction +
                # closed-form outer-KL terms
                g_loc, g_lsc = [], []
                for nm in names:
                    red, red_e = reduce_pair(nm, score[nm], eps_of, eps_lane,
                                             mats)
                    p_loc, p_scale = prior_ls[nm]
                    g_loc.append(red + chi * mkw * (loc[nm] - p_loc)
                                 / (p_scale * p_scale))
                    g_lsc.append(scale[nm] * red_e
                                 + chi * mkw * ((scale[nm] / p_scale) ** 2
                                                - 1.0))

            # ---- q-side gradients ----
            ll_coef = u / (noise_var * n_eff)           # [T, 1]
            g_qm_rows = []
            for i2 in range(N):
                ws = lane_sum(w[i2])                    # [T, 1]
                g_qm_rows.append(-ll_coef * m_e[i2] * r_rows[i2]
                                 - m_e[i2] * gamma * ws)
            g_qm = jnp.concatenate(g_qm_rows, axis=0)   # [M, 1]

            g_qt_rows = []
            for i2 in range(N):
                for j2 in range(N):
                    if j2 > i2:
                        g_qt_rows.append(jnp.zeros((T, 1), jnp.float32))
                        continue
                    gl = gamma * lane_sum(PL[(i2, j2)])
                    if i2 == j2:
                        gl = gl - (S * gamma) * (jnp.sign(ld0[i2])
                                                 / (jnp.abs(ld0[i2]) + 1e-12))
                    g_qt_rows.append((ll_coef * L0[(i2, j2)] + gl)
                                     * m_e[i2] * m_e[j2])
            g_qt = jnp.concatenate(g_qt_rows, axis=0)   # [N*N*T, 1]

            if meta_test:
                # only (q_means, q_trils) train; hyper state + noise and
                # their moment buffers pass through the carry untouched
                new_st = list(st_l)
                new_m = list(m_l)
                new_v = list(v_l)
                for k3, g in ((2 * NS, g_qm), (2 * NS + 1, g_qt)):
                    th_n, m_n, v_n = _adam(g, st_l[k3], m_l[k3], v_l[k3],
                                           i, lr_post)
                    new_st[k3], new_m[k3], new_v[k3] = th_n, m_n, v_n
            else:
                dv_sum = None
                for i2 in range(N):
                    t_ = m_e[i2] * (0.5 * (r_rows[i2] * r_rows[i2]
                                           + f_var[i2])
                                    / (noise_var * noise_var)
                                    - 0.5 / noise_var)
                    dv_sum = t_ if dv_sum is None else dv_sum + t_
                davg_dvar = dv_sum / n_eff              # [T, 1]
                g_nu = (_sigmoid(nu[0, 0]) * jnp.sum(u * (-davg_dvar))
                        * jnp.ones((1, 1), jnp.float32))

                # ---- Adam (exact optax multi_transform semantics) ----
                grads = g_loc + g_lsc + [g_qm, g_qt, g_nu]
                lrs = ([lr_main] * (2 * NS) + [lr_post, lr_post, lr_main])
                # raw_noise rides the "main" group; q posteriors "posterior"
                new_st, new_m, new_v = [], [], []
                for g, th, m_, v_, lr_k in zip(grads, st_l, m_l, v_l, lrs):
                    th_n, m_n, v_n = _adam(g, th, m_, v_, i, lr_k)
                    new_st.append(th_n)
                    new_m.append(m_n)
                    new_v.append(v_n)

            diag = (loss * jnp.ones((1, 1), jnp.float32),
                    _scal[1] + loss,
                    jnp.sum(u * avg_ll) * jnp.ones((1, 1), jnp.float32),
                    kl_outer * jnp.ones((1, 1), jnp.float32),
                    jnp.sum(u * kl_inner) * jnp.ones((1, 1), jnp.float32))
            return (tuple(new_st), tuple(new_m), tuple(new_v), diag)

        # the state order is: loc tensors, lsc tensors, qm, qt, nu
        st0 = tuple(r[...] for r in state_refs)
        m0 = tuple(r[...] for r in m_refs)
        v0 = tuple(r[...] for r in v_refs)
        zero = jnp.zeros((1, 1), jnp.float32)
        out = jax.lax.fori_loop(0, n_steps, body,
                                (st0, m0, v0, (zero, zero, zero, zero, zero)))
        flat = list(out[0]) + list(out[1]) + list(out[2])
        for r, val in zip(out_refs, flat):
            r[...] = val
        for r, val in zip(out_scalars, out[3]):
            r[...] = val

    return kernel, r_pad, lanes


# ------------------------------------------------------------ host wrapper


@functools.partial(
    jax.jit,
    static_argnames=("S", "T", "N", "D", "B", "hidden",
                     "wps", "bps",
                     "p_dim", "sum_log_sigma_p", "n_steps",
                     "meta_test", "interpret"))
def fused_mlap_train_packed(state_l, m_l, v_l, x, y_nm, mask_nm, n_eff,
                            pages, step0, *, S, T, N, D, B, hidden, lr_main,
                            lr_post, wps, bps, task_kl_weight,
                            meta_kl_weight, delta, p_dim, sum_log_sigma_p,
                            n_steps, meta_test=False, interpret=False):
    """Run n_steps MLAP iterations in one kernel launch on packed state.

    state_l / m_l / v_l: lists ordered [loc tensors..., lsc tensors...,
    q_means, q_trils, raw_noise] in the kernel layouts.
    """
    kernel, r_pad, lanes = _make_mlap_kernel(
        S=S, T=T, N=N, D=D, B=B, hidden=tuple(hidden),
        wps=wps, bps=bps, p_dim=p_dim,
        sum_log_sigma_p=sum_log_sigma_p, n_steps=n_steps,
        meta_test=meta_test)
    NP = len(state_l)
    scalars = jnp.stack([
        jnp.asarray(step0, jnp.float32),
        jnp.asarray(lr_main, jnp.float32),
        jnp.asarray(lr_post, jnp.float32),
        jnp.asarray(task_kl_weight, jnp.float32),
        jnp.asarray(meta_kl_weight, jnp.float32),
        -jnp.log(jnp.asarray(delta, jnp.float32)),
    ]).reshape(1, 6)
    all_in = (list(state_l) + list(m_l) + list(v_l)
              + [x, y_nm, mask_nm, n_eff, pages, scalars])
    out_shapes = ([jax.ShapeDtypeStruct(t.shape, t.dtype)
                   for t in list(state_l) + list(m_l) + list(v_l)]
                  + [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 5)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * NP + 4)
        + [pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * NP + 5),
        input_output_aliases={i: i for i in range(3 * NP)},
        scratch_shapes=[pltpu.VMEM((r_pad, lanes), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*all_in)
    scal = [outs[3 * NP + j][0, 0] for j in range(5)]
    return (outs[:NP], outs[NP:2 * NP], outs[2 * NP:3 * NP],
            scal[0], scal[1] / n_steps,
            {"avg_ll": scal[2], "kl_outer_weighted": scal[3],
             "kl_inner_weighted": scal[4]})


class FusedMLAPTrainer:
    """Host-side driver: pack params once, run chunks, unpack on demand.

    Per-chunk randomness (task-draw counts + reparameterization noise) is
    generated host-side with the XLA learner step's exact key discipline
    (fold_in(base_key, step) -> split -> (k_task, k_theta) ->
    randint/normal), so fused and XLA runs follow the same trajectory.
    """

    MAX_LAUNCH = 512  # bounds the streamed page buffer per launch

    def __init__(self, hyper_prior, params, X, Y, mask, *, hidden, lr,
                 posterior_lr_multiplier, task_batch_size, svi_batch_size,
                 task_kl_weight, meta_kl_weight, delta, weight_prior_std,
                 bias_prior_std, base_key, lr_decay=1.0, interpret=False):
        from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
            pack_state,
            unpack_state,
        )

        self.hp = hyper_prior
        self.S = int(svi_batch_size)
        self.B = int(task_batch_size)
        self.T, self.N, self.D = (int(X.shape[0]), int(X.shape[1]),
                                  int(X.shape[2]))
        self.hidden = tuple(int(h) for h in hidden)
        self.names = state_names(len(self.hidden))
        self.lr_main = float(lr)
        self.lr_post = float(lr * posterior_lr_multiplier)
        self.lr_decay = float(lr_decay)
        self.wps, self.bps = float(weight_prior_std), float(bias_prior_std)
        self.tkw, self.mkw = float(task_kl_weight), float(meta_kl_weight)
        self.delta = float(delta)
        self.base_key = base_key
        self.interpret = interpret
        self.last_loss = float("nan")
        self.avg_loss = float("nan")
        self.last_diag = {}

        p_dim = int(hyper_prior.dim)
        h = self.hidden
        w_shapes = ([(self.D, h[0])]
                    + [(h[i - 1], h[i]) for i in range(1, len(h))]
                    + [(h[-1], 1)]) * 2
        b_shapes = ([(hh,) for hh in h] + [(1,)]) * 2
        n_w = sum(int(np.prod(s)) for s in w_shapes)
        n_b = sum(int(np.prod(s)) for s in b_shapes)
        self.p_dim = p_dim
        # ls (F=1) and nz have prior scale 1.0 -> log 1 = 0
        self.sum_log_sigma_p = float(n_w * math.log(self.wps)
                                     + n_b * math.log(self.bps))

        self._pack_state = pack_state
        self._unpack_state = unpack_state
        self.state_l = self._pack_params(params)
        self.m_l = [jnp.zeros_like(t) for t in self.state_l]
        self.v_l = [jnp.zeros_like(t) for t in self.state_l]

        sizes = np.asarray(jnp.sum(mask, axis=-1))
        self.n_eff = jnp.asarray(sizes.reshape(self.T, 1), jnp.float32)

        # n-major rows (row n*T + t)
        self.x = jnp.transpose(X, (1, 0, 2)).reshape(
            self.N * self.T, self.D).astype(jnp.float32)
        self.y_nm = jnp.transpose(Y, (1, 0)).reshape(
            self.N * self.T, 1).astype(jnp.float32)
        self.mask_nm = jnp.transpose(mask, (1, 0)).reshape(
            self.N * self.T, 1).astype(jnp.float32)

        hp, hidden_t, s_n, p_n = hyper_prior, self.hidden, self.S, p_dim
        t_n, b_n = self.T, self.B

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def make_pages(base_key, start_step, n_steps):
            steps = start_step + jnp.arange(n_steps)

            def one(i):
                key = jax.random.fold_in(base_key, i)
                k_task, k_theta = jax.random.split(key)
                idx = jax.random.randint(k_task, (b_n,), 0, t_n)
                counts = jnp.sum(jax.nn.one_hot(idx, t_n, dtype=jnp.float32),
                                 axis=0)
                eps = jax.random.normal(k_theta, (s_n, p_n), jnp.float32)
                return pack_mlap_page(hp, eps, counts, hidden_t)

            return jax.vmap(one)(steps)

        self._make_pages = make_pages

        def unpack_all(state_l, m_l, v_l):
            def unpack(lst):
                loc = self._unpack_state(
                    hp, dict(zip(self.names, lst[:len(self.names)])),
                    hidden_t, 1)[0]
                lsc = self._unpack_state(
                    hp, dict(zip(self.names,
                                 lst[len(self.names):2 * len(self.names)])),
                    hidden_t, 1)[0]
                qm = jnp.transpose(
                    lst[2 * len(self.names)].reshape(self.N, self.T), (1, 0))
                qt = jnp.transpose(
                    lst[2 * len(self.names) + 1].reshape(
                        self.N, self.N, self.T), (2, 0, 1))
                nu = lst[2 * len(self.names) + 2][0, 0]
                return {"hyper_post": {"loc": loc, "log_scale": lsc},
                        "q_means": qm, "q_trils": qt, "raw_noise": nu}

            return unpack(state_l), unpack(m_l), unpack(v_l)

        self._unpack_all = jax.jit(unpack_all)

    def _pack_params(self, tree):
        """Learner-layout pytree -> kernel state list (loc..., lsc..., qm,
        qt, nu)."""
        loc_p = self._pack_state(self.hp, tree["hyper_post"]["loc"][None, :],
                                 self.hidden)
        lsc_p = self._pack_state(
            self.hp, tree["hyper_post"]["log_scale"][None, :], self.hidden)
        qm = jnp.transpose(jnp.asarray(tree["q_means"], jnp.float32),
                           (1, 0)).reshape(self.N * self.T, 1)
        qt = jnp.transpose(jnp.asarray(tree["q_trils"], jnp.float32),
                           (1, 2, 0)).reshape(self.N * self.N * self.T, 1)
        nu = jnp.asarray(tree["raw_noise"], jnp.float32).reshape(1, 1)
        return ([loc_p[nm] for nm in self.names]
                + [lsc_p[nm] for nm in self.names] + [qm, qt, nu])

    def load_moments(self, mu_tree, nu_tree):
        """Resume: carry live Adam moments (same pytree layout as params)."""
        self.m_l = self._pack_params(mu_tree)
        self.v_l = self._pack_params(nu_tree)

    def run(self, n_steps, step0):
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
            staircase_launches,
        )

        for s, sub in staircase_launches(step0, n_steps, self.MAX_LAUNCH,
                                         self.lr_decay):
            self._run_one(sub, s)

    META_TEST = False

    def _run_one(self, n_steps, step0):
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
            staircase_lr,
        )

        # both param groups follow the same staircase (reference:
        # post_schedule = make_lr_schedule(lr * mult, lr_decay))
        fac = staircase_lr(1.0, self.lr_decay, step0)
        pages = self._make_pages(self.base_key, int(step0), int(n_steps))
        (self.state_l, self.m_l, self.v_l, self.last_loss, self.avg_loss,
         self.last_diag) = fused_mlap_train_packed(
            self.state_l, self.m_l, self.v_l, self.x, self.y_nm,
            self.mask_nm, self.n_eff, pages, float(step0), S=self.S,
            T=self.T, N=self.N, D=self.D, B=self.B, hidden=self.hidden,
            lr_main=self.lr_main * fac, lr_post=self.lr_post * fac,
            wps=self.wps,
            bps=self.bps, task_kl_weight=self.tkw, meta_kl_weight=self.mkw,
            delta=self.delta, p_dim=self.p_dim,
            sum_log_sigma_p=self.sum_log_sigma_p, n_steps=int(n_steps),
            meta_test=self.META_TEST, interpret=self.interpret)

    def sync(self):
        """(params, adam_mu, adam_nu) in the learner's pytree layout."""
        return self._unpack_all(self.state_l, self.m_l, self.v_l)


class FusedMLAPMetaTest(FusedMLAPTrainer):
    """Meta-test inference in one kernel launch per <=512-step page window.

    Same packed layouts and host driver as training, with three deltas
    (reference semantics: algos/pacoh_mlap.py run_inference /
    GPR_meta_mlap.py:372-390):

    - the kernel is built with meta_test=True: hyper-posterior + noise are
      frozen (theta still sampled per step), loss = SUM of per-task bounds
      (no meta-complexity), only (q_means, q_trils) get Adam (lr_post);
    - per-step randomness mirrors run_inference EXACTLY: the step-i theta
      noise is jax.random.normal(split(k_opt, total_iters)[i], [S, P]) —
      posterior_rsample's draw — instead of training's fold_in discipline;
    - task-draw counts are all-ones (every test task, every step).

    Construct with n_tasks = number of TEST tasks (T of X/Y/mask) but the
    BOUND's log(n_tasks) term taken from the meta-TRAIN task count via
    bound_n_tasks (the learner passes self.n_tasks).
    """

    META_TEST = True

    def __init__(self, hyper_prior, params, X, Y, mask, *, hidden, lr,
                 svi_batch_size, task_kl_weight, meta_kl_weight, delta,
                 bound_n_tasks, weight_prior_std, bias_prior_std, base_key,
                 total_iters, interpret=False):
        super().__init__(
            hyper_prior, params, X, Y, mask, hidden=hidden, lr=lr,
            posterior_lr_multiplier=1.0, task_batch_size=1,
            svi_batch_size=svi_batch_size, task_kl_weight=task_kl_weight,
            meta_kl_weight=meta_kl_weight, delta=delta,
            weight_prior_std=weight_prior_std, bias_prior_std=bias_prior_std,
            base_key=base_key, interpret=interpret)
        # the complexity term's log(n_tasks): meta-train count, not T_test
        # (run_inference passes self.n_tasks). Encoded via meta_ct which is
        # static inside the kernel maker -> carry it through delta'/T: the
        # kernel computes meta_ct = log 2 + log T - log delta with T = the
        # kernel's T (test tasks). Rescale delta so the sum matches:
        # log 2 + log T_test - log delta' == log 2 + log n_tasks - log delta.
        self.delta = float(delta * self.T / float(bound_n_tasks))

        hp, hidden_t, s_n, p_n = hyper_prior, self.hidden, self.S, self.p_dim
        t_n = self.T
        total = int(total_iters)

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def make_pages_mt(k_opt, start_step, n_steps):
            keys = jax.random.split(k_opt, total)
            idx = start_step + jnp.arange(n_steps)

            def one(i):
                eps = jax.random.normal(keys[i], (s_n, p_n), jnp.float32)
                return pack_mlap_page(hp, eps, jnp.ones((t_n,), jnp.float32),
                                      hidden_t)

            return jax.vmap(one)(idx)

        self._make_pages = make_pages_mt

    def q_params(self):
        """{'q_means' [T, N], 'q_trils' [T, N, N]} in the learner layout."""
        params, _, _ = self.sync()
        return {"q_means": params["q_means"], "q_trils": params["q_trils"]}

    def reset(self, params, X, Y, mask, base_key):
        """Re-arm a cached instance for a new inference call: repack state,
        zero the Adam moments, swap the context data and key. The repack is
        ONE jitted call (built lazily, cached on the instance) — eager
        packing dispatches ~100 tiny ops through the device tunnel, which
        costs more than the whole 3000-step inference."""
        assert X.shape == (self.T, self.N, self.D)
        fn = getattr(self, "_reset_jit", None)
        if fn is None:
            def repack(params, X, Y, mask):
                state_l = self._pack_params(params)
                # two DISTINCT zero lists: m_l and v_l are donated buffers
                # of the kernel call and must not alias each other
                zeros_m = [jnp.zeros_like(t) for t in state_l]
                zeros_v = [jnp.zeros_like(t) for t in state_l]
                n_eff = jnp.sum(mask, axis=-1).reshape(
                    self.T, 1).astype(jnp.float32)
                x = jnp.transpose(X, (1, 0, 2)).reshape(
                    self.N * self.T, self.D).astype(jnp.float32)
                y_nm = jnp.transpose(Y, (1, 0)).reshape(
                    self.N * self.T, 1).astype(jnp.float32)
                mask_nm = jnp.transpose(mask, (1, 0)).reshape(
                    self.N * self.T, 1).astype(jnp.float32)
                return state_l, zeros_m, zeros_v, n_eff, x, y_nm, mask_nm

            fn = self._reset_jit = jax.jit(repack)
        (self.state_l, self.m_l, self.v_l, self.n_eff, self.x, self.y_nm,
         self.mask_nm) = fn(params, X, Y, mask)
        self.base_key = base_key
