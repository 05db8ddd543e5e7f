"""Closed-form PACOH-SVGD step: hand-derived backward, no autodiff.

This module is the mathematical spec (and the always-available XLA
implementation) for the fully-fused Pallas SVGD training kernel: one
iteration = score of every particle (forward + hand-derived backward of the
masked exact-GP MLL + hyper-prior), RBF median-heuristic Stein transport,
and an exact optax-Adam update — expressed block-by-block over the GP-prior
parameter blocks so no flat [K, P] vector is ever materialized (pairwise
particle distances are summed per block instead).

Semantics are EXACTLY `algos.pacoh_svgd` single_step for the NN/NN RandomGP
flavor at N <= 8 (the unrolled-linalg window of ops/gp.gp_mll):
  obj_k = prior_factor * log N(theta_k | hyper-prior)
          + m~/(m~+T) * sum_t MLL_t(theta_k) / n_t
  phi   = (K_xx @ score + grad_K) / K,  gamma = 1/(1e-8 + 2 median(d2)/(2 log(K+1)))
  theta <- optax.adam(lr) update with gradient -phi
including the stop-gradient jitter escalation {0, 1e-4, 1e-2} of the
unrolled Cholesky path (ops/gp.py gp_mll) and add_noise_masked's padded-row
identity convention. Verified against jax.grad + the live learner in
tests/test_fused_svgd.py.

Reference math being replaced: meta_learn/svgd.py:12-28,
random_gp.py:194-222, gpytorch ExactMarginalLogLikelihood.
"""

import math

import jax
import jax.numpy as jnp

# the unrolled small-N linalg is the SAME code the live gp_mll path uses —
# imported, not copied, so this spec cannot silently diverge from it
from meta_learning_pacoh_tpu.ops.chol import (
    unrolled_cholesky as _unrolled_chol_batched,
    unrolled_solve_lower as _unrolled_solve_lower,
    unrolled_solve_lower_T as _unrolled_solve_lower_T,
)

_LOG_2PI = math.log(2.0 * math.pi)


# ------------------------------------------------------------------ blocks


def particles_to_blocks(hyper_prior, particles):
    """[K, P] flat particles -> per-block dict with K leading.

    Blocks: mean_ws/mean_bs and kernel_ws/kernel_bs (lists, one per layer),
    ls_raw [K, F], noise_raw [K]. NN/NN config only.
    """
    params_k = jax.vmap(hyper_prior.unravel)(particles)
    mean_nn, kernel_nn = params_k["mean_nn"], params_k["kernel_nn"]

    def net_lists(net):
        n_hidden = len(net) // 2 - 1
        names = [str(i) for i in range(n_hidden)] + ["out"]
        return ([net[f"w_{n}"] for n in names], [net[f"b_{n}"] for n in names])

    mws, mbs = net_lists(mean_nn)
    kws, kbs = net_lists(kernel_nn)
    return {
        "mean_ws": mws, "mean_bs": mbs,
        "kernel_ws": kws, "kernel_bs": kbs,
        "ls_raw": params_k["lengthscale_raw"],
        "noise_raw": params_k["noise_raw"],
    }


def blocks_to_particles(hyper_prior, blocks):
    """Inverse of particles_to_blocks."""

    def one(mws, mbs, kws, kbs, ls, nz):
        n_hidden = len(mws) - 1
        names = [str(i) for i in range(n_hidden)] + ["out"]
        mean_nn = {}
        kernel_nn = {}
        for n, w, b in zip(names, mws, mbs):
            mean_nn[f"w_{n}"] = w
            mean_nn[f"b_{n}"] = b
        for n, w, b in zip(names, kws, kbs):
            kernel_nn[f"w_{n}"] = w
            kernel_nn[f"b_{n}"] = b
        params = {
            "kernel_nn": kernel_nn, "lengthscale_raw": ls, "mean_nn": mean_nn,
            "noise_raw": nz,
        }
        from jax.flatten_util import ravel_pytree

        return ravel_pytree(params)[0]

    return jax.vmap(one)(
        blocks["mean_ws"], blocks["mean_bs"], blocks["kernel_ws"],
        blocks["kernel_bs"], blocks["ls_raw"], blocks["noise_raw"],
    )


def hyper_prior_block_scales(n_layers, weight_prior_std, bias_prior_std):
    """(loc, scale) per block, aligned with particles_to_blocks output.
    n_layers = number of weight matrices per MLP (hidden layers + 1)."""
    return {
        "mean_ws": [(0.0, weight_prior_std)] * n_layers,
        "mean_bs": [(0.0, bias_prior_std)] * n_layers,
        "kernel_ws": [(0.0, weight_prior_std)] * n_layers,
        "kernel_bs": [(0.0, bias_prior_std)] * n_layers,
        "ls_raw": (0.0, 1.0),
        "noise_raw": (-1.0, 1.0),
    }


# ---------------------------------------------------------------- forward


def _mlp_fwd(ws, bs, x):
    """Batched-over-K MLP forward. x [M, D] shared; ws[i] [K, d_i, d_o].

    Returns (out [K, M, d_out], activations [a_1 .. a_L] with a_i [K, M, h]).
    """
    acts = []
    h = jnp.einsum("md,kdh->kmh", x, ws[0]) + bs[0][:, None, :]
    h = jnp.tanh(h)
    acts.append(h)
    for w, b in zip(ws[1:-1], bs[1:-1]):
        h = jnp.einsum("kmd,kdh->kmh", h, w) + b[:, None, :]
        h = jnp.tanh(h)
        acts.append(h)
    out = jnp.einsum("kmd,kdh->kmh", h, ws[-1]) + bs[-1][:, None, :]
    return out, acts


def _mlp_bwd(ws, bs, x, acts, g_out):
    """Backward of _mlp_fwd. g_out [K, M, d_out] -> (dws, dbs) lists."""
    n = len(ws)
    dws = [None] * n
    dbs = [None] * n
    g = g_out
    for i in range(n - 1, 0, -1):
        a_prev = acts[i - 1]
        dws[i] = jnp.einsum("kmd,kmh->kdh", a_prev, g)
        dbs[i] = jnp.sum(g, axis=1)
        g = jnp.einsum("kmh,kdh->kmd", g, ws[i])
        g = g * (1.0 - a_prev * a_prev)  # tanh'
    dws[0] = jnp.einsum("md,kmh->kdh", x, g)
    dbs[0] = jnp.sum(g, axis=1)
    return dws, dbs




def _unrolled_lower_inv(L):
    """W = L^-1 for lower-triangular [..., N, N], unrolled (columns of I)."""
    n = L.shape[-1]
    eye = jnp.eye(n, dtype=L.dtype)
    cols = [
        _unrolled_solve_lower(L, jnp.broadcast_to(eye[j], L.shape[:-2] + (n,)))
        for j in range(n)
    ]
    return jnp.stack(cols, axis=-1)  # [..., N(row), N(col=j)] = W


def _softplus(x):
    return jax.nn.softplus(x)


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def svgd_score_closed_form(blocks, X, Y, mask, *, prior_factor,
                           weight_prior_std, bias_prior_std):
    """Hand-derived score grad_theta obj for every particle, block-by-block.

    X [T, N, D], Y [T, N], mask [T, N]. Returns (score_blocks, obj [K]).
    """
    T, N, D = X.shape
    K = blocks["ls_raw"].shape[0]
    F = blocks["ls_raw"].shape[1]
    x_flat = X.reshape(T * N, D)

    mu_flat, m_acts = _mlp_fwd(blocks["mean_ws"], blocks["mean_bs"], x_flat)
    phi_flat, k_acts = _mlp_fwd(blocks["kernel_ws"], blocks["kernel_bs"], x_flat)
    mu = mu_flat[..., 0].reshape(K, T, N)
    phi = phi_flat.reshape(K, T, N, F)

    ls = _softplus(blocks["ls_raw"])  # [K, F]
    noise = _softplus(blocks["noise_raw"])  # [K]
    z = phi / ls[:, None, None, :]  # [K, T, N, F]

    # pairwise squared distances per (k, t)
    zn = jnp.sum(z * z, axis=-1)
    cross = jnp.einsum("ktnf,ktmf->ktnm", z, z)
    d2 = jnp.maximum(zn[..., :, None] + zn[..., None, :] - 2.0 * cross, 0.0)
    Km = jnp.exp(-0.5 * d2)  # [K, T, N, N]

    eye = jnp.eye(N, dtype=X.dtype)
    m2 = mask[:, :, None] * mask[:, None, :]  # [T, N, N]
    diag = jnp.where(mask > 0, noise[:, None, None] + 1e-6, 1.0)  # [K, T, N]
    Kn = Km * m2[None] + diag[..., None] * eye  # [K, T, N, N]

    r = (Y[None] - mu) * mask[None]  # [K, T, N]
    n_eff = jnp.sum(mask, axis=-1)  # [T]

    # stop-gradient jitter escalation, identical to ops/gp.gp_mll
    Kn_nd = jax.lax.stop_gradient(Kn)

    def ok(j):
        dgn = jnp.diagonal(_unrolled_chol_batched(Kn_nd + j * eye),
                           axis1=-2, axis2=-1)
        return jnp.all(jnp.isfinite(dgn), axis=-1) & jnp.all(dgn > 0, axis=-1)

    jit_sel = jnp.where(ok(0.0), 0.0, jnp.where(ok(1e-4), 1e-4, 1e-2))
    Kn = Kn + jit_sel[..., None, None] * eye

    L = _unrolled_chol_batched(Kn)
    zs = _unrolled_solve_lower(L, r)
    quad = jnp.sum(zs * zs, axis=-1)  # [K, T]
    ldiag = jnp.diagonal(L, axis1=-2, axis2=-1)
    logdet = 2.0 * jnp.sum(jnp.log(ldiag), axis=-1)
    mll = -0.5 * (quad + logdet + n_eff[None] * _LOG_2PI) / n_eff[None]

    harmonic = 1.0 / jnp.mean(1.0 / n_eff)
    pre = harmonic / (harmonic + T)

    # ---------------- backward (hand-derived) ----------------
    w_t = pre / n_eff[None]  # [K(T broadcast), T] scale on each task's terms

    alpha = _unrolled_solve_lower_T(L, zs)  # [K, T, N] = Kn^-1 r
    W = _unrolled_lower_inv(L)  # [K, T, N, N]
    Kinv = jnp.einsum("ktni,ktnj->ktij", W, W)  # W^T W

    G_Kn = (0.5 * w_t[..., None, None]
            * (alpha[..., :, None] * alpha[..., None, :] - Kinv))
    d_mu = w_t[..., None] * alpha * mask[None]  # [K, T, N]

    d_noise = _sigmoid(blocks["noise_raw"]) * jnp.einsum(
        "ktnn,tn->k", G_Kn, mask
    )

    dKm = G_Kn * m2[None]
    dd2 = dKm * Km * (-0.5)
    A = dd2 + jnp.swapaxes(dd2, -1, -2)
    rowsum = jnp.sum(A, axis=-1)
    dz = 2.0 * (rowsum[..., None] * z - jnp.einsum("ktnm,ktmf->ktnf", A, z))

    d_ls = _sigmoid(blocks["ls_raw"]) * (
        -jnp.einsum("ktnf,ktnf->kf", dz, z) / ls
    )
    d_phi = dz / ls[:, None, None, :]

    d_mean_out = d_mu.reshape(K, T * N, 1)
    d_phi_flat = d_phi.reshape(K, T * N, F)

    d_mws, d_mbs = _mlp_bwd(blocks["mean_ws"], blocks["mean_bs"], x_flat,
                            m_acts, d_mean_out)
    d_kws, d_kbs = _mlp_bwd(blocks["kernel_ws"], blocks["kernel_bs"], x_flat,
                            k_acts, d_phi_flat)

    # hyper-prior gradient: prior_factor * d log N(theta | loc, scale)
    scales = hyper_prior_block_scales(len(blocks["mean_ws"]),
                                      weight_prior_std, bias_prior_std)

    def add_prior(g, theta, loc_scale):
        loc, scale = loc_scale
        return g + prior_factor * (-(theta - loc) / (scale * scale))

    score = {
        "mean_ws": [add_prior(g, t, s) for g, t, s in
                    zip(d_mws, blocks["mean_ws"], scales["mean_ws"])],
        "mean_bs": [add_prior(g, t, s) for g, t, s in
                    zip(d_mbs, blocks["mean_bs"], scales["mean_bs"])],
        "kernel_ws": [add_prior(g, t, s) for g, t, s in
                      zip(d_kws, blocks["kernel_ws"], scales["kernel_ws"])],
        "kernel_bs": [add_prior(g, t, s) for g, t, s in
                      zip(d_kbs, blocks["kernel_bs"], scales["kernel_bs"])],
        "ls_raw": add_prior(d_ls, blocks["ls_raw"], scales["ls_raw"]),
        "noise_raw": add_prior(d_noise, blocks["noise_raw"],
                               scales["noise_raw"]),
    }

    # objective value (for diagnostics): prior term + weighted MLL sum
    def lp_term(theta, loc_scale):
        loc, scale = loc_scale
        zq = (theta - loc) / scale
        return jnp.sum(
            (-0.5 * (zq * zq + _LOG_2PI) - math.log(scale)).reshape(theta.shape[0], -1),
            axis=-1,
        )

    lp = (sum(lp_term(t, s) for t, s in zip(blocks["mean_ws"], scales["mean_ws"]))
          + sum(lp_term(t, s) for t, s in zip(blocks["mean_bs"], scales["mean_bs"]))
          + sum(lp_term(t, s) for t, s in zip(blocks["kernel_ws"], scales["kernel_ws"]))
          + sum(lp_term(t, s) for t, s in zip(blocks["kernel_bs"], scales["kernel_bs"]))
          + lp_term(blocks["ls_raw"], scales["ls_raw"])
          + lp_term(blocks["noise_raw"][:, None], scales["noise_raw"]))
    obj = prior_factor * lp + pre * jnp.sum(mll, axis=-1)
    return score, obj


# --------------------------------------------------------------- transport


def bisect_median(d2, iters=30):
    """Order-statistic median via bisection counting — the convention of the
    Pallas SVGD kernels (lower-middle element, not midpoint-averaged)."""

    def step(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d2 <= mid).astype(jnp.float32))
        take_low = cnt > (d2.size // 2)
        return jnp.where(take_low, lo, mid), jnp.where(take_low, mid, hi)

    lo, hi = jax.lax.fori_loop(0, iters, step, (jnp.min(d2), jnp.max(d2)))
    return 0.5 * (lo + hi)


def svgd_transport_blocks(blocks, score, use_bisect_median=False):
    """RBF median-heuristic Stein transport, block-by-block (no flat vector).

    use_bisect_median=True matches the Pallas kernels' median convention
    (and the fused training kernel); False matches jnp.median (the XLA
    learner path on CPU). Returns phi blocks structured like `score`.
    """
    K = blocks["ls_raw"].shape[0]

    def flat2(v):
        return v.reshape(K, -1)

    leaves_theta = (blocks["mean_ws"] + blocks["mean_bs"]
                    + blocks["kernel_ws"] + blocks["kernel_bs"]
                    + [blocks["ls_raw"], blocks["noise_raw"][:, None]])
    d2 = jnp.zeros((K, K), dtype=blocks["ls_raw"].dtype)
    for th in leaves_theta:
        f = flat2(th)
        sq = jnp.sum(f * f, axis=-1)
        d2 = d2 + sq[:, None] + sq[None, :] - 2.0 * (f @ f.T)
    d2 = jnp.maximum(d2, 0.0)

    med = bisect_median(d2) if use_bisect_median else jnp.median(d2)
    h = med / (2.0 * math.log(K + 1))
    gamma = jax.lax.stop_gradient(1.0 / (1e-8 + 2.0 * h))
    K_xx = jnp.exp(-gamma * d2)
    row_sum = jnp.sum(K_xx, axis=1)  # [K]

    def transport(theta, s):
        f_t, f_s = flat2(theta), flat2(s)
        out = (K_xx @ f_s + 2.0 * gamma * (f_t * row_sum[:, None] - K_xx @ f_t)) / K
        return out.reshape(theta.shape)

    return jax.tree.map(transport, blocks, score)


# -------------------------------------------------------------------- adam


def adam_update_blocks(blocks, m, v, phi, step, *, lr, b1=0.9, b2=0.999,
                       eps=1e-8):
    """Exact optax.adam update with gradient g = -phi. step is 0-based."""
    t = step + 1.0

    def upd(theta, m_, v_, p):
        g = -p
        m_n = b1 * m_ + (1.0 - b1) * g
        v_n = b2 * v_ + (1.0 - b2) * g * g
        m_hat = m_n / (1.0 - b1 ** t)
        v_hat = v_n / (1.0 - b2 ** t)
        return theta - lr * m_hat / (jnp.sqrt(v_hat) + eps), m_n, v_n

    flat_b, treedef = jax.tree.flatten(blocks)
    flat_m = jax.tree.leaves(m)
    flat_v = jax.tree.leaves(v)
    flat_p = jax.tree.leaves(phi)
    new_b, new_m, new_v = [], [], []
    for th, m_, v_, p in zip(flat_b, flat_m, flat_v, flat_p):
        a, b, c = upd(th, m_, v_, p)
        new_b.append(a)
        new_m.append(b)
        new_v.append(c)
    return (jax.tree.unflatten(treedef, new_b),
            jax.tree.unflatten(treedef, new_m),
            jax.tree.unflatten(treedef, new_v))


def svgd_step_closed_form(blocks, m, v, step, X, Y, mask, *, prior_factor,
                          weight_prior_std, bias_prior_std, lr,
                          use_bisect_median=False):
    """One full SVGD iteration (score -> transport -> Adam), closed form."""
    score, _ = svgd_score_closed_form(
        blocks, X, Y, mask, prior_factor=prior_factor,
        weight_prior_std=weight_prior_std, bias_prior_std=bias_prior_std)
    phi = svgd_transport_blocks(blocks, score,
                                use_bisect_median=use_bisect_median)
    return adam_update_blocks(blocks, m, v, phi, step, lr=lr)
