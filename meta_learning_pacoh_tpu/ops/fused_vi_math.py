"""Closed-form PACOH-VI step: hand-derived backward, no autodiff.

This module is the mathematical spec (and the always-available XLA
implementation) for the fully-fused Pallas VI training kernel
(ops/pallas/fused_vi_kernel.py). One iteration of the diag-Gaussian
variational hyper-posterior fit (reference semantics:
meta_learn/GPR_meta_vi.py:216-226 — S reparameterized samples of the
negative ELBO; the entropy term is closed-form, matching
algos/pacoh_vi.py):

    sample_s   = loc + exp(log_scale) * eps_s                  eps_s ~ N(0, I)
    obj_s      = prior_factor * log N(sample_s | hyper-prior)
                 + m~/(m~+T) * sum_t MLL_t(sample_s) / n_t
    neg_elbo   = -( mean_s obj_s + prior_factor * H(q) ),
    H(q)       = P/2 (1 + log 2pi) + sum_p log_scale_p

whose reparameterization gradients are

    d neg_elbo / d loc        = -mean_s score_s
    d neg_elbo / d log_scale  = -exp(log_scale) * mean_s (score_s * eps_s)
                                - prior_factor
    score_s = d obj_s / d theta  |_{theta = sample_s}

followed by an exact optax.adam update. The per-sample score is EXACTLY
the PACOH-SVGD particle score (samples play the role of particles), so
this spec reuses `ops.fused_svgd_math.svgd_score_closed_form` — the same
hand-derived backward that the fused SVGD kernel implements.

Constraints (same window as the SVGD spec): NN/NN RandomGP flavor,
feature_dim 1, N <= 8 (the unrolled-linalg window), cov_type 'diag'.
Verified against jax.grad of the live learner's neg_elbo in
tests/test_fused_vi.py.
"""

import math

import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.ops.fused_svgd_math import (
    blocks_to_particles,
    particles_to_blocks,
    svgd_score_closed_form,
)

_LOG_2PI = math.log(2.0 * math.pi)


def vi_neg_elbo_and_grads(post, eps, X, Y, mask, hyper_prior, *,
                          prior_factor, weight_prior_std, bias_prior_std):
    """neg-ELBO value + hand-derived (loc, log_scale) gradients.

    post: {'loc': [P], 'log_scale': [P]}; eps: [S, P] standard normals
    (the reparameterization noise — passing it explicitly makes the spec,
    the Pallas kernel and the XLA learner step exactly comparable).
    Returns (loss, {'loc': g, 'log_scale': g}).
    """
    loc, log_scale = post["loc"], post["log_scale"]
    scale = jnp.exp(log_scale)
    samples = loc[None, :] + scale[None, :] * eps  # [S, P]

    blocks = particles_to_blocks(hyper_prior, samples)
    score_blocks, obj = svgd_score_closed_form(
        blocks, X, Y, mask, prior_factor=prior_factor,
        weight_prior_std=weight_prior_std, bias_prior_std=bias_prior_std)
    score = blocks_to_particles(hyper_prior, score_blocks)  # [S, P]

    g_loc = -jnp.mean(score, axis=0)
    g_ls = -scale * jnp.mean(score * eps, axis=0) - prior_factor

    dim = loc.shape[0]
    entropy = 0.5 * dim * (1.0 + _LOG_2PI) + jnp.sum(log_scale)
    loss = -(jnp.mean(obj) + prior_factor * entropy)
    return loss, {"loc": g_loc, "log_scale": g_ls}


def vi_step_closed_form(post, m, v, step, eps, X, Y, mask, hyper_prior, *,
                        prior_factor, weight_prior_std, bias_prior_std, lr,
                        b1=0.9, b2=0.999, adam_eps=1e-8):
    """One full VI iteration (grads -> exact optax.adam), closed form.

    m, v: Adam moments with the same {'loc','log_scale'} structure.
    step is the 0-based global step. Returns (post', m', v', loss).
    """
    loss, g = vi_neg_elbo_and_grads(
        post, eps, X, Y, mask, hyper_prior, prior_factor=prior_factor,
        weight_prior_std=weight_prior_std, bias_prior_std=bias_prior_std)

    t = step + 1.0

    def upd(theta, m_, v_, gg):
        m_n = b1 * m_ + (1.0 - b1) * gg
        v_n = b2 * v_ + (1.0 - b2) * gg * gg
        m_hat = m_n / (1.0 - b1 ** t)
        v_hat = v_n / (1.0 - b2 ** t)
        return theta - lr * m_hat / (jnp.sqrt(v_hat) + adam_eps), m_n, v_n

    new_post, new_m, new_v = {}, {}, {}
    for k in ("loc", "log_scale"):
        new_post[k], new_m[k], new_v[k] = upd(post[k], m[k], v[k], g[k])
    return new_post, new_m, new_v, loss
