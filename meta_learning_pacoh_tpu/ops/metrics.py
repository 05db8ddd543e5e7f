"""Jit-friendly evaluation metrics: avg log-likelihood, RMSE, calibration.

Pure-function versions of the reference's eval stack (reference:
meta_learn/abstract.py:134-163, :260-272) operating on *normalized-space*
predictive moments plus the y-normalization constants, so a whole test-task
batch evaluates inside one jit/vmap call instead of a Python loop over tasks.
"""

import math

import jax.numpy as jnp
import jax.scipy.special as jsp

from meta_learning_pacoh_tpu.ops.gp import mvn_log_prob

_SQRT2 = math.sqrt(2.0)


def _normal_cdf(value, loc, scale):
    return 0.5 * (1.0 + jsp.erf((value - loc) / (scale * _SQRT2)))


def calib_error_from_cdf(cdf_vals):
    """RMSE between empirical CDF frequencies and 20 levels in [0.05, 0.95]."""
    n = cdf_vals.shape[-1]
    conf_levels = jnp.linspace(0.05, 0.95, 20)
    emp_freq = jnp.sum(
        (cdf_vals[..., :, None] <= conf_levels), axis=-2
    ) / n
    return jnp.sqrt(jnp.mean((emp_freq - conf_levels) ** 2, axis=-1))


def gp_eval_metrics(mean_n, cov_n, y, y_mean, y_std):
    """Metrics for a single-GP (MVN) predictive.

    mean_n [N], cov_n [N, N] in normalized space; y [N] original units.
    Returns (avg_ll, rmse, calib_err). avg_ll is the joint log density of the
    affine-transformed MVN divided by N (reference convention).
    """
    n = y.shape[0]
    y_n = (y - y_mean) / y_std
    joint_lp = mvn_log_prob(y_n, mean_n, cov_n) - n * jnp.log(y_std)
    avg_ll = joint_lp / n

    mean_o = y_mean + y_std * mean_n
    std_o = y_std * jnp.sqrt(jnp.diagonal(cov_n))
    rmse = jnp.sqrt(jnp.mean((mean_o - y) ** 2))
    calib = calib_error_from_cdf(_normal_cdf(y, mean_o, std_o))
    return avg_ll, rmse, calib


def mixture_eval_metrics(means_n, covs_n, y, y_mean, y_std):
    """Metrics for an equal-weight mixture of K GP predictives.

    means_n [K, N], covs_n [K, N, N] normalized space; y [N] original units.
    Mixture joint LL = logsumexp_k(MVN_k) - log K (reference:
    models.py:121-126); per-point calibration uses the mixture of Normals.
    """
    import jax

    k, n = means_n.shape
    y_n = (y - y_mean) / y_std
    joint_lps = jax.vmap(lambda m, c: mvn_log_prob(y_n, m, c))(means_n, covs_n)
    joint_lps = joint_lps - n * jnp.log(y_std)
    avg_ll = (jsp.logsumexp(joint_lps) - jnp.log(float(k))) / n

    means_o = y_mean + y_std * means_n  # [K, N]
    stds_o = y_std * jnp.sqrt(jnp.diagonal(covs_n, axis1=-2, axis2=-1))
    mix_mean = jnp.mean(means_o, axis=0)
    rmse = jnp.sqrt(jnp.mean((mix_mean - y) ** 2))
    cdf_vals = jnp.mean(_normal_cdf(y[None, :], means_o, stds_o), axis=0)
    calib = calib_error_from_cdf(cdf_vals)
    return avg_ll, rmse, calib
