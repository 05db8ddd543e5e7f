"""Functional 'LearnedGP': NN mean + NN-featurized RBF-ARD kernel + noise.

Replaces the reference's `LearnedGPRegressionModel` (reference:
meta_learn/models.py:489-538) and `VectorizedGP` (reference:
meta_learn/random_gp.py:22-114) with one static config + one parameter
pytree + pure functions. Two constraint flavors exist in the reference and
are preserved:

- MAP/gpytorch flavor (`has_outputscale=True, noise_floor=1e-3`):
  lengthscale/outputscale = softplus(raw), noise = softplus(raw) + 1e-3
  (reference: GPR_meta_mll.py:54-56, gpytorch ScaleKernel+RBFKernel defaults).
- RandomGP flavor (`has_outputscale=False, noise_floor=0`):
  lengthscale/noise = softplus(raw), outputscale fixed to 1
  (reference: random_gp.py:69-74, SEKernelLight with default output_scale).

`noise_var` is the observation-noise *variance*.
"""

import dataclasses

import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.models.mlp import init_mlp_params, mlp_apply
from meta_learning_pacoh_tpu.models.modules import KernelModule, MeanModule
from meta_learning_pacoh_tpu.ops.kernels import rbf_ard, softplus
from meta_learning_pacoh_tpu.ops import gp as gp_ops


@dataclasses.dataclass(frozen=True)
class GPConfig:
    input_dim: int
    feature_dim: int = 2
    # 'NN' | 'constant' | 'zero' | a models.modules.MeanModule instance
    mean_module: object = "NN"
    # 'NN' | 'SE' | a models.modules.KernelModule instance (the reference
    # accepts arbitrary gpytorch modules here, GPR_mll.py:40-41)
    covar_module: object = "NN"
    mean_nn_layers: tuple = (32, 32)
    kernel_nn_layers: tuple = (32, 32)
    has_outputscale: bool = True
    noise_floor: float = 1e-3
    init_scheme: str = "torch_linear"
    learn_likelihood: bool = True

    @property
    def ard_dims(self):
        return self.feature_dim if self.covar_module == "NN" else self.input_dim


def init_gp_params(cfg: GPConfig, key):
    """Parameter pytree. Raw (unconstrained) hyperparameters start at 0,
    matching gpytorch's raw-parameter initialization."""
    k_mean, k_kernel = jax.random.split(key)
    params = {}
    if isinstance(cfg.mean_module, MeanModule):
        params["custom_mean"] = cfg.mean_module.init_params(k_mean, cfg.input_dim)
    elif cfg.mean_module == "NN":
        params["mean_nn"] = init_mlp_params(
            k_mean, cfg.input_dim, 1, cfg.mean_nn_layers, scheme=cfg.init_scheme
        )
    elif cfg.mean_module == "constant":
        params["constant_mean"] = jnp.zeros((1,))
    elif cfg.mean_module != "zero":
        raise ValueError(f"unknown mean_module {cfg.mean_module!r}")

    if isinstance(cfg.covar_module, KernelModule):
        # a custom kernel owns its hyperparameters (no framework
        # lengthscale/outputscale — the reference likewise leaves a
        # user-supplied gpytorch kernel unwrapped, GPR_mll.py:74-78)
        params["custom_kernel"] = cfg.covar_module.init_params(
            k_kernel, cfg.input_dim
        )
        params["noise_raw"] = jnp.zeros(())
        return params
    if cfg.covar_module == "NN":
        params["kernel_nn"] = init_mlp_params(
            k_kernel, cfg.input_dim, cfg.feature_dim, cfg.kernel_nn_layers,
            scheme=cfg.init_scheme,
        )
    elif cfg.covar_module != "SE":
        raise ValueError(f"unknown covar_module {cfg.covar_module!r}")

    params["lengthscale_raw"] = jnp.zeros((cfg.ard_dims,))
    if cfg.has_outputscale:
        params["outputscale_raw"] = jnp.zeros(())
    params["noise_raw"] = jnp.zeros(())
    return params


def gp_mean(cfg: GPConfig, params, x):
    """Prior mean at x [N, D] -> [N]."""
    if isinstance(cfg.mean_module, MeanModule):
        return cfg.mean_module.mean(params["custom_mean"], x)
    if cfg.mean_module == "NN":
        return mlp_apply(params["mean_nn"], x)[..., 0]
    if cfg.mean_module == "constant":
        return jnp.broadcast_to(params["constant_mean"][0], x.shape[:-1])
    return jnp.zeros(x.shape[:-1], dtype=x.dtype)


def gp_features(cfg: GPConfig, params, x):
    if cfg.covar_module == "NN":
        return mlp_apply(params["kernel_nn"], x)
    return x


def gp_noise(cfg: GPConfig, params):
    """Observation-noise variance (always a framework-level parameter, even
    under a custom kernel — the reference's GaussianLikelihood is separate
    from the covar module)."""
    return softplus(params["noise_raw"]) + cfg.noise_floor


def gp_hypers(cfg: GPConfig, params):
    if isinstance(cfg.covar_module, KernelModule):
        # a custom kernel owns its hyperparameters; only noise is shared
        return None, None, gp_noise(cfg, params)
    ls = softplus(params["lengthscale_raw"])
    os_ = softplus(params["outputscale_raw"]) if cfg.has_outputscale else jnp.asarray(1.0)
    return ls, os_, gp_noise(cfg, params)


def gp_gram(cfg: GPConfig, params, x1, x2=None):
    """Kernel matrix on (NN-featurized) inputs. x1 [N, D], x2 [M, D] -> [N, M]."""
    if isinstance(cfg.covar_module, KernelModule):
        return cfg.covar_module.gram(
            params["custom_kernel"], x1, x1 if x2 is None else x2
        )
    f1 = gp_features(cfg, params, x1)
    f2 = f1 if x2 is None else gp_features(cfg, params, x2)
    ls, os_, _ = gp_hypers(cfg, params)
    return rbf_ard(f1, f2, ls, os_)


def gp_prior_mll(cfg: GPConfig, params, x, y, mask=None):
    """Exact marginal log-likelihood / n (gpytorch convention).

    x [N, D], y [N], mask [N] or None -> scalar.
    """
    mean = gp_mean(cfg, params, x)
    K = gp_gram(cfg, params, x)
    _, _, noise = gp_hypers(cfg, params)
    return gp_ops.gp_mll(mean, K, y, noise, mask=mask)


def gp_prior_mll_batch(cfg: GPConfig, params, X, Y, mask=None):
    """Batched task MLLs under SHARED params: X [T, N, D], Y [T, N] -> [T].
    Routes the linalg cores through the batched dispatch (Pallas kernel /
    unrolled expressions) instead of a per-task vmap of XLA factorizations."""
    means = jax.vmap(lambda x: gp_mean(cfg, params, x))(X)
    Ks = jax.vmap(lambda x: gp_gram(cfg, params, x))(X)
    _, _, noise = gp_hypers(cfg, params)
    return gp_ops.gp_mll_batch(means, Ks, Y, noise, mask)


def gp_predict(cfg: GPConfig, params, x_context, y_context, x_test, mask_c=None,
               observation_noise=True):
    """Posterior predictive at x_test given context data.

    x_context [Nc, D], y_context [Nc], x_test [Nt, D]
    -> (mean [Nt], cov [Nt, Nt]); cov includes observation noise when asked
    (the reference's `likelihood(gp(x))` predictive, GPR_meta_mll.py:181).
    """
    noise = gp_noise(cfg, params)
    if isinstance(cfg.covar_module, KernelModule):
        K_cc = gp_gram(cfg, params, x_context)
        K_ct = gp_gram(cfg, params, x_context, x_test)
        K_tt = gp_gram(cfg, params, x_test)
    else:
        # built-in path: featurize once, reuse across the three grams
        f_c = gp_features(cfg, params, x_context)
        f_t = gp_features(cfg, params, x_test)
        ls, os_, _ = gp_hypers(cfg, params)
        K_cc = rbf_ard(f_c, f_c, ls, os_)
        K_ct = rbf_ard(f_c, f_t, ls, os_)
        K_tt = rbf_ard(f_t, f_t, ls, os_)
    mean_c = gp_mean(cfg, params, x_context)
    mean_t = gp_mean(cfg, params, x_test)
    post_mean, post_cov = gp_ops.gp_posterior(
        mean_c, K_cc, K_ct, mean_t, K_tt, y_context, noise, mask_c=mask_c
    )
    if observation_noise:
        post_cov = post_cov + noise * jnp.eye(post_cov.shape[-1], dtype=post_cov.dtype)
    return post_mean, post_cov
