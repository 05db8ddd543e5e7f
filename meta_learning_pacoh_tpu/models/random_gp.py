"""GP-prior-as-random-variable: hyper-prior, meta score, Gaussian hyper-posterior.

Functional re-design of the reference's RandomGP machinery (reference:
meta_learn/random_gp.py): instead of a mutable `VectorizedGP` whose
parameters are set from a flat vector via deepcopy (random_gp.py:166-169),
the GP-prior parameters *are* a flat vector — `jax.flatten_util.ravel_pytree`
provides the bijection to the structured pytree, and every score function is
a pure function of (flat_params, data) that `vmap` batches over particles or
SVI samples.

Hyper-prior block structure (reference: random_gp.py:126-157):
  constant_mean   ~ N(0, 1)
  lengthscale_raw ~ N(0, 1) per ARD dim
  noise_raw       ~ N(-1, 1)
  NN weights      ~ N(0, weight_prior_std), NN biases ~ N(0, bias_prior_std)

Meta score (reference: random_gp.py:204-222):
  log p~(params | batch) = prior_factor * log hyper_prior(params)
                           + m~/(m~ + m) * sum_t MLL_t(params)
with m~ the harmonic-mean task size of the batch, m the batch's task count,
and each MLL_t divided by its task size (gpytorch convention).
"""

import dataclasses
import functools
import math

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from meta_learning_pacoh_tpu.models.gp_base import GPConfig, init_gp_params, gp_prior_mll

_LOG_2PI = math.log(2.0 * math.pi)


def random_gp_config(input_dim, feature_dim=2, mean_module="NN", covar_module="NN",
                     mean_nn_layers=(32, 32), kernel_nn_layers=(32, 32)):
    """GPConfig for the RandomGP flavor (no outputscale, softplus noise,
    kaiming-tanh NN init — reference: random_gp.py:22-51)."""
    return GPConfig(
        input_dim=input_dim,
        feature_dim=feature_dim,
        mean_module=mean_module,
        covar_module=covar_module,
        mean_nn_layers=tuple(mean_nn_layers),
        kernel_nn_layers=tuple(kernel_nn_layers),
        has_outputscale=False,
        noise_floor=0.0,
        init_scheme="kaiming_tanh",
    )


@dataclasses.dataclass
class HyperPrior:
    """Factorized Gaussian over the flat GP-prior parameter vector."""

    loc: jnp.ndarray  # [P]
    scale: jnp.ndarray  # [P]
    unravel: callable  # flat [P] -> structured params pytree
    cfg: GPConfig

    @property
    def dim(self):
        return self.loc.shape[0]

    def log_prob(self, flat_params):
        """flat_params [..., P] -> [...] (sum over the event dim)."""
        z = (flat_params - self.loc) / self.scale
        return jnp.sum(-0.5 * (z**2 + _LOG_2PI) - jnp.log(self.scale), axis=-1)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + (self.dim,)
        return self.loc + self.scale * jax.random.normal(key, shape, self.loc.dtype)


@functools.lru_cache(maxsize=None)
def make_hyper_prior(cfg: GPConfig, weight_prior_std=1.0, bias_prior_std=3.0):
    """Build the block hyper-prior aligned with the flat parameter layout.

    Deliberately zero-device: the template comes from `jax.eval_shape` (no
    RNG execution) and the loc/scale blocks are numpy, so constructing a
    learner never forces a device readback (on tunneled TPU runtimes the
    first device->host sync of a process can stall for minutes).

    Memoized: the returned HyperPrior (treat as immutable) is shared across
    learner instances so functions closing over it key their jit caches on
    (cfg, stds) alone."""
    import numpy as np

    shapes = jax.eval_shape(lambda: init_gp_params(cfg, jax.random.PRNGKey(0)))
    template = jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)
    _, unravel = ravel_pytree(template)

    def block_loc_scale(path_name, leaf):
        if path_name == "noise_raw":
            return np.full_like(leaf, -1.0), np.ones_like(leaf)
        if path_name in ("constant_mean", "lengthscale_raw", "outputscale_raw"):
            return np.zeros_like(leaf), np.ones_like(leaf)
        # NN leaves: keys look like ('mean_nn'|'kernel_nn', 'w_*'|'b_*')
        std = weight_prior_std if path_name.startswith("w_") else bias_prior_std
        return np.zeros_like(leaf), np.full_like(leaf, std)

    loc_tree = {}
    scale_tree = {}
    for name, leaf in template.items():
        if isinstance(leaf, dict):  # an MLP block
            loc_tree[name] = {}
            scale_tree[name] = {}
            for pname, p in leaf.items():
                l, s = block_loc_scale(pname, p)
                loc_tree[name][pname] = l
                scale_tree[name][pname] = s
        else:
            l, s = block_loc_scale(name, leaf)
            loc_tree[name] = l
            scale_tree[name] = s

    loc_flat = np.concatenate([a.ravel() for a in jax.tree.leaves(loc_tree)])
    scale_flat = np.concatenate([a.ravel() for a in jax.tree.leaves(scale_tree)])
    return HyperPrior(loc=loc_flat.astype(np.float32),
                      scale=scale_flat.astype(np.float32),
                      unravel=unravel, cfg=cfg)


def task_mll_flat(hyper_prior: HyperPrior, flat_params, x, y, mask=None):
    """Exact MLL / n of one task under GP-prior params given as a flat vector."""
    params = hyper_prior.unravel(flat_params)
    return gp_prior_mll(hyper_prior.cfg, params, x, y, mask=mask)


def meta_log_prob(hyper_prior: HyperPrior, prior_factor, flat_particles, X, Y,
                  mask=None, counts=None):
    """PACOH generalized-Bayes score of K particles on a task batch.

    flat_particles [K, P]; X [T, N, D]; Y [T, N]; mask [T, N] or None.
    Returns [K].

    The NN mean/feature forwards run vmapped over (particles x tasks); the
    O(N^3) MLL cores are flattened into ONE [K*T]-batched call so the fused
    Pallas kernel (or the unrolled small-N path) sees the whole batch.

    counts [T] (optional): count-weighted sampled-task-batch estimator —
    X/Y/mask are the FULL task set and counts holds each task's sampled
    multiplicity (sum = batch size). Equivalent to gathering the sampled
    batch (same harmonic-mean pre-factor over the sampled multiset, same
    weighted task sum), without the TPU-hostile dynamic gather — the
    no-gather analog of algos/pacoh_map._weight_by_counts.
    """
    from meta_learning_pacoh_tpu.models.gp_base import gp_gram, gp_hypers, gp_mean
    from meta_learning_pacoh_tpu.ops.gp import gp_mll_batch

    if mask is None:
        mask = jnp.ones(Y.shape, dtype=Y.dtype)
    cfg, unravel = hyper_prior.cfg, hyper_prior.unravel
    k_particles, n_tasks = flat_particles.shape[0], X.shape[0]

    def mean_K_noise(flat, x):
        params = unravel(flat)
        _, _, noise = gp_hypers(cfg, params)
        return gp_mean(cfg, params, x), gp_gram(cfg, params, x), noise

    means, Ks, noises = jax.vmap(  # over particles
        jax.vmap(mean_K_noise, in_axes=(None, 0)),  # over tasks
        in_axes=(0, None),
    )(flat_particles, X)  # [K, T, N], [K, T, N, N], [K, T]

    n = Y.shape[-1]
    Yb = jnp.broadcast_to(Y, (k_particles,) + Y.shape).reshape(-1, n)
    Mb = jnp.broadcast_to(mask, (k_particles,) + mask.shape).reshape(-1, n)
    lls = gp_mll_batch(
        means.reshape(-1, n), Ks.reshape(-1, n, n), Yb,
        noises.reshape(-1), Mb,
    )
    per_task = lls.reshape(k_particles, n_tasks)

    sizes = jnp.sum(mask, axis=-1)  # [T]
    if counts is None:
        harmonic_mean = 1.0 / jnp.mean(1.0 / sizes)
        pre_factor = harmonic_mean / (harmonic_mean + n_tasks)
        task_sum = jnp.sum(per_task, axis=-1)
    else:
        # harmonic mean over the SAMPLED multiset (== gathering the batch)
        batch_n = jnp.sum(counts)
        harmonic_mean = batch_n / jnp.sum(counts / sizes)
        pre_factor = harmonic_mean / (harmonic_mean + batch_n)
        # 0-guard: a never-sampled task's NaN MLL must not poison the sum
        weighted = jnp.where(counts > 0,
                             counts * jnp.where(counts > 0, per_task, 0.0),
                             0.0)
        task_sum = jnp.sum(weighted, axis=-1)

    lp_prior = hyper_prior.log_prob(flat_particles)  # [K]
    return prior_factor * lp_prior + pre_factor * task_sum


# --------------------------------------------------------------------------
# Gaussian hyper-posterior (for PACOH-VI / MLAP)
# Reference: RandomGPPosterior, meta_learn/random_gp.py:224-286.
# --------------------------------------------------------------------------


def init_posterior(key, dim, cov_type="diag", init_std=0.1):
    """Gaussian posterior params. The full-covariance scale_tril stores its
    diagonal in log space (diagonal = exp(diag(tril_raw))) — the reference's
    unconstrained diagonal (random_gp.py:250) can cross zero under Adam and
    blow up the density; positive parameterization removes that failure mode
    without changing the represented family."""
    k1, k2 = jax.random.split(key)
    loc = init_std * jax.random.normal(k1, (dim,), jnp.float32)
    if cov_type == "diag":
        log_scale = math.log(0.1) + init_std * jax.random.normal(k2, (dim,), jnp.float32)
        return {"loc": loc, "log_scale": log_scale}
    elif cov_type == "full":
        diag = jax.random.uniform(k2, (dim,), jnp.float32, 0.05, 0.1)
        return {"loc": loc, "tril_raw": jnp.diag(jnp.log(diag))}
    raise ValueError(f"unknown cov_type {cov_type!r}")


def posterior_scale_tril(post):
    if "log_scale" in post:
        return jnp.diag(jnp.exp(post["log_scale"]))
    raw = post["tril_raw"]
    return jnp.tril(raw, -1) + jnp.diag(jnp.exp(jnp.diagonal(raw)))


def posterior_log_diag(post):
    if "log_scale" in post:
        return post["log_scale"]
    return jnp.diagonal(post["tril_raw"])


def posterior_stddev(post):
    if "log_scale" in post:
        return jnp.exp(post["log_scale"])
    L = posterior_scale_tril(post)
    return jnp.sqrt(jnp.sum(L * L, axis=-1))


def posterior_rsample(post, key, n_samples):
    dim = post["loc"].shape[0]
    eps = jax.random.normal(key, (n_samples, dim), jnp.float32)
    if "log_scale" in post:
        return post["loc"] + jnp.exp(post["log_scale"]) * eps
    return post["loc"] + eps @ posterior_scale_tril(post).T


def posterior_log_prob(post, value):
    """value [..., P] -> [...]."""
    if "log_scale" in post:
        scale = jnp.exp(post["log_scale"])
        z = (value - post["loc"]) / scale
        return jnp.sum(-0.5 * (z**2 + _LOG_2PI) - post["log_scale"], axis=-1)
    L = posterior_scale_tril(post)
    r = value - post["loc"]
    batch_shape = r.shape[:-1]
    r2 = r.reshape((-1, r.shape[-1]))  # [S, P]
    z = jax.scipy.linalg.solve_triangular(L, r2.T, lower=True).T  # [S, P]
    logdet = jnp.sum(posterior_log_diag(post))
    dim = post["loc"].shape[0]
    quad = jnp.sum(z * z, axis=-1).reshape(batch_shape)
    return -0.5 * (quad + dim * _LOG_2PI) - logdet


def posterior_entropy(post):
    dim = post["loc"].shape[0]
    return 0.5 * dim * (1.0 + _LOG_2PI) + jnp.sum(posterior_log_diag(post))


def posterior_kl_to_prior(post, hyper_prior: HyperPrior):
    """Closed-form KL( q_hyper || hyper_prior ) — both Gaussians, the prior
    factorized. Replaces the reference's S-sample estimate of
    E_q[log q - log p] (GPR_meta_mlap.py:314-316) with its exact value.
    """
    mu_p, sig_p = hyper_prior.loc, hyper_prior.scale
    r = post["loc"] - mu_p
    quad = jnp.sum((r / sig_p) ** 2)
    logdet_p = 2.0 * jnp.sum(jnp.log(sig_p))
    logdet_q = 2.0 * jnp.sum(posterior_log_diag(post))
    dim = post["loc"].shape[0]
    if "log_scale" in post:
        trace = jnp.sum((jnp.exp(post["log_scale"]) / sig_p) ** 2)
    else:
        L = posterior_scale_tril(post)
        trace = jnp.sum((L / sig_p[:, None]) ** 2)
    return 0.5 * (trace + quad - dim + logdet_p - logdet_q)
