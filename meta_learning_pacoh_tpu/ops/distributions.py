"""Lightweight predictive-distribution objects.

Functional re-designs of the reference's torch distribution wrappers
(reference: meta_learn/models.py:15-184): affine un-normalization of
predictive densities, equal-weighted mixtures over particles/samples with
logsumexp densities and bisection quantiles, and factorized/concatenated
Gaussians. All arrays are jnp; objects are cheap containers over computed
moments, safe to build eagerly outside jit (the hot numerical paths consume
the underlying pure functions directly).
"""

import math

import jax.numpy as jnp
import jax.scipy.special as jsp

from meta_learning_pacoh_tpu.ops.gp import mvn_log_prob
from meta_learning_pacoh_tpu.ops.rootfind import find_root_by_bounding

_LOG_2PI = math.log(2.0 * math.pi)


class Normal:
    """Elementwise Gaussian. loc/scale: arbitrary broadcastable shapes."""

    def __init__(self, loc, scale):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)

    @property
    def mean(self):
        return self.loc

    @property
    def stddev(self):
        return self.scale

    @property
    def variance(self):
        return self.scale**2

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * (z**2 + _LOG_2PI) - jnp.log(self.scale)

    def cdf(self, value):
        return 0.5 * (1.0 + jsp.erf((value - self.loc) / (self.scale * math.sqrt(2.0))))

    def icdf(self, q):
        return self.loc + self.scale * math.sqrt(2.0) * jsp.erfinv(2.0 * jnp.asarray(q) - 1.0)


class MultivariateNormal:
    """Joint Gaussian with full covariance. mean: [..., N]; cov: [..., N, N].

    log_prob is the *joint* density over the event axis (last axis of mean),
    matching gpytorch's predictive MultivariateNormal used in eval
    (reference: meta_learn/abstract.py:156-158).
    """

    def __init__(self, mean, cov):
        self._mean = jnp.asarray(mean)
        self.cov = jnp.asarray(cov)

    @property
    def mean(self):
        return self._mean

    @property
    def variance(self):
        return jnp.diagonal(self.cov, axis1=-2, axis2=-1)

    @property
    def stddev(self):
        return jnp.sqrt(self.variance)

    def log_prob(self, value):
        if self._mean.ndim > 1:
            import jax

            batch = self._mean.shape[:-1]
            flat_mean = self._mean.reshape((-1,) + self._mean.shape[-1:])
            flat_cov = self.cov.reshape((-1,) + self.cov.shape[-2:])
            val = jnp.broadcast_to(value, batch + value.shape[-1:])
            flat_val = val.reshape((-1,) + val.shape[-1:])
            lp = jax.vmap(mvn_log_prob)(flat_val, flat_mean, flat_cov)
            return lp.reshape(batch)
        return mvn_log_prob(jnp.asarray(value), self._mean, self.cov)


class AffineTransformed:
    """y = loc + scale * x for x ~ base (un-normalization of predictions).

    Reference semantics: meta_learn/models.py:15-43. scale must be positive
    scalar (the y-normalization std).
    """

    def __init__(self, base, loc, scale):
        self.base = base
        self.loc = jnp.asarray(loc, dtype=jnp.float32).reshape(())
        self.scale = jnp.asarray(scale, dtype=jnp.float32).reshape(())

    @property
    def mean(self):
        return self.loc + self.scale * self.base.mean

    @property
    def stddev(self):
        return self.scale * self.base.stddev

    @property
    def variance(self):
        return self.scale**2 * self.base.variance

    def log_prob(self, value):
        x = (jnp.asarray(value) - self.loc) / self.scale
        lp = self.base.log_prob(x)
        if isinstance(self.base, MultivariateNormal):
            n = self.base.mean.shape[-1]
            return lp - n * jnp.log(self.scale)
        return lp - jnp.log(self.scale)

    def cdf(self, value):
        return self.base.cdf((jnp.asarray(value) - self.loc) / self.scale)

    def icdf(self, q):
        return self.loc + self.scale * self.base.icdf(q)


class EqualWeightedMixture:
    """Uniform mixture over the leading (component) axis of a batched dist.

    Reference semantics: meta_learn/models.py:74-140. Batched mode takes one
    distribution whose parameter leading axis indexes components; list mode
    (a list of same-family distributions) is stacked into batched form.
    """

    def __init__(self, base):
        if isinstance(base, (list, tuple)):
            first = base[0]
            if isinstance(first, Normal):
                base = Normal(jnp.stack([d.loc for d in base]),
                              jnp.stack([d.scale for d in base]))
            elif isinstance(first, MultivariateNormal):
                base = MultivariateNormal(jnp.stack([d.mean for d in base]),
                                          jnp.stack([d.cov for d in base]))
            else:
                raise TypeError(f"cannot stack mixture components of {type(first)}")
        self.base = base

    @property
    def num_components(self):
        return self.base.mean.shape[0]

    @property
    def mean(self):
        return jnp.mean(self.base.mean, axis=0)

    @property
    def variance(self):
        means = self.base.mean
        var_between = jnp.mean((means - jnp.mean(means, axis=0)) ** 2, axis=0)
        var_within = jnp.mean(self.base.variance, axis=0)
        return var_between + var_within

    @property
    def stddev(self):
        return jnp.sqrt(self.variance)

    def log_prob(self, value):
        lp = self.base.log_prob(jnp.asarray(value))  # [K, ...]
        return jsp.logsumexp(lp, axis=0) - jnp.log(float(self.num_components))

    def cdf(self, value):
        return jnp.mean(self.base.cdf(jnp.asarray(value)), axis=0)

    def icdf(self, q, eps=1e-6):
        q = jnp.asarray(q)
        left = jnp.full(q.shape, -1e8, dtype=jnp.float32)
        right = jnp.full(q.shape, 1e8, dtype=jnp.float32)
        return find_root_by_bounding(lambda x: self.cdf(x) - q, left, right, eps=eps)


class FactorizedNormal:
    """Diagonal Gaussian whose log_prob sums over the last axis
    (reference: meta_learn/models.py:65-72)."""

    def __init__(self, loc, scale, summation_axis=-1):
        self._normal = Normal(loc, scale)
        self.summation_axis = summation_axis

    @property
    def mean(self):
        return self._normal.mean

    @property
    def stddev(self):
        return self._normal.stddev

    def log_prob(self, value):
        return jnp.sum(self._normal.log_prob(value), axis=self.summation_axis)


class UnnormalizedExpDist:
    """Density proportional to exp(exponent_fn(value))
    (reference: meta_learn/models.py:45-63)."""

    def __init__(self, exponent_fn):
        self.exponent_fn = exponent_fn

    def log_prob(self, value):
        return self.exponent_fn(value)


class CatDist:
    """Concatenation of independent block distributions along the event dim
    (reference: meta_learn/models.py:144-184). Each block needs .sample(key,
    sample_shape) -> [..., d_i] and .log_prob over its own event dim."""

    def __init__(self, dists, block_dims, reduce_event_dim=True):
        assert len(dists) == len(block_dims)
        self.dists = list(dists)
        self.block_dims = list(block_dims)
        self.reduce_event_dim = reduce_event_dim

    @property
    def event_dim(self):
        return sum(self.block_dims)

    def sample(self, key, sample_shape=()):
        import jax

        keys = jax.random.split(key, len(self.dists))
        parts = [d.sample(k, sample_shape) for d, k in zip(self.dists, keys)]
        return jnp.concatenate(parts, axis=-1)

    def log_prob(self, value):
        idx = 0
        lps = []
        for d, n in zip(self.dists, self.block_dims):
            lps.append(d.log_prob(value[..., idx:idx + n]))
            idx += n
        stacked = jnp.stack(lps, axis=0)
        if self.reduce_event_dim:
            return jnp.sum(stacked, axis=0)
        return stacked
