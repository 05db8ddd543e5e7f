"""Golden-value regression fixtures (SURVEY.md §4): small deterministic runs
captured on the CPU backend guard against silent numerics drift across
refactors. Values regenerated only when a numerics change is intentional.

Captured 2026-08-16 on jax 0.9.0, f32, CPU backend, 8 virtual devices.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.ops.gp import gp_mll
from meta_learning_pacoh_tpu.ops.kernels import rbf_ard


def test_gp_mll_golden():
    rs = np.random.RandomState(77)
    x = rs.randn(6, 2).astype(np.float32)
    y = rs.randn(6).astype(np.float32)
    K = rbf_ard(jnp.asarray(x), jnp.asarray(x), jnp.asarray([0.8, 1.2]), 1.5)
    mll = float(gp_mll(jnp.zeros(6), K, jnp.asarray(y), 0.3))
    assert abs(mll - (-1.8622106313705444)) < 1e-4


def test_pacoh_map_training_golden():
    from meta_learning_pacoh_tpu import GPRegressionMetaLearned

    def tasks(n_tasks, n, seed):
        r = np.random.RandomState(seed)
        return [(r.uniform(-5, 5, (n, 1)), np.sin(r.uniform(-5, 5, (n, 1))) + 2)
                for _ in range(n_tasks)]

    m = GPRegressionMetaLearned(tasks(6, 8, 5), num_iter_fit=50, random_seed=13,
                                task_batch_size=3)
    loss = m.meta_fit(verbose=False, log_period=50)
    assert abs(loss - 4.9687299728393555) < 5e-3

    xc = np.linspace(-4, 4, 5)[:, None].astype(np.float32)
    yc = (np.sin(xc) + 2).astype(np.float32)
    xt = np.linspace(-3, 3, 4)[:, None].astype(np.float32)
    mean, std = m.predict(xc, yc, xt)
    golden_mean = [2.218266487121582, 2.061947822570801,
                   1.8684473037719727, 1.6918365955352783]
    golden_std = [0.6336671113967896, 0.6387777328491211,
                  0.6399383544921875, 0.6316624879837036]
    np.testing.assert_allclose(mean, golden_mean, atol=2e-3)
    np.testing.assert_allclose(std, golden_std, atol=2e-3)


def test_catdist_and_unnormalized():
    import jax

    from meta_learning_pacoh_tpu.ops.distributions import (
        CatDist, Normal, UnnormalizedExpDist,
    )

    class _Block:
        def __init__(self, loc, scale):
            self.n = Normal(jnp.asarray(loc), jnp.asarray(scale))

        def sample(self, key, shape=()):
            return self.n.loc + self.n.scale * jax.random.normal(
                key, tuple(shape) + self.n.loc.shape
            )

        def log_prob(self, v):
            return jnp.sum(self.n.log_prob(v), axis=-1)

    cat = CatDist([_Block([0.0, 0.0], [1.0, 1.0]), _Block([5.0], [2.0])],
                  block_dims=[2, 1])
    s = cat.sample(jax.random.PRNGKey(0), (100,))
    assert s.shape == (100, 3)
    assert abs(float(s[:, 2].mean()) - 5.0) < 0.6

    from scipy.stats import norm

    lp = float(cat.log_prob(jnp.asarray([0.5, -0.5, 4.0])))
    ref = norm.logpdf([0.5, -0.5], 0, 1).sum() + norm.logpdf(4.0, 5.0, 2.0)
    assert abs(lp - ref) < 1e-4

    d = UnnormalizedExpDist(lambda v: -jnp.sum(v**2))
    assert float(d.log_prob(jnp.asarray([1.0, 2.0]))) == -5.0
