"""Tier-1/2 tests of the model layer: MLP, GP prior config, hyper-prior."""

import numpy as np
import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.models.mlp import init_mlp_params, mlp_apply
from meta_learning_pacoh_tpu.models.gp_base import (
    GPConfig, init_gp_params, gp_prior_mll, gp_predict, gp_hypers,
)
from meta_learning_pacoh_tpu.models.random_gp import (
    make_hyper_prior, meta_log_prob, random_gp_config, task_mll_flat,
    init_posterior, posterior_rsample, posterior_log_prob, posterior_stddev,
)


class TestMLP:
    def test_shapes_and_vmap_over_particles(self):
        key = jax.random.PRNGKey(0)
        params = init_mlp_params(key, 3, 2, (16, 16))
        x = jax.random.normal(jax.random.PRNGKey(1), (7, 3))
        out = mlp_apply(params, x)
        assert out.shape == (7, 2)

        # particle axis via vmap == loop over particles
        p_batched = jax.vmap(lambda k: init_mlp_params(k, 3, 2, (16, 16)))(
            jax.random.split(key, 5)
        )
        out_b = jax.vmap(mlp_apply, in_axes=(0, None))(p_batched, x)
        assert out_b.shape == (5, 7, 2)
        single = mlp_apply(jax.tree.map(lambda a: a[2], p_batched), x)
        np.testing.assert_allclose(np.asarray(out_b[2]), np.asarray(single), atol=1e-6)

    def test_init_bounds(self):
        params = init_mlp_params(jax.random.PRNGKey(2), 4, 1, (32,), scheme="torch_linear")
        bound = 1.0 / np.sqrt(4)
        w = np.asarray(params["w_0"])
        assert np.all(np.abs(w) <= bound) and np.std(w) > 0.2 * bound


class TestGPModel:
    def test_constraints(self):
        cfg = GPConfig(input_dim=2, has_outputscale=True, noise_floor=1e-3)
        params = init_gp_params(cfg, jax.random.PRNGKey(0))
        ls, os_, noise = gp_hypers(cfg, params)
        # raw zeros -> softplus(0) = log(2)
        np.testing.assert_allclose(np.asarray(ls), np.log(2.0) * np.ones(2), rtol=1e-5)
        assert abs(float(os_) - np.log(2.0)) < 1e-5
        assert abs(float(noise) - (np.log(2.0) + 1e-3)) < 1e-5

    def test_mll_and_predict_run_all_module_combos(self):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(10, 2).astype(np.float32))
        y = jnp.asarray(rs.randn(10).astype(np.float32))
        xt = jnp.asarray(rs.randn(4, 2).astype(np.float32))
        for mean_module in ["NN", "constant", "zero"]:
            for covar_module in ["NN", "SE"]:
                cfg = GPConfig(input_dim=2, mean_module=mean_module,
                               covar_module=covar_module)
                params = init_gp_params(cfg, jax.random.PRNGKey(1))
                ll = gp_prior_mll(cfg, params, x, y)
                assert np.isfinite(float(ll))
                m, c = gp_predict(cfg, params, x, y, xt)
                assert m.shape == (4,) and c.shape == (4, 4)
                assert np.all(np.isfinite(np.asarray(m)))
                assert np.all(np.diagonal(np.asarray(c)) > 0)


class TestHyperPrior:
    def test_block_structure(self):
        cfg = random_gp_config(2, feature_dim=3, mean_module="constant", covar_module="SE")
        hp = make_hyper_prior(cfg, weight_prior_std=0.5, bias_prior_std=3.0)
        # constant_mean(1) + lengthscale_raw(2 input dims) + noise_raw(1)
        assert hp.dim == 1 + 2 + 1
        # noise block centred at -1
        params = hp.unravel(hp.loc)
        np.testing.assert_allclose(np.asarray(params["noise_raw"]), -1.0)
        np.testing.assert_allclose(np.asarray(params["constant_mean"]), 0.0)

    def test_nn_block_stds(self):
        cfg = random_gp_config(1, feature_dim=2, mean_module="NN", covar_module="NN",
                               mean_nn_layers=(8,), kernel_nn_layers=(8,))
        hp = make_hyper_prior(cfg, weight_prior_std=0.5, bias_prior_std=3.0)
        scale_tree = hp.unravel(hp.scale)
        np.testing.assert_allclose(np.asarray(scale_tree["mean_nn"]["w_0"]), 0.5)
        np.testing.assert_allclose(np.asarray(scale_tree["mean_nn"]["b_0"]), 3.0)

    def test_log_prob_matches_scipy(self):
        from scipy.stats import norm

        cfg = random_gp_config(1, mean_module="constant", covar_module="SE")
        hp = make_hyper_prior(cfg)
        v = hp.sample(jax.random.PRNGKey(0))
        lp = float(hp.log_prob(v))
        ref = norm.logpdf(np.asarray(v), loc=np.asarray(hp.loc),
                          scale=np.asarray(hp.scale)).sum()
        assert abs(lp - ref) < 1e-4

    def test_meta_log_prob_prefactor(self):
        """meta_log_prob == prior_factor*prior + hm/(hm+T) * sum of task MLLs."""
        cfg = random_gp_config(1, mean_module="constant", covar_module="SE")
        hp = make_hyper_prior(cfg)
        rs = np.random.RandomState(0)
        X = jnp.asarray(rs.randn(3, 6, 1).astype(np.float32))
        Y = jnp.asarray(rs.randn(3, 6).astype(np.float32))
        particles = hp.sample(jax.random.PRNGKey(1), (2,))
        lp = meta_log_prob(hp, 0.7, particles, X, Y)

        mlls = np.array([
            [float(task_mll_flat(hp, particles[k], X[t], Y[t])) for t in range(3)]
            for k in range(2)
        ])
        hm = 6.0
        pre = hm / (hm + 3.0)
        ref = 0.7 * np.asarray(hp.log_prob(particles)) + pre * mlls.sum(-1)
        np.testing.assert_allclose(np.asarray(lp), ref, rtol=1e-5, atol=1e-5)


class TestPosterior:
    def test_diag_log_prob_matches_scipy(self):
        from scipy.stats import norm

        post = init_posterior(jax.random.PRNGKey(0), 5, cov_type="diag")
        v = posterior_rsample(post, jax.random.PRNGKey(1), 1)[0]
        lp = float(posterior_log_prob(post, v))
        ref = norm.logpdf(np.asarray(v), loc=np.asarray(post["loc"]),
                          scale=np.exp(np.asarray(post["log_scale"]))).sum()
        assert abs(lp - ref) < 1e-4

    def test_full_log_prob_matches_scipy(self):
        from scipy.stats import multivariate_normal

        from meta_learning_pacoh_tpu.models.random_gp import (
            posterior_scale_tril, posterior_entropy,
        )

        post = init_posterior(jax.random.PRNGKey(2), 4, cov_type="full")
        post["tril_raw"] = post["tril_raw"] + 0.05 * jnp.tril(
            jax.random.normal(jax.random.PRNGKey(3), (4, 4)), -1
        )
        v = posterior_rsample(post, jax.random.PRNGKey(4), 1)[0]
        L = np.asarray(posterior_scale_tril(post))
        cov = L @ L.T
        ref = multivariate_normal.logpdf(np.asarray(v), mean=np.asarray(post["loc"]), cov=cov)
        assert abs(float(posterior_log_prob(post, v)) - ref) < 1e-3
        # analytic entropy matches scipy as well (ELBO uses it)
        ent_ref = multivariate_normal(mean=np.asarray(post["loc"]), cov=cov).entropy()
        assert abs(float(posterior_entropy(post)) - ent_ref) < 1e-3

    def test_rsample_moments(self):
        post = init_posterior(jax.random.PRNGKey(5), 3, cov_type="diag")
        s = posterior_rsample(post, jax.random.PRNGKey(6), 20000)
        np.testing.assert_allclose(np.asarray(s.mean(0)), np.asarray(post["loc"]), atol=0.01)
        np.testing.assert_allclose(
            np.asarray(s.std(0)), np.asarray(posterior_stddev(post)), rtol=0.05
        )
