"""Fused-MLAP parity chain: closed-form math spec == jax.grad of the live
learner's loss == (later stages) the Pallas mega-kernel and the learner's
fused dispatch. Mirrors tests/test_fused_vi.py's structure."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC
from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu.models.random_gp import (
    posterior_kl_to_prior,
    posterior_rsample,
)
from meta_learning_pacoh_tpu.ops.fused_mlap_math import mlap_loss_and_grads


def _make_learner(n_tasks=6, n_samples=5, svi=3, seed=1, **kw):
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=n_samples)
    return GPRegressionMetaLearnedPAC(
        train, num_iter_fit=200, random_seed=seed, covar_module="NN",
        mean_module="NN", svi_batch_size=svi, meta_kl_weight=1e-3,
        task_kl_weight=0.5, **kw)


def _learner_loss(m, params, eps, counts):
    """The learner's loss_fn with the sampling replaced by explicit
    (eps, counts) so the spec and autodiff see identical randomness."""
    X, Y, M = jnp.asarray(m.X), jnp.asarray(m.Y), jnp.asarray(m.mask)
    T = m.n_tasks
    svi = m.svi_batch_size

    def loss_fn(params):
        post = params["hyper_post"]
        theta = post["loc"][None, :] + jnp.exp(
            post["log_scale"])[None, :] * eps
        kl_outer = m.meta_kl_weight * posterior_kl_to_prior(
            post, m.hyper_prior)
        noise_var = m._noise_var(params["raw_noise"])

        def per_task(i):
            return m._task_bound(
                params["q_means"][i], params["q_trils"][i], X[i], Y[i],
                theta, noise_var, kl_outer, float(T), mask=M[i])

        bounds, avg_lls, kl_inners = jax.vmap(per_task)(jnp.arange(T))
        u = counts / jnp.sum(counts)
        meta_complexity = jnp.sqrt(
            (kl_outer + math.log(2.0) + math.log(float(T))
             - math.log(m.delta)) / (2.0 * (T - 1.0)))
        return jnp.sum(u * bounds) + meta_complexity

    return loss_fn


class TestMLAPSpecVsAutodiff:
    @pytest.mark.parametrize("ragged", [False, True])
    def test_loss_and_grads_match(self, ragged):
        if ragged:
            env = SinusoidDataset(random_state=np.random.RandomState(7))
            train = [env.generate_meta_train_data(1, n)[0]
                     for n in (5, 3, 5, 4, 5, 2)]
            m = GPRegressionMetaLearnedPAC(
                train, num_iter_fit=200, random_seed=1, covar_module="NN",
                mean_module="NN", svi_batch_size=3, meta_kl_weight=1e-3,
                task_kl_weight=0.5)
        else:
            m = _make_learner()

        rs = np.random.RandomState(0)
        eps = jnp.asarray(
            rs.randn(m.svi_batch_size, m.hyper_prior.dim).astype(np.float32))
        counts = jnp.asarray(
            np.bincount(rs.randint(0, m.n_tasks, m.n_tasks),
                        minlength=m.n_tasks).astype(np.float32))

        params = m.params
        loss_fn = _learner_loss(m, params, eps, counts)
        loss_ad, grads_ad = jax.value_and_grad(loss_fn)(params)

        loss_cf, grads_cf, diag = mlap_loss_and_grads(
            params, eps, counts, jnp.asarray(m.X), jnp.asarray(m.Y),
            jnp.asarray(m.mask), m.hyper_prior,
            task_kl_weight=m.task_kl_weight,
            meta_kl_weight=m.meta_kl_weight, delta=m.delta)

        np.testing.assert_allclose(float(loss_cf), float(loss_ad), rtol=2e-5)
        flat_ad, _ = jax.flatten_util.ravel_pytree(grads_ad)
        flat_cf, _ = jax.flatten_util.ravel_pytree(grads_cf)
        scale = float(jnp.max(jnp.abs(flat_ad))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(flat_cf), np.asarray(flat_ad),
            rtol=5e-4, atol=5e-5 * scale)

    def test_grads_after_training_steps(self):
        """Spec parity must hold away from init too (q_trils asymmetric,
        noise moved)."""
        m = _make_learner(seed=3)
        m.meta_fit(log_period=100, n_iter=100, verbose=False)

        rs = np.random.RandomState(5)
        eps = jnp.asarray(
            rs.randn(m.svi_batch_size, m.hyper_prior.dim).astype(np.float32))
        counts = jnp.asarray(
            np.bincount(rs.randint(0, m.n_tasks, m.n_tasks),
                        minlength=m.n_tasks).astype(np.float32))

        params = m.params
        loss_fn = _learner_loss(m, params, eps, counts)
        loss_ad, grads_ad = jax.value_and_grad(loss_fn)(params)
        loss_cf, grads_cf, _ = mlap_loss_and_grads(
            params, eps, counts, jnp.asarray(m.X), jnp.asarray(m.Y),
            jnp.asarray(m.mask), m.hyper_prior,
            task_kl_weight=m.task_kl_weight,
            meta_kl_weight=m.meta_kl_weight, delta=m.delta)

        np.testing.assert_allclose(float(loss_cf), float(loss_ad), rtol=2e-5)
        flat_ad, _ = jax.flatten_util.ravel_pytree(grads_ad)
        flat_cf, _ = jax.flatten_util.ravel_pytree(grads_cf)
        scale = float(jnp.max(jnp.abs(flat_ad))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(flat_cf), np.asarray(flat_ad),
            rtol=5e-4, atol=5e-5 * scale)
