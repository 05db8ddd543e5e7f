"""User-supplied mean/kernel modules through the learner constructors.

Ports the reference's custom-module door (GPR_mll.py:40-41, GPR_meta_mll.py:42
accept arbitrary gpytorch mean/kernel instances) and its behavioral test: a
learned CosineKernel period beats an untrained one on sinusoidal data
(reference: tests/test_GPR.py:95-121, test_kernel_learning_COS).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu import (
    CosineKernel,
    GPRegressionLearned,
    GPRegressionMetaLearned,
    LinearMean,
    MaternKernel,
)
from meta_learning_pacoh_tpu.models.gp_base import (
    GPConfig,
    gp_predict,
    gp_prior_mll,
    init_gp_params,
)


@pytest.fixture(scope="module")
def sin_data():
    # the reference's toy set (test_GPR.py:18-24): x in [-2, 2], y = sin(4x)
    rng = np.random.RandomState(25)
    x_train = np.linspace(-2, 2, num=60)
    y_train = np.sin(4 * x_train)
    return x_train, y_train


# --------------------------------------------------------------- unit level


def test_matern_gram_properties():
    x = jnp.linspace(-1.0, 1.0, 7)[:, None]
    for nu in (0.5, 1.5, 2.5):
        k = MaternKernel(nu=nu)
        p = k.init_params(jax.random.PRNGKey(0), 1)
        K = k.gram(p, x, x)
        # symmetric PSD-ish with unit diagonal (d(x,x)=0 -> k=1)
        np.testing.assert_allclose(np.asarray(K), np.asarray(K).T, atol=1e-6)
        np.testing.assert_allclose(np.diag(np.asarray(K)), 1.0, atol=1e-5)
        ev = np.linalg.eigvalsh(np.asarray(K))
        assert ev.min() > -1e-5
    with pytest.raises(ValueError):
        MaternKernel(nu=2.0)


def test_cosine_gram_is_cos_of_scaled_distance():
    k = CosineKernel()
    p = {"period_raw": jnp.asarray(0.3)}
    x1 = jnp.asarray([[0.0], [1.0]])
    x2 = jnp.asarray([[0.5]])
    period = float(jnp.logaddexp(0.3, 0.0))  # softplus
    want = np.cos(2 * np.pi * np.abs(np.asarray(x1) - 0.5) / period)
    np.testing.assert_allclose(np.asarray(k.gram(p, x1, x2)), want, atol=1e-6)


def test_custom_kernel_grads_finite_on_duplicate_points():
    """The NaN-safe sqrt: identical rows make d=0 off-diagonal, where the
    true distance gradient is undefined — the clamp must keep grads finite."""
    x = jnp.asarray([[0.7], [0.7], [1.2]])
    y = jnp.asarray([0.1, 0.1, -0.3])
    cfg = GPConfig(input_dim=1, covar_module=MaternKernel(nu=1.5),
                   mean_module="zero", has_outputscale=False, noise_floor=1e-4)
    params = init_gp_params(cfg, jax.random.PRNGKey(0))
    g = jax.grad(lambda p: gp_prior_mll(cfg, p, x, y))(params)
    for leaf in jax.tree.leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_gp_predict_with_custom_mean_and_kernel():
    x = jnp.linspace(-1, 1, 10)[:, None]
    y = jnp.sin(3 * x)[:, 0]
    xt = jnp.linspace(-1, 1, 5)[:, None]
    cfg = GPConfig(input_dim=1, covar_module=MaternKernel(nu=2.5),
                   mean_module=LinearMean(), has_outputscale=False,
                   noise_floor=1e-4)
    params = init_gp_params(cfg, jax.random.PRNGKey(1))
    mean, cov = gp_predict(cfg, params, x, y, xt)
    assert mean.shape == (5,) and cov.shape == (5, 5)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.diag(np.asarray(cov)) > 0)


# ------------------------------------------------------------ learner level


def test_kernel_learning_cosine_beats_untrained(sin_data):
    """reference tests/test_GPR.py:95-121: for learning_mode in
    ['learn_kernel', 'both'], a 500-iter CosineKernel fit beats the
    1-iter 'vanilla' model on LL and RMSE."""
    x_train, y_train = sin_data

    vanilla = GPRegressionLearned(
        x_train, y_train, learning_mode="vanilla", num_iter_fit=1,
        mean_module="constant", covar_module=CosineKernel(), random_seed=22,
    )
    vanilla.fit(verbose=False)
    ll_vanilla, rmse_vanilla, _ = vanilla.eval(x_train, y_train)

    for learning_mode in ["learn_kernel", "both"]:
        learned = GPRegressionLearned(
            x_train, y_train, learning_mode=learning_mode, num_iter_fit=500,
            mean_module="constant", covar_module=CosineKernel(),
            random_seed=22,
        )
        learned.fit(valid_x=x_train, valid_t=y_train, verbose=False)
        # the period actually moved off its init
        p0 = float(jnp.logaddexp(0.0, 0.0))
        p1 = float(jax.nn.softplus(learned.params["custom_kernel"]["period_raw"]))
        assert abs(p1 - p0) > 1e-3
        ll, rmse, _ = learned.eval(x_train, y_train)
        assert ll > ll_vanilla, (learning_mode, ll, ll_vanilla)
        assert rmse < rmse_vanilla, (learning_mode, rmse, rmse_vanilla)


def test_meta_learner_accepts_custom_modules(sin_data):
    """GPRegressionMetaLearned with a Matern kernel + LinearMean trains and
    improves its meta-train MLL (reference GPR_meta_mll.py:42 accepts the
    same module instances)."""
    rng = np.random.RandomState(25)
    tasks = []
    for _ in range(4):
        x = rng.uniform(-2, 2, size=20)
        tasks.append((x, np.sin(4 * x) + rng.normal(scale=0.05, size=20)))

    m = GPRegressionMetaLearned(
        tasks, learning_mode="both", num_iter_fit=60, task_batch_size=-1,
        covar_module=MaternKernel(nu=1.5), mean_module=LinearMean(),
        lr_params=2e-2, random_seed=22,
    )
    loss0 = m.meta_fit(verbose=False, log_period=1, n_iter=1)
    loss1 = m.meta_fit(verbose=False, log_period=59, n_iter=59)
    assert loss1 < loss0
    # predict/eval surface works end-to-end
    x_c, y_c = tasks[0][0][:10], tasks[0][1][:10]
    x_t, y_t = tasks[0][0][10:], tasks[0][1][10:]
    ll, rmse, calib = m.eval(x_c, y_c, x_t, y_t)
    assert np.isfinite(ll) and np.isfinite(rmse)


def test_custom_module_state_dict_roundtrip(sin_data):
    x_train, y_train = sin_data
    m = GPRegressionLearned(
        x_train, y_train, learning_mode="learn_kernel", num_iter_fit=20,
        mean_module="constant", covar_module=CosineKernel(), random_seed=22,
    )
    m.fit(verbose=False)
    state = m.state_dict()
    m2 = GPRegressionLearned(
        x_train, y_train, learning_mode="learn_kernel", num_iter_fit=20,
        mean_module="constant", covar_module=CosineKernel(), random_seed=22,
    )
    m2.load_state_dict(state)
    np.testing.assert_allclose(
        np.asarray(m.params["custom_kernel"]["period_raw"]),
        np.asarray(m2.params["custom_kernel"]["period_raw"]))
    np.testing.assert_array_equal(m.predict(x_train)[0], m2.predict(x_train)[0])
