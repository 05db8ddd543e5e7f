"""PACOH-MLAP: PAC-bound training + optimization-based meta-testing."""

import pickle

import numpy as np
import pytest

from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC


@pytest.fixture(scope="module")
def sin_data():
    rs = np.random.RandomState(14)
    def tasks(n_tasks, n):
        out = []
        for _ in range(n_tasks):
            sl = rs.normal(0.7, 0.1); fq = rs.normal(2.0, 0.2)
            x = rs.uniform(-5, 5, (n, 1))
            y = sl * np.abs(x) + np.sin(fq * x) + 2 + 0.05 * rs.normal(size=(n, 1))
            out.append((x, y))
        return out
    train = tasks(6, 8)
    test = [(x[:8], y[:8], x[8:], y[8:]) for x, y in tasks(3, 28)]
    return train, test


class TestMLAP:
    def test_bound_decreases(self, sin_data):
        train, _ = sin_data
        m = GPRegressionMetaLearnedPAC(train, num_iter_fit=300, random_seed=1,
                                       covar_module="NN", mean_module="NN",
                                       meta_kl_weight=1e-3, svi_batch_size=3)
        _, _, losses0, _ = m._step_fn(
            m.params, m.opt_state, m.X, m.Y, m.mask, m._train_key, 0, 5
        )
        loss, diag = m.meta_fit(verbose=False, log_period=300)
        assert np.isfinite(loss)
        assert loss < float(np.mean(np.asarray(losses0)))
        assert set(diag) == {"avg_ll", "kl_outer_weighted", "kl_inner_weighted"}

    def test_meta_test_inference_and_eval(self, sin_data):
        train, test = sin_data
        m = GPRegressionMetaLearnedPAC(train, num_iter_fit=200, random_seed=1,
                                       covar_module="NN", mean_module="NN",
                                       meta_kl_weight=1e-3, svi_batch_size=3)
        m.meta_fit(verbose=False, log_period=200)
        ll, rmse, calib = m.eval_datasets(test, n_iter_meta_test=200)
        assert np.isfinite(ll) and np.isfinite(rmse) and 0 <= calib <= 1

    def test_predict_shapes_and_ci(self, sin_data):
        train, test = sin_data
        m = GPRegressionMetaLearnedPAC(train, num_iter_fit=100, random_seed=1,
                                       meta_kl_weight=1e-3, svi_batch_size=3)
        xc, yc, xt, _ = test[0]
        mean, std = m.predict(xc, yc, xt, n_iter_meta_test=100)
        assert mean.shape == (xt.shape[0],) and std.shape == (xt.shape[0],)
        assert np.all(np.isfinite(mean)) and np.all(std > 0)

    def test_prior_mean_runs(self, sin_data):
        train, _ = sin_data
        m = GPRegressionMetaLearnedPAC(train, num_iter_fit=50, random_seed=1,
                                       mean_module="NN", covar_module="SE",
                                       meta_kl_weight=1e-3, svi_batch_size=3)
        m.meta_fit(verbose=False, log_period=50)
        pm = m.prior_mean(np.linspace(-5, 5, 20), n_hyperposterior_samples=50)
        assert pm.shape == (20,) and np.all(np.isfinite(pm))

    def test_ragged_tasks_train_and_eval(self):
        """Physionet-style ragged tasks: masked variational posteriors."""
        rs = np.random.RandomState(0)
        train = []
        for n in [5, 8, 11, 6]:
            x = rs.uniform(-5, 5, (n, 1))
            y = np.sin(x) + 2 + 0.05 * rs.normal(size=(n, 1))
            train.append((x, y))
        x = rs.uniform(-5, 5, (26, 1))
        y = np.sin(x) + 2
        test = [(x[:6], y[:6], x[6:], y[6:])]
        m = GPRegressionMetaLearnedPAC(train, num_iter_fit=150, random_seed=1,
                                       covar_module="NN", mean_module="NN",
                                       meta_kl_weight=1e-3, svi_batch_size=3)
        loss, _ = m.meta_fit(verbose=False, log_period=150)
        assert np.isfinite(loss)
        ll, rmse, calib = m.eval_datasets(test, n_iter_meta_test=150)
        assert np.isfinite(ll) and np.isfinite(rmse)

    def test_masked_bound_matches_unpadded(self):
        """A padded+masked task produces the same bound as the unpadded one."""
        import jax
        import jax.numpy as jnp

        rs = np.random.RandomState(1)
        x = rs.uniform(-5, 5, (6, 1)).astype(np.float32)
        y = (np.sin(x) + 2).astype(np.float32)
        m = GPRegressionMetaLearnedPAC([(x, y)], num_iter_fit=10, random_seed=2,
                                       covar_module="NN", mean_module="NN",
                                       svi_batch_size=2)
        theta = np.asarray(jax.random.normal(jax.random.PRNGKey(0),
                                             (2, m.hyper_prior.dim)))
        xn = jnp.asarray(m.X[0])
        yn = jnp.asarray(m.Y[0])
        q_mean = jnp.asarray(m.params["q_means"][0])
        q_tril = jnp.asarray(m.params["q_trils"][0])

        b_ref, ll_ref, kl_ref = m._task_bound(
            q_mean, q_tril, xn, yn, jnp.asarray(theta), 0.01, 0.5, 4.0
        )
        # pad with 3 garbage points + mask
        pad = 3
        xp = jnp.concatenate([xn, 7.7 * jnp.ones((pad, 1))])
        yp = jnp.concatenate([yn, -3.3 * jnp.ones(pad)])
        qm_p = jnp.concatenate([q_mean, 9.9 * jnp.ones(pad)])
        qt_p = jnp.zeros((9, 9)).at[:6, :6].set(q_tril).at[6:, 6:].set(
            5.0 * jnp.eye(pad))
        mask = jnp.concatenate([jnp.ones(6), jnp.zeros(pad)])
        b_pad, ll_pad, kl_pad = m._task_bound(
            qm_p, qt_p, xp, yp, jnp.asarray(theta), 0.01, 0.5, 4.0, mask=mask
        )
        assert abs(float(b_ref) - float(b_pad)) < 1e-3
        assert abs(float(ll_ref) - float(ll_pad)) < 1e-3
        assert abs(float(kl_ref) - float(kl_pad)) < 1e-2

    def test_state_dict_roundtrip(self, sin_data):
        train, _ = sin_data
        m = GPRegressionMetaLearnedPAC(train, num_iter_fit=50, random_seed=1,
                                       meta_kl_weight=1e-3, svi_batch_size=3)
        m.meta_fit(verbose=False, log_period=50)
        m2 = GPRegressionMetaLearnedPAC(train, num_iter_fit=50, random_seed=42,
                                        meta_kl_weight=1e-3, svi_batch_size=3)
        m2.load_state_dict(pickle.loads(pickle.dumps(m.state_dict())))
        np.testing.assert_array_equal(
            np.asarray(m.params["hyper_post"]["loc"]),
            np.asarray(m2.params["hyper_post"]["loc"]),
        )
