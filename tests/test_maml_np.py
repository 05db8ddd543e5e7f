"""MAML + Neural Process learners."""

import pickle

import numpy as np
import pytest

from meta_learning_pacoh_tpu import MAMLRegression, NPRegressionMetaLearned


@pytest.fixture(scope="module")
def sin_data():
    rs = np.random.RandomState(17)
    def tasks(n_tasks, n):
        out = []
        for _ in range(n_tasks):
            amp = rs.uniform(0.8, 1.2); phase = rs.normal(0, 0.2)
            x = rs.uniform(-5, 5, (n, 1))
            y = amp * np.sin(x - phase) + 0.05 * rs.normal(size=(n, 1))
            out.append((x, y))
        return out
    train = tasks(10, 10)
    test = [(x[:10], y[:10], x[10:], y[10:]) for x, y in tasks(4, 40)]
    return train, test


class TestMAML:
    def test_learning_reduces_rmse(self, sin_data):
        train, test = sin_data
        m = MAMLRegression(train, num_iter_fit=800, random_seed=3,
                           num_inner_steps=2, layer_sizes=(32, 32))
        r0 = m.eval_datasets(test)
        m.meta_fit(verbose=False, log_period=800)
        r1 = m.eval_datasets(test)
        assert r1 < r0

    def test_seed_determinism(self, sin_data):
        train, test = sin_data
        preds = []
        for _ in range(2):
            m = MAMLRegression(train, num_iter_fit=50, random_seed=5,
                               layer_sizes=(16, 16))
            m.meta_fit(verbose=False)
            preds.append(m.predict(test[0][0], test[0][1], test[0][2])[0])
        np.testing.assert_array_equal(preds[0], preds[1])

    def test_predict_returns_adapted_and_initial(self, sin_data):
        train, test = sin_data
        m = MAMLRegression(train, num_iter_fit=20, random_seed=5,
                           layer_sizes=(16, 16))
        m.meta_fit(verbose=False)
        adapted, initial = m.predict(test[0][0], test[0][1], test[0][2],
                                     num_steps_eval=3)
        assert adapted.shape == initial.shape
        assert np.abs(adapted - initial).max() > 0

    def test_more_eval_steps_changes_prediction(self, sin_data):
        train, test = sin_data
        m = MAMLRegression(train, num_iter_fit=20, random_seed=5,
                           layer_sizes=(16, 16))
        a1, _ = m.predict(test[0][0], test[0][1], test[0][2], num_steps_eval=1)
        a5, _ = m.predict(test[0][0], test[0][1], test[0][2], num_steps_eval=5)
        assert np.abs(a1 - a5).max() > 0

    def test_state_dict_roundtrip(self, sin_data):
        train, test = sin_data
        m = MAMLRegression(train, num_iter_fit=30, random_seed=5, layer_sizes=(16, 16))
        m.meta_fit(verbose=False)
        m2 = MAMLRegression(train, num_iter_fit=30, random_seed=99, layer_sizes=(16, 16))
        m2.load_state_dict(pickle.loads(pickle.dumps(m.state_dict())))
        a, _ = m.predict(test[0][0], test[0][1], test[0][2])
        b, _ = m2.predict(test[0][0], test[0][1], test[0][2])
        np.testing.assert_array_equal(a, b)


class TestNP:
    def test_learning_improves_ll(self, sin_data):
        train, test = sin_data
        m = NPRegressionMetaLearned(train, num_iter_fit=1000, random_seed=3,
                                    r_dim=32, z_dim=32, h_dim=32)
        ll0 = m.eval_datasets(test)[0]
        m.meta_fit(verbose=False, log_period=1000)
        ll1, rmse, calib = m.eval_datasets(test)
        assert ll1 > ll0

    def test_state_dict_roundtrip_deterministic_given_key(self, sin_data):
        train, test = sin_data
        m = NPRegressionMetaLearned(train, num_iter_fit=30, random_seed=3)
        m.meta_fit(verbose=False)
        m2 = NPRegressionMetaLearned(train, num_iter_fit=30, random_seed=55)
        m2.load_state_dict(pickle.loads(pickle.dumps(m.state_dict())))
        # align the prediction sampling keys
        m2._key = m._key
        a, _ = m.predict(test[0][0], test[0][1], test[0][2])
        b, _ = m2.predict(test[0][0], test[0][1], test[0][2])
        np.testing.assert_array_equal(a, b)

    def test_confidence_intervals_and_calib(self, sin_data):
        train, test = sin_data
        m = NPRegressionMetaLearned(train, num_iter_fit=100, random_seed=3)
        m.meta_fit(verbose=False)
        ucb, lcb = m.confidence_intervals(test[0][0], test[0][1], test[0][2])
        assert np.all(ucb > lcb)
        ll, rmse, calib = m.eval(*test[0])
        assert np.isfinite(ll) and 0 <= calib <= 1
