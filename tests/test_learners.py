"""Tier-2/3: behavioral tests of the meta-learners (mirrors reference
tests/test_GPR.py): seed determinism, checkpoint round-trips, and
learning-quality properties — all with small iteration budgets on CPU."""

import pickle

import numpy as np
import pytest

from meta_learning_pacoh_tpu import (
    GPRegressionLearned,
    GPRegressionMetaLearned,
    GPRegressionMetaLearnedSVGD,
    GPRegressionMetaLearnedVI,
)


def _sample_sinusoid_data(rs, n_tasks, n_samples):
    tuples = []
    for _ in range(n_tasks):
        slope = rs.normal(0.7, 0.1)
        freq = rs.normal(2.0, 0.2)
        x = rs.uniform(-5, 5, (n_samples, 1))
        y = slope * np.abs(x) + np.sin(freq * x) + 2 + 0.05 * rs.normal(size=(n_samples, 1))
        tuples.append((x, y))
    return tuples


@pytest.fixture(scope="module")
def sin_data():
    rs = np.random.RandomState(14)
    train = _sample_sinusoid_data(rs, 8, 8)
    test = [
        (x[:8], y[:8], x[8:], y[8:])
        for x, y in _sample_sinusoid_data(rs, 4, 48)
    ]
    return train, test


class TestPACOHMAP:
    def test_seed_determinism(self, sin_data):
        train, test = sin_data
        preds = []
        for _ in range(2):
            m = GPRegressionMetaLearned(train, num_iter_fit=60, random_seed=7,
                                        task_batch_size=3)
            m.meta_fit(verbose=False, log_period=30)
            mean, std = m.predict(test[0][0], test[0][1], test[0][2])
            preds.append((mean, std))
        np.testing.assert_array_equal(preds[0][0], preds[1][0])
        np.testing.assert_array_equal(preds[0][1], preds[1][1])

    def test_different_seed_differs(self, sin_data):
        train, test = sin_data
        m1 = GPRegressionMetaLearned(train, num_iter_fit=60, random_seed=7)
        m1.meta_fit(verbose=False)
        m2 = GPRegressionMetaLearned(train, num_iter_fit=60, random_seed=8)
        m2.meta_fit(verbose=False)
        a, _ = m1.predict(test[0][0], test[0][1], test[0][2])
        b, _ = m2.predict(test[0][0], test[0][1], test[0][2])
        assert np.abs(a - b).max() > 0

    @pytest.mark.parametrize("mean_module,covar_module", [
        ("NN", "NN"), ("constant", "SE"),
    ])
    def test_state_dict_roundtrip_and_training_stays_in_sync(
        self, sin_data, mean_module, covar_module
    ):
        train, test = sin_data
        mode = "both" if mean_module == "NN" else "learn_kernel"
        if mean_module == "NN" and covar_module == "SE":
            mode = "learn_mean"
        m = GPRegressionMetaLearned(train, num_iter_fit=40, random_seed=5,
                                    learning_mode=mode, mean_module=mean_module,
                                    covar_module=covar_module)
        m.meta_fit(verbose=False)
        blob = pickle.dumps(m.state_dict())

        m2 = GPRegressionMetaLearned(train, num_iter_fit=40, random_seed=99,
                                     learning_mode=mode, mean_module=mean_module,
                                     covar_module=covar_module)
        m2.load_state_dict(pickle.loads(blob))
        a, sa = m.predict(test[0][0], test[0][1], test[0][2])
        b, sb = m2.predict(test[0][0], test[0][1], test[0][2])
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(sa, sb)

        # continue training from the restored state stays in sync with the
        # original (same training keys + same step counter)
        m2._train_key = m._train_key
        m2._step_count = m._step_count
        m.meta_fit(verbose=False, n_iter=20)
        m2.meta_fit(verbose=False, n_iter=20)
        a, _ = m.predict(test[0][0], test[0][1], test[0][2])
        b, _ = m2.predict(test[0][0], test[0][1], test[0][2])
        np.testing.assert_array_equal(a, b)

    def test_learning_improves_eval(self, sin_data):
        train, test = sin_data
        m = GPRegressionMetaLearned(train, num_iter_fit=400, random_seed=3,
                                    task_batch_size=4, weight_decay=0.1)
        ll0, rmse0, _ = m.eval_datasets(test)
        m.meta_fit(verbose=False, log_period=400)
        ll, rmse, _ = m.eval_datasets(test)
        assert ll > ll0
        assert rmse < rmse0

    def test_vanilla_mode_trains_only_noise(self, sin_data):
        train, _ = sin_data
        m = GPRegressionMetaLearned(train, num_iter_fit=30, random_seed=3,
                                    learning_mode="vanilla", mean_module="zero",
                                    covar_module="SE")
        p0 = {k: np.asarray(v) for k, v in m.params.items() if k != "noise_raw"}
        noise0 = float(m.params["noise_raw"])
        m.meta_fit(verbose=False)
        for k, v0 in p0.items():
            np.testing.assert_array_equal(np.asarray(m.params[k]), v0)
        assert float(m.params["noise_raw"]) != noise0


class TestPACOHSVGD:
    def test_seed_determinism(self, sin_data):
        train, test = sin_data
        preds = []
        for _ in range(2):
            m = GPRegressionMetaLearnedSVGD(train, num_iter_fit=40, random_seed=11,
                                            num_particles=4)
            m.meta_fit(verbose=False)
            mean, _ = m.predict(test[0][0], test[0][1], test[0][2])
            preds.append(mean)
        np.testing.assert_array_equal(preds[0], preds[1])

    def test_state_dict_roundtrip(self, sin_data):
        train, test = sin_data
        m = GPRegressionMetaLearnedSVGD(train, num_iter_fit=30, random_seed=11,
                                        num_particles=4)
        m.meta_fit(verbose=False)
        m2 = GPRegressionMetaLearnedSVGD(train, num_iter_fit=30, random_seed=50,
                                         num_particles=4)
        m2.load_state_dict(pickle.loads(pickle.dumps(m.state_dict())))
        a, _ = m.predict(test[0][0], test[0][1], test[0][2])
        b, _ = m2.predict(test[0][0], test[0][1], test[0][2])
        np.testing.assert_array_equal(a, b)

    def test_learning_improves_eval(self, sin_data):
        train, test = sin_data
        m = GPRegressionMetaLearnedSVGD(train, num_iter_fit=300, random_seed=2,
                                        num_particles=5, prior_factor=0.01)
        ll0, rmse0, _ = m.eval_datasets(test)
        m.meta_fit(verbose=False, log_period=300)
        ll, rmse, _ = m.eval_datasets(test)
        assert ll > ll0

    def test_imq_kernel_runs(self, sin_data):
        train, test = sin_data
        m = GPRegressionMetaLearnedSVGD(train, num_iter_fit=20, random_seed=2,
                                        num_particles=4, kernel="IMQ")
        m.meta_fit(verbose=False)
        ll, rmse, calib = m.eval(*test[0])
        assert np.isfinite(ll) and np.isfinite(rmse)

    def test_confidence_intervals_ordered(self, sin_data):
        train, test = sin_data
        m = GPRegressionMetaLearnedSVGD(train, num_iter_fit=20, random_seed=2,
                                        num_particles=4)
        m.meta_fit(verbose=False)
        ucb, lcb = m.confidence_intervals(test[0][0], test[0][1], test[0][2])
        assert np.all(ucb > lcb)


class TestPACOHVI:
    def test_seed_determinism_and_modes(self, sin_data):
        train, test = sin_data
        m1 = GPRegressionMetaLearnedVI(train, num_iter_fit=40, random_seed=21,
                                       svi_batch_size=4)
        m1.meta_fit(verbose=False)
        m2 = GPRegressionMetaLearnedVI(train, num_iter_fit=40, random_seed=21,
                                       svi_batch_size=4)
        m2.meta_fit(verbose=False)
        # MAP predictions are sample-free -> must be identical
        a, _ = m1.predict(test[0][0], test[0][1], test[0][2], mode="MAP")
        b, _ = m2.predict(test[0][0], test[0][1], test[0][2], mode="MAP")
        np.testing.assert_array_equal(a, b)

    def test_elbo_decreases_diag(self, sin_data):
        train, _ = sin_data
        m = GPRegressionMetaLearnedVI(train, num_iter_fit=200, random_seed=1,
                                      svi_batch_size=5, cov_type="diag")
        _, _, losses_before = m._step_fn(
            m.posterior, m.opt_state, m.X, m.Y, m.mask, m._train_key, 0, 5
        )
        final_loss = m.meta_fit(verbose=False, log_period=200)
        assert final_loss < float(np.mean(np.asarray(losses_before)))

    def test_full_cov_trains_finite(self, sin_data):
        """Full covariance over P~2400 GP-prior params: dense correlated
        sampling noise makes fast ELBO descent inherently hard at this scale;
        the contract is numerical stability, not 200-step convergence."""
        train, test = sin_data
        m = GPRegressionMetaLearnedVI(train, num_iter_fit=300, random_seed=1,
                                      svi_batch_size=5, cov_type="full")
        loss = m.meta_fit(verbose=False, log_period=300)
        assert np.isfinite(loss)
        ll, rmse, _ = m.eval(*test[0])
        assert np.isfinite(ll) and np.isfinite(rmse)

    def test_state_dict_roundtrip(self, sin_data):
        train, test = sin_data
        m = GPRegressionMetaLearnedVI(train, num_iter_fit=30, random_seed=21)
        m.meta_fit(verbose=False)
        m2 = GPRegressionMetaLearnedVI(train, num_iter_fit=30, random_seed=77)
        m2.load_state_dict(pickle.loads(pickle.dumps(m.state_dict())))
        a, _ = m.predict(test[0][0], test[0][1], test[0][2], mode="MAP")
        b, _ = m2.predict(test[0][0], test[0][1], test[0][2], mode="MAP")
        np.testing.assert_array_equal(a, b)


class TestStatisticalLearning:
    """The reference's strongest learning-quality properties
    (reference: tests/test_GPR.py:224-278)."""

    @pytest.fixture(scope="class")
    def meta_8task_eval(self, sin_data):
        """(ll, rmse) of a meta-learner fit on all 8 train tasks — shared by
        both statistical tests below."""
        train, test = sin_data
        m = GPRegressionMetaLearned(train, num_iter_fit=400, random_seed=9,
                                    weight_decay=0.0, task_batch_size=4)
        m.meta_fit(verbose=False)
        ll, rmse, _ = m.eval_datasets(test)
        return ll, rmse

    def test_more_meta_train_tasks_improve_eval(self, sin_data, meta_8task_eval):
        """More meta-train tasks => better test LL and RMSE
        (reference: tests/test_GPR.py:224-248, 2 vs 10 datasets)."""
        train, test = sin_data
        ll8, rmse8 = meta_8task_eval

        m2 = GPRegressionMetaLearned(train[:2], num_iter_fit=400, random_seed=9,
                                     weight_decay=0.0, task_batch_size=2)
        m2.meta_fit(verbose=False)
        ll2, rmse2, _ = m2.eval_datasets(test)

        assert ll8 > ll2
        assert rmse8 < rmse2

    def test_meta_learning_beats_per_task_gp(self, sin_data, meta_8task_eval):
        """Meta-learned prior beats fitting a fresh GP per test task on its
        own context points (reference: tests/test_GPR.py:251-278)."""
        train, test = sin_data
        ll_meta, _ = meta_8task_eval

        per_task_lls = []
        for (xc, yc, xt, yt) in test:
            g = GPRegressionLearned(xc, yc, learning_mode="both",
                                    num_iter_fit=400, random_seed=9,
                                    weight_decay=0.0)
            g.fit(verbose=False)
            per_task_lls.append(g.eval(xt, yt)[0])

        assert ll_meta > np.mean(per_task_lls)


class TestRaggedTasks:
    def test_variable_task_sizes_train_and_eval(self):
        """Physionet-style ragged tasks: padding+masking must train cleanly."""
        rs = np.random.RandomState(0)
        train = []
        for n in [5, 8, 11, 6, 9]:
            x = rs.uniform(-5, 5, (n, 1))
            y = np.sin(x) + 5 + 0.05 * rs.normal(size=(n, 1))
            train.append((x, y))
        m = GPRegressionMetaLearned(train, num_iter_fit=100, random_seed=1,
                                    task_batch_size=3)
        loss = m.meta_fit(verbose=False, log_period=100)
        assert np.isfinite(loss)
        x = rs.uniform(-5, 5, (30, 1))
        y = np.sin(x) + 5
        ll, rmse, calib = m.eval(x[:10], y[:10], x[10:], y[10:])
        assert np.isfinite(ll) and np.isfinite(rmse)
