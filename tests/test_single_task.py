"""Single-task learners (GPR-MLL / GPR-PAC) + graft entry points."""

import pickle

import numpy as np
import pytest

from meta_learning_pacoh_tpu import GPRegressionLearned, GPRegressionLearnedPAC


@pytest.fixture(scope="module")
def task_data():
    rs = np.random.RandomState(25)
    x = rs.normal(-1, 2.0, (24, 1))
    y = 0.6 * x + np.sin((0.6 * x) ** 2) - 1 + rs.normal(0, 0.1, x.shape)
    xt = rs.normal(-1, 2.0, (60, 1))
    yt = 0.6 * xt + np.sin((0.6 * xt) ** 2) - 1 + rs.normal(0, 0.1, xt.shape)
    return x, y, xt, yt


class TestGPRLearned:
    def test_fit_improves(self, task_data):
        x, y, xt, yt = task_data
        m = GPRegressionLearned(x, y, num_iter_fit=300, random_seed=1)
        ll0 = m.eval(xt, yt)[0]
        m.fit(verbose=False, log_period=300)
        ll1 = m.eval(xt, yt)[0]
        assert ll1 > ll0

    def test_seed_determinism(self, task_data):
        x, y, xt, _ = task_data
        preds = []
        for _ in range(2):
            m = GPRegressionLearned(x, y, num_iter_fit=50, random_seed=9)
            m.fit(verbose=False)
            preds.append(m.predict(xt)[0])
        np.testing.assert_array_equal(preds[0], preds[1])

    def test_state_dict_roundtrip(self, task_data):
        x, y, xt, _ = task_data
        m = GPRegressionLearned(x, y, num_iter_fit=50, random_seed=9)
        m.fit(verbose=False)
        m2 = GPRegressionLearned(x, y, num_iter_fit=50, random_seed=77)
        m2.load_state_dict(pickle.loads(pickle.dumps(m.state_dict())))
        np.testing.assert_array_equal(m.predict(xt)[0], m2.predict(xt)[0])

    def test_learned_mean_beats_vanilla(self, task_data):
        """NN mean improves LL over vanilla GP (mirrors reference
        test_GPR.py:76-93)."""
        x, y, xt, yt = task_data
        vanilla = GPRegressionLearned(x, y, num_iter_fit=300, random_seed=3,
                                      learning_mode="vanilla", mean_module="zero",
                                      covar_module="SE")
        vanilla.fit(verbose=False)
        learned = GPRegressionLearned(x, y, num_iter_fit=300, random_seed=3,
                                      learning_mode="both", mean_module="NN",
                                      covar_module="NN")
        learned.fit(verbose=False)
        assert learned.eval(xt, yt)[0] > vanilla.eval(xt, yt)[0]

    def test_plateau_scheduler_reduces_lr(self, task_data):
        from meta_learning_pacoh_tpu.algos.gpr_mll import ReduceLROnPlateau

        sched = ReduceLROnPlateau(factor=0.5, patience=2)
        scales = [sched.step(1.0) for _ in range(10)]  # constant metric
        assert scales[-1] < 1.0

    def test_confidence_intervals(self, task_data):
        x, y, xt, _ = task_data
        m = GPRegressionLearned(x, y, num_iter_fit=30, random_seed=1)
        m.fit(verbose=False)
        ucb, lcb = m.confidence_intervals(xt)
        assert np.all(ucb > lcb)


class TestGPRPAC:
    def test_fit_improves_and_finite(self, task_data):
        x, y, xt, yt = task_data
        m = GPRegressionLearnedPAC(x, y, num_iter_fit=1600, random_seed=1)
        ll0 = m.eval(xt, yt)[0]
        m.fit(verbose=False, log_period=1600)
        ll1, rmse, calib = m.eval(xt, yt)
        assert np.isfinite(ll1) and ll1 > ll0

    def test_bound_decreases(self, task_data):
        x, y, _, _ = task_data
        m = GPRegressionLearnedPAC(x, y, num_iter_fit=200, random_seed=1)
        l0 = float(m._pac_loss(m.params)[0])
        l1 = m.fit(verbose=False, log_period=200)
        assert l1 < l0


class TestGraftEntry:
    def test_entry_compiles(self):
        import jax
        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        means, covs = out
        assert means.shape[0] == 4  # particles
        assert np.all(np.isfinite(np.asarray(means)))

    def test_dryrun_multichip(self):
        import jax
        import __graft_entry__ as g

        n = min(8, len(jax.devices()))
        if n < 2:
            pytest.skip("needs >= 2 devices")
        g.dryrun_multichip(n)
