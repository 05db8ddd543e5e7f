"""lr_decay (staircase StepLR) support on the fused training kernels.

The fused mega-kernels take the Adam lr as a runtime SMEM scalar that is
constant within one launch; `ops/pallas/launch_sched.py` splits host chunks
at staircase boundaries so each launch's scalar is exact (reference
schedule: GPR_meta_mll.py:261-262, StepLR step_size=1000).

These tests shrink `LR_TRANSITION_STEPS` so a ~20-iteration interpret-mode
run crosses several boundaries, then check the fused trajectory against the
learner's own optax XLA path (which builds
`optax.exponential_decay(transition_steps=LR_TRANSITION_STEPS,
staircase=True)` from the same constant).
"""

import numpy as np
import jax
import pytest

from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu import (
    GPRegressionMetaLearned,
    GPRegressionMetaLearnedPAC,
    GPRegressionMetaLearnedSVGD,
    GPRegressionMetaLearnedVI,
)
from meta_learning_pacoh_tpu.ops.pallas import launch_sched

TRANSITION = 7
DECAY = 0.5
# unusual lr so shrunken-transition optimizers never collide with other
# tests' shared jit-cache entries keyed on (lr, lr_decay, transition)
LR = 1.3e-3


def _meta_train(n_tasks=4):
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    return env.generate_meta_train_data(n_tasks=n_tasks, n_samples=5)


# ----------------------------------------------------------- unit: scheduler


def test_staircase_launches_cover_and_never_cross():
    for step0, n_steps, cap, t in [(0, 20, 512, 7), (5, 20, 4, 7),
                                   (999, 3, 512, 1000), (13, 1, 512, 7),
                                   (0, 2048, 512, 1000)]:
        spans = list(launch_sched.staircase_launches(
            step0, n_steps, cap, lr_decay=0.5, transition=t))
        # exact cover, in order
        assert spans[0][0] == step0
        assert sum(sub for _, sub in spans) == n_steps
        pos = step0
        for s, sub in spans:
            assert s == pos and 1 <= sub <= cap
            # never crosses a staircase boundary
            assert (s // t) == ((s + sub - 1) // t)
            pos += sub
    # lr_decay == 1.0: plain max_launch chunking, no boundary splits
    spans = list(launch_sched.staircase_launches(3, 10, 4, lr_decay=1.0,
                                                 transition=2))
    assert [sub for _, sub in spans] == [4, 4, 2]


def test_staircase_lr_matches_optax_schedule():
    import optax

    sched = optax.exponential_decay(LR, transition_steps=TRANSITION,
                                    decay_rate=DECAY, staircase=True)
    for step in [0, 1, 6, 7, 13, 14, 70]:
        np.testing.assert_allclose(
            launch_sched.staircase_lr(LR, DECAY, step, TRANSITION),
            float(sched(step)), rtol=1e-6)


# ------------------------------------------------- learner-level trajectories


def _shrunk(monkeypatch):
    monkeypatch.setattr(launch_sched, "LR_TRANSITION_STEPS", TRANSITION)
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "0")


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree.leaves(tree)]


def _drop_degenerate(params):
    """Exclude kernel_nn b_out: its true gradient is exactly 0 (pairwise
    feature distances are shift-invariant), so both paths random-walk float
    noise there — same exclusion as tests/test_fused_map.py."""
    out = jax.tree.map(lambda x: x, params)
    out["kernel_nn"] = dict(out["kernel_nn"])
    del out["kernel_nn"]["b_out"]
    return out


def test_map_fused_lr_decay_matches_xla(monkeypatch):
    n_iter = 20
    _shrunk(monkeypatch)

    def build():
        return GPRegressionMetaLearned(
            _meta_train(), num_iter_fit=n_iter, random_seed=30,
            weight_decay=0.2, lr_params=LR, lr_decay=DECAY, feature_dim=2,
            task_batch_size=-1, mean_nn_layers=(8, 8),
            kernel_nn_layers=(8, 8),
        )

    m_plain = build()
    assert not m_plain._fused_path_ok()
    m_plain.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_fused = build()
    assert m_fused._fused_path_ok()
    # log_period 9 crosses the step-7 and step-14 staircase boundaries
    # mid-chunk, so the launch splitting (not just per-chunk lr) is exercised
    m_fused.meta_fit(verbose=False, log_period=9, n_iter=n_iter)

    for got, want in zip(_leaves(_drop_degenerate(m_fused.params)),
                         _leaves(_drop_degenerate(m_plain.params))):
        np.testing.assert_allclose(got, want, rtol=0, atol=2e-3)

    # the synced optax chain must carry the schedule count: continuing on
    # the XLA path must use the decayed lr, i.e. match a pure-XLA run
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "0")
    m_fused._fused = None
    assert not m_fused._fused_path_ok()
    m_fused.meta_fit(verbose=False, log_period=10, n_iter=10)
    m_plain.meta_fit(verbose=False, log_period=10, n_iter=10)
    for got, want in zip(_leaves(_drop_degenerate(m_fused.params)),
                         _leaves(_drop_degenerate(m_plain.params))):
        np.testing.assert_allclose(got, want, rtol=0, atol=3e-3)


def test_svgd_fused_lr_decay_matches_xla(monkeypatch):
    n_iter = 16
    _shrunk(monkeypatch)

    def build():
        return GPRegressionMetaLearnedSVGD(
            _meta_train(), num_iter_fit=n_iter, random_seed=30, lr=LR,
            lr_decay=DECAY, num_particles=3, task_batch_size=-1,
            mean_nn_layers=(8,), kernel_nn_layers=(8,),
        )

    m_plain = build()
    assert not m_plain._fused_path_ok()
    m_plain.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_fused = build()
    assert m_fused._fused_path_ok()
    m_fused.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    np.testing.assert_allclose(np.asarray(m_fused.particles),
                               np.asarray(m_plain.particles),
                               rtol=0, atol=2e-3)


def test_mlap_fused_lr_decay_matches_xla(monkeypatch):
    """MLAP applies ONE staircase factor to TWO lr groups (lr_main,
    lr_post = lr * posterior_lr_multiplier); a multiplier != 1 pins that
    both groups decay together. The no-noise inner-KL gram amplifies f32
    rounding (condition ~1e6), so — as in test_fused_mlap.py — the
    yardstick is the chaos gap of a 1e-7-perturbed XLA run, not a fixed
    atol."""
    n_iter = 16
    _shrunk(monkeypatch)

    def build():
        return GPRegressionMetaLearnedPAC(
            _meta_train(), num_iter_fit=n_iter, random_seed=30, lr=LR,
            lr_decay=DECAY, posterior_lr_multiplier=0.5, svi_batch_size=3,
            meta_kl_weight=1e-3, task_kl_weight=0.5,
            covar_module="NN", mean_module="NN",
            mean_nn_layers=(8, 8), kernel_nn_layers=(8, 8),
        )

    m_plain = build()
    assert not m_plain._fused_path_ok()
    # log_period 9 forces an XLA chunk boundary mid-staircase too
    m_plain.meta_fit(verbose=False, log_period=9, n_iter=n_iter)

    m_chaos = build()
    m_chaos.params["hyper_post"]["loc"] = (
        m_chaos.params["hyper_post"]["loc"] * (1.0 + 1e-7))
    m_chaos.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_fused = build()
    assert m_fused._fused_path_ok()
    m_fused.meta_fit(verbose=False, log_period=9, n_iter=n_iter)

    flat_f = np.concatenate(_leaves(m_fused.params), axis=None)
    flat_x = np.concatenate(_leaves(m_plain.params), axis=None)
    flat_p = np.concatenate(_leaves(m_chaos.params), axis=None)
    gap_fused = float(np.max(np.abs(flat_f - flat_x)))
    gap_chaos = float(np.max(np.abs(flat_p - flat_x)))
    # same loose calibration as test_fused_mlap.py: a wrong lr in either
    # group diverges at optimizer-step scale, orders above this band
    assert gap_fused <= 6.0 * gap_chaos + 1e-4, (gap_fused, gap_chaos)

    # continuing on the XLA path must resume at the decayed lr for BOTH
    # multi_transform groups (schedule counts synced by bump_counts)
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "0")
    m_fused._fused = None
    assert not m_fused._fused_path_ok()
    m_fused.meta_fit(verbose=False, log_period=8, n_iter=8)
    m_plain.meta_fit(verbose=False, log_period=8, n_iter=8)
    flat_f2 = np.concatenate(_leaves(m_fused.params), axis=None)
    flat_x2 = np.concatenate(_leaves(m_plain.params), axis=None)
    gap_cont = float(np.max(np.abs(flat_f2 - flat_x2)))
    assert gap_cont <= 8.0 * gap_chaos + 2e-4, (gap_cont, gap_chaos)


def test_vi_fused_lr_decay_matches_xla(monkeypatch):
    n_iter = 16
    _shrunk(monkeypatch)

    def build():
        return GPRegressionMetaLearnedVI(
            _meta_train(), num_iter_fit=n_iter, random_seed=30, lr=LR,
            lr_decay=DECAY, svi_batch_size=4, cov_type="diag",
            task_batch_size=-1, mean_nn_layers=(8,), kernel_nn_layers=(8,),
        )

    m_plain = build()
    assert not m_plain._fused_path_ok()
    m_plain.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_fused = build()
    assert m_fused._fused_path_ok()
    m_fused.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    for k in ("loc", "log_scale"):
        np.testing.assert_allclose(np.asarray(m_fused.posterior[k]),
                                   np.asarray(m_plain.posterior[k]),
                                   rtol=0, atol=2e-3)
