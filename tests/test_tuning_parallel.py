"""Batched tuning trials (utils/tuning_parallel + tune_run batch mode).

Covers the TPU-native replacement for the reference's concurrent Ray trials
(custom_tune/trial_runner.py:80-138):
 1. hyper-parallel MAP fit (different lr / weight_decay, one vmapped
    program) == per-model sequential meta_fit,
 2. opt-state write-back: continued training after a hyper-parallel fit
    matches continued training after a sequential fit,
 3. TPE-equivalence: batched tune_run draws the SAME suggestion stream as
    manually driving the suggester with tells at batch boundaries,
 4. whole-batch failure falls back to sequential trials,
 5. run_map_trial_batch groups by static keys and preserves result order.
"""

import numpy as np
import jax
import pytest

from meta_learning_pacoh_tpu import (
    GPRegressionMetaLearned,
    GPRegressionMetaLearnedSVGD,
    GPRegressionMetaLearnedVI,
)
from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu.utils.tuning import (
    LogUniform, TPESuggest, Uniform, tune_run,
)
from meta_learning_pacoh_tpu.utils.tuning_parallel import (
    fit_hyper_parallel,
    fit_map_hyper_parallel,
    fit_svgd_hyper_parallel,
    fit_vi_hyper_parallel,
    run_map_trial_batch,
)

HIDDEN = (8, 8)


def _tasks(n_tasks=4, n_samples=5, seed=26):
    env = SinusoidDataset(random_state=np.random.RandomState(seed))
    return env.generate_meta_train_data(n_tasks=n_tasks, n_samples=n_samples)


def _build(mt, lr, wd, seed=30, n_iter=30, feature_dim=2,
           task_batch_size=-1):
    return GPRegressionMetaLearned(
        mt, num_iter_fit=n_iter, random_seed=seed, lr_params=lr,
        weight_decay=wd, feature_dim=feature_dim,
        task_batch_size=task_batch_size,
        mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
    )


HYPERS = [(1e-3, 0.2), (3e-3, 0.01), (5e-4, 0.5)]


def _drop_degenerate(tree):
    """kernel_nn b_out's true gradient is exactly 0 (pairwise feature
    distances are shift-invariant): Adam random-walks float noise there and
    any two float-reassociated runs drift apart — see test_fused_map.py."""
    out = jax.tree.map(lambda x: x, tree)
    out["kernel_nn"] = dict(out["kernel_nn"])
    del out["kernel_nn"]["b_out"]
    return out


def test_hyper_parallel_fit_matches_sequential():
    mt = _tasks()
    n_iter = 30

    seq = [_build(mt, lr, wd) for lr, wd in HYPERS]
    for m in seq:
        m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    par = [_build(mt, lr, wd) for lr, wd in HYPERS]
    fit_map_hyper_parallel(par, n_iter=n_iter)

    for m_s, m_p in zip(seq, par):
        assert m_p.fitted and m_p._step_count == n_iter
        for got, want in zip(jax.tree.leaves(_drop_degenerate(m_p.params)),
                             jax.tree.leaves(_drop_degenerate(m_s.params))):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=0, atol=2e-3)


def test_hyper_parallel_single_step_exact():
    """One step through the inject-hyperparams optimizer is bit-close to the
    learner's own adamw step for EVERY leaf (the trajectory tolerance above
    is pure degenerate-coordinate drift, not an optimizer difference)."""
    mt = _tasks()
    seq = [_build(mt, lr, wd) for lr, wd in HYPERS]
    for m in seq:
        m.meta_fit(verbose=False, log_period=1, n_iter=1)
    par = [_build(mt, lr, wd) for lr, wd in HYPERS]
    fit_map_hyper_parallel(par, n_iter=1)
    for m_s, m_p in zip(seq, par):
        for got, want in zip(jax.tree.leaves(m_p.params),
                             jax.tree.leaves(m_s.params)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=0, atol=1e-6)


def test_opt_state_writeback_supports_continued_training():
    mt = _tasks()

    m_seq = _build(mt, 2e-3, 0.1)
    m_seq.meta_fit(verbose=False, log_period=20, n_iter=20)
    m_seq.meta_fit(verbose=False, log_period=20, n_iter=20)

    m_par = _build(mt, 2e-3, 0.1)
    fit_map_hyper_parallel([m_par, _build(mt, 1e-3, 0.3)], n_iter=20)
    m_par.meta_fit(verbose=False, log_period=20, n_iter=20)

    for got, want in zip(jax.tree.leaves(_drop_degenerate(m_par.params)),
                         jax.tree.leaves(_drop_degenerate(m_seq.params))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-3)


def test_hyper_parallel_rejects_mixed_static_configs():
    mt = _tasks()
    with pytest.raises(AssertionError):
        fit_map_hyper_parallel(
            [_build(mt, 1e-3, 0.1, feature_dim=2),
             _build(mt, 1e-3, 0.1, feature_dim=4)], n_iter=5)


def _build_svgd(mt, lr, pf, bw, seed=30, n_iter=20):
    return GPRegressionMetaLearnedSVGD(
        mt, num_iter_fit=n_iter, random_seed=seed, lr=lr, prior_factor=pf,
        bandwidth=bw, num_particles=3, task_batch_size=-1,
        mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
    )


def _build_vi(mt, lr, pf, seed=30, n_iter=20):
    return GPRegressionMetaLearnedVI(
        mt, num_iter_fit=n_iter, random_seed=seed, lr=lr, prior_factor=pf,
        svi_batch_size=2, task_batch_size=-1,
        mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
    )


def test_svgd_hyper_parallel_matches_sequential():
    """K SVGD trials differing in lr / prior_factor / bandwidth, one vmapped
    program == per-model sequential meta_fit (round-5: VERDICT next #4 —
    reference role: concurrent Ray trials, custom_tune/trial_runner.py:80)."""
    mt = _tasks()
    hypers = [(1e-3, 0.01, 2.0), (3e-3, 0.05, 0.5)]
    n_iter = 20

    seq = [_build_svgd(mt, *h) for h in hypers]
    for m in seq:
        m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    par = [_build_svgd(mt, *h) for h in hypers]
    fit_hyper_parallel(par, n_iter=n_iter)  # dispatches on learner type

    for m_s, m_p in zip(seq, par):
        assert m_p.fitted and m_p._step_count == n_iter
        np.testing.assert_allclose(
            np.asarray(m_p.particles), np.asarray(m_s.particles),
            rtol=2e-4, atol=5e-5)


def test_svgd_hyper_parallel_median_bandwidth():
    """All-None bandwidths ride the median-heuristic kernel under the same
    vmap; a mixed batch is rejected (tune_run then falls back sequential)."""
    mt = _tasks()
    n_iter = 10
    par = [_build_svgd(mt, 1e-3, 0.01, None),
           _build_svgd(mt, 2e-3, 0.02, None)]
    seq = _build_svgd(mt, 1e-3, 0.01, None)
    seq.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
    fit_svgd_hyper_parallel(par, n_iter=n_iter)
    np.testing.assert_allclose(
        np.asarray(par[0].particles), np.asarray(seq.particles),
        rtol=2e-4, atol=1e-5)

    with pytest.raises(AssertionError):
        fit_svgd_hyper_parallel(
            [_build_svgd(mt, 1e-3, 0.01, None),
             _build_svgd(mt, 1e-3, 0.01, 1.0)], n_iter=2)


def test_vi_hyper_parallel_matches_sequential():
    mt = _tasks()
    hypers = [(1e-3, 0.01), (3e-3, 0.05)]
    n_iter = 20

    seq = [_build_vi(mt, *h) for h in hypers]
    for m in seq:
        m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    par = [_build_vi(mt, *h) for h in hypers]
    fit_vi_hyper_parallel(par, n_iter=n_iter)

    for m_s, m_p in zip(seq, par):
        assert m_p.fitted and m_p._step_count == n_iter
        for got, want in zip(jax.tree.leaves(m_p.posterior),
                             jax.tree.leaves(m_s.posterior)):
            np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                       rtol=2e-4, atol=1e-5)


def test_fit_hyper_parallel_rejects_unsupported_learner():
    class Dummy:
        pass

    with pytest.raises(NotImplementedError):
        fit_hyper_parallel([Dummy()])


SPACE = {"x": Uniform(0.0, 1.0), "y": LogUniform(1e-3, 1.0)}


def _drive_manually(num_samples, batch_size, seed=3):
    """The reference suggestion stream: suggest K back-to-back, run, tell K
    (constructed exactly as tune_run constructs its suggester)."""
    sugg = TPESuggest(SPACE, metric="score", mode="max", seed=seed)
    seen = []
    while len(seen) < num_samples:
        k = min(batch_size, num_samples - len(seen))
        batch = [sugg.suggest() for _ in range(k)]
        for c in batch:
            sugg.tell(c, c["x"])  # same deterministic metric as the trial
        seen.extend(batch)
    return seen


def test_batched_tpe_stream_matches_manual_batch_driving(tmp_path):
    # 24 > the default n_startup=20, so the last batch exercises the TPE
    # (Parzen) path, not just random startup draws
    num, k = 24, 4
    analysis = tune_run(
        lambda cfg: {"score": cfg["x"]}, SPACE, num_samples=num,
        metric="score", mode="max", seed=3, local_dir=str(tmp_path),
        verbose=False, batch_size=k,
        batch_trial_fn=lambda cfgs: [{"score": c["x"]} for c in cfgs],
    )
    got = [t["config"] for t in analysis.trials]
    want = _drive_manually(num, k)
    assert got == want
    assert all(t["status"] == "DONE" for t in analysis.trials)


def test_batch_failure_falls_back_to_sequential(tmp_path):
    calls = {"batch": 0, "seq": 0}

    def bad_batch(cfgs):
        calls["batch"] += 1
        raise RuntimeError("device exploded")

    def trial(cfg):
        calls["seq"] += 1
        return {"score": cfg["x"]}

    analysis = tune_run(
        trial, SPACE, num_samples=4, metric="score", seed=0,
        local_dir=str(tmp_path), verbose=False, batch_size=2,
        batch_trial_fn=bad_batch,
    )
    assert calls["batch"] == 2 and calls["seq"] == 4
    assert len([t for t in analysis.trials if t["status"] == "DONE"]) == 4


def test_run_map_trial_batch_groups_and_orders():
    mt = _tasks()
    configs = [
        {"lr": 1e-3, "weight_decay": 0.1, "feature_dim": 2,
         "task_batch_size": -1},
        {"lr": 2e-3, "weight_decay": 0.2, "feature_dim": 4,
         "task_batch_size": -1},  # singleton group
        {"lr": 3e-3, "weight_decay": 0.3, "feature_dim": 2,
         "task_batch_size": -1},
    ]

    def build(c):
        return _build(mt, c["lr"], c["weight_decay"], n_iter=10,
                      feature_dim=int(c["feature_dim"]))

    def evaluate(m):
        return {"lr_seen": float(m.lr_params)}

    out = run_map_trial_batch(configs, build, evaluate, n_iter=10)
    assert [r["lr_seen"] for r in out] == [1e-3, 2e-3, 3e-3]
