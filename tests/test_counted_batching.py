"""Count-weighted sampled task batches for SVGD and VI (round-4 widening;
MAP's counted mode is covered in test_fused_map.py).

Two guarantees per learner:
 1. XLA counted estimator == XLA gather estimator on the SAME randint draws
    (models/random_gp.meta_log_prob counts=; association-only float
    differences, Adam-amplified over the run),
 2. the fused kernel's counted mode == the XLA counted step (same host-side
    fold_in/randint count pages, one random trajectory).

Reference semantics guarded: GPR_meta_svgd.py / GPR_meta_vi.py task
subsampling (rds.choice over tasks per iteration).
"""

import numpy as np
import jax
import pytest

from meta_learning_pacoh_tpu import (
    GPRegressionMetaLearnedSVGD,
    GPRegressionMetaLearnedVI,
)
from meta_learning_pacoh_tpu.datasets import SinusoidDataset

HIDDEN = (8, 8)


def _tasks(n_tasks=6, n_samples=5, seed=3):
    env = SinusoidDataset(random_state=np.random.RandomState(seed))
    return env.generate_meta_train_data(n_tasks=n_tasks, n_samples=n_samples)


def _svgd(mt, n_iter=20, batch=3):
    return GPRegressionMetaLearnedSVGD(
        mt, num_iter_fit=n_iter, random_seed=11, num_particles=3,
        task_batch_size=batch, mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
        feature_dim=1,
    )


def _vi(mt, n_iter=20, batch=3):
    return GPRegressionMetaLearnedVI(
        mt, num_iter_fit=n_iter, random_seed=11, svi_batch_size=3,
        task_batch_size=batch, mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
        feature_dim=1,
    )


def test_svgd_counted_matches_gather(monkeypatch):
    mt = _tasks()
    monkeypatch.setenv("PACOH_TPU_SVGD_WEIGHTED", "0")
    m_g = _svgd(mt)
    assert not m_g._weight_by_counts()
    m_g.meta_fit(verbose=False, log_period=20, n_iter=20)

    monkeypatch.setenv("PACOH_TPU_SVGD_WEIGHTED", "1")
    m_w = _svgd(mt)
    assert m_w._weight_by_counts()
    m_w.meta_fit(verbose=False, log_period=20, n_iter=20)

    np.testing.assert_allclose(np.asarray(m_w.particles),
                               np.asarray(m_g.particles), rtol=0, atol=2e-2)


def test_vi_counted_matches_gather(monkeypatch):
    mt = _tasks()
    monkeypatch.setenv("PACOH_TPU_VI_WEIGHTED", "0")
    m_g = _vi(mt)
    assert not m_g._weight_by_counts()
    m_g.meta_fit(verbose=False, log_period=20, n_iter=20)

    monkeypatch.setenv("PACOH_TPU_VI_WEIGHTED", "1")
    m_w = _vi(mt)
    assert m_w._weight_by_counts()
    m_w.meta_fit(verbose=False, log_period=20, n_iter=20)

    for k in ("loc", "log_scale"):
        np.testing.assert_allclose(np.asarray(m_w.posterior[k]),
                                   np.asarray(m_g.posterior[k]),
                                   rtol=0, atol=2e-2)


def test_svgd_fused_counted_matches_xla_trajectory(monkeypatch):
    mt = _tasks()
    monkeypatch.setenv("PACOH_TPU_SVGD_WEIGHTED", "1")
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    # big-N SVGD/VI fused dispatch is measured-off by default (svgd_bign_wins)
    monkeypatch.setenv("PACOH_TPU_FORCE_BIGN_FUSED", "1")
    m_f = _svgd(mt)
    assert m_f._fused_path_ok(), "counted configs must hit the fused window"
    m_f.meta_fit(verbose=False, log_period=20, n_iter=20)

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    m_x = _svgd(mt)
    assert not m_x._fused_path_ok()
    m_x.meta_fit(verbose=False, log_period=20, n_iter=20)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    np.testing.assert_allclose(np.asarray(m_f.particles),
                               np.asarray(m_x.particles), rtol=0, atol=2e-2)

    # chunking determinism through the counted fused path: 2x10 == 1x20
    m_c = _svgd(mt)
    m_c.meta_fit(verbose=False, log_period=10, n_iter=20)
    np.testing.assert_array_equal(np.asarray(m_c.particles),
                                  np.asarray(m_f.particles))


def test_vi_fused_counted_matches_xla_trajectory(monkeypatch):
    mt = _tasks()
    monkeypatch.setenv("PACOH_TPU_VI_WEIGHTED", "1")
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    # big-N SVGD/VI fused dispatch is measured-off by default (svgd_bign_wins)
    monkeypatch.setenv("PACOH_TPU_FORCE_BIGN_FUSED", "1")
    m_f = _vi(mt)
    assert m_f._fused_path_ok(), "counted configs must hit the fused window"
    m_f.meta_fit(verbose=False, log_period=20, n_iter=20)

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    m_x = _vi(mt)
    assert not m_x._fused_path_ok()
    m_x.meta_fit(verbose=False, log_period=20, n_iter=20)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    for k in ("loc", "log_scale"):
        np.testing.assert_allclose(np.asarray(m_f.posterior[k]),
                                   np.asarray(m_x.posterior[k]),
                                   rtol=0, atol=2e-2)


def test_counted_gate_requires_weighted_and_uniform(monkeypatch):
    """Gather mode keeps the XLA path; ragged task sizes keep the XLA path
    even under the weighted estimator (the kernel's pre-factor/mll_const
    are per-launch constants only for uniform sizes)."""
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    # big-N SVGD/VI fused dispatch is measured-off by default (svgd_bign_wins)
    monkeypatch.setenv("PACOH_TPU_FORCE_BIGN_FUSED", "1")
    monkeypatch.setenv("PACOH_TPU_SVGD_WEIGHTED", "0")
    assert not _svgd(_tasks())._fused_path_ok()
    monkeypatch.setenv("PACOH_TPU_SVGD_WEIGHTED", "1")
    assert _svgd(_tasks())._fused_path_ok()
    ragged = _tasks()
    ragged[2] = (ragged[2][0][:3], ragged[2][1][:3])
    assert not _svgd(ragged)._fused_path_ok()
    monkeypatch.setenv("PACOH_TPU_VI_WEIGHTED", "1")
    assert _vi(_tasks())._fused_path_ok()
    assert not _vi(ragged)._fused_path_ok()
