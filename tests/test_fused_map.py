"""Fused PACOH-MAP training kernel (ops/pallas/fused_map_kernel).

Validation chain (interpret mode on CPU):
 1. pack/unpack round-trip of the GPConfig NN/NN parameter pytree,
 2. the kernel's reported loss against -sum_t gp_prior_mll_batch at the
    initial parameters,
 3. a multi-step kernel trajectory against the learner's own jitted XLA
    step (same AdamW semantics, same jitter escalation),
 4. learner-level dispatch: fused meta_fit == XLA meta_fit, chunking
    determinism, and state_dict resume through the fused path.

Reference semantics guarded: GPR_meta_mll.py:104-117 (summed per-task exact
MLL over the task batch) + :255 (AdamW weight decay as meta-regularizer).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu import GPRegressionMetaLearned
from meta_learning_pacoh_tpu.models.gp_base import gp_prior_mll_batch
from meta_learning_pacoh_tpu.ops.pallas.fused_map_kernel import (
    FusedMAPTrainer,
    pack_state,
    unpack_state,
)

HIDDEN = (8, 8)
LR = 1e-3
WD = 0.2
FDIM = 2


def _build(seed=30, n_tasks=4):
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    mt = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=5)
    return GPRegressionMetaLearned(
        mt, num_iter_fit=100, random_seed=seed, weight_decay=WD,
        lr_params=LR, feature_dim=FDIM, task_batch_size=-1,
        mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
    )


@pytest.fixture(scope="module")
def small_model():
    return _build()


def _trainer(m, interpret=True):
    return FusedMAPTrainer(
        m.params, m.X, m.Y, m.mask, feature_dim=FDIM, mean_hidden=HIDDEN,
        kernel_hidden=HIDDEN, lr=LR, weight_decay=WD,
        noise_floor=m.cfg.noise_floor, interpret=interpret)


def test_pack_unpack_roundtrip(small_model):
    m = small_model
    packed = pack_state(m.params, HIDDEN, HIDDEN)
    rt = unpack_state(packed, HIDDEN, HIDDEN)
    for got, want in zip(jax.tree.leaves(rt), jax.tree.leaves(m.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_kernel_loss_matches_mll(small_model):
    m = small_model
    tr = _trainer(m)
    tr.run(1, 0)
    want = -float(jnp.sum(gp_prior_mll_batch(
        m.cfg, m.params, jnp.asarray(m.X), jnp.asarray(m.Y),
        jnp.asarray(m.mask))))
    np.testing.assert_allclose(float(tr.last_loss), want, rtol=1e-5,
                               atol=1e-5)


def _drop_degenerate(tree):
    """Remove kernel_nn b_out: pairwise feature distances are invariant to a
    constant feature shift, so its TRUE gradient is exactly 0 — both the
    kernel and the XLA path compute ~1e-8 float noise there, Adam normalizes
    that noise to +-1 updates, and the two trajectories random-walk apart.
    (test_kernel_gradient_matches_jax_grad pins the gradient itself, noise
    floor included; weight decay is what actually moves this coordinate.)"""
    out = jax.tree.map(lambda x: x, tree)
    out["kernel_nn"] = dict(out["kernel_nn"])
    del out["kernel_nn"]["b_out"]
    return out


def test_kernel_gradient_matches_jax_grad(small_model):
    """mu after one step is (1-b1)*g: compare the kernel's hand-derived
    backward directly against jax.grad of the learner loss, ALL leaves."""
    m = small_model
    tr = _trainer(m)
    tr.run(1, 0)
    _, mu, _ = tr.sync()
    g_ref = jax.grad(lambda p: -jnp.sum(gp_prior_mll_batch(
        m.cfg, p, jnp.asarray(m.X), jnp.asarray(m.Y),
        jnp.asarray(m.mask))))(m.params)
    for got, want in zip(jax.tree.leaves(mu), jax.tree.leaves(g_ref)):
        scale = max(float(jnp.max(jnp.abs(np.asarray(want)))), 1e-3)
        np.testing.assert_allclose(np.asarray(got) / 0.1, np.asarray(want),
                                   rtol=0, atol=1e-5 * scale + 1e-6)


def test_kernel_trajectory_matches_xla_step(small_model):
    m = small_model
    n_steps = 3

    params, opt_state, losses = m._step_fn(
        m.params, m.opt_state, m.X, m.Y, m.mask, m._train_key, 0, n_steps)

    tr = _trainer(m)
    tr.run(n_steps, 0)
    got_params, got_mu, got_nu = tr.sync()

    # early Adam steps act like sign(g): f32 noise at a sign boundary moves
    # a coordinate by O(lr), so the tolerance is a few lr-quanta
    for got, want in zip(jax.tree.leaves(_drop_degenerate(got_params)),
                         jax.tree.leaves(_drop_degenerate(params))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=3e-4)

    adam = opt_state.inner_states["train"].inner_state[0]
    for got, want in zip(jax.tree.leaves(_drop_degenerate(got_mu)),
                         jax.tree.leaves(_drop_degenerate(adam.mu))):
        scale = max(float(jnp.max(jnp.abs(np.asarray(want)))), 1e-3)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=5e-4 * scale + 1e-4)


def test_learner_fused_matches_xla_and_resumes(monkeypatch):
    n_iter = 30

    m_plain = _build()
    m_plain.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_fused = _build()
    assert m_fused._fused_path_ok()
    m_fused.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    for got, want in zip(jax.tree.leaves(_drop_degenerate(m_fused.params)),
                         jax.tree.leaves(_drop_degenerate(m_plain.params))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-3)

    # chunking determinism: 2 x 15 == 1 x 30 through the fused path
    m_chunked = _build()
    m_chunked.meta_fit(verbose=False, log_period=15, n_iter=n_iter)
    for got, want in zip(jax.tree.leaves(m_chunked.params),
                         jax.tree.leaves(m_fused.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # state_dict round-trip + continued fused training stays in sync
    import pickle

    state = pickle.loads(pickle.dumps(m_fused.state_dict()))
    m_resumed = _build()
    m_resumed.load_state_dict(state)
    m_resumed.meta_fit(verbose=False, log_period=20, n_iter=20)
    m_fused.meta_fit(verbose=False, log_period=20, n_iter=20)
    for got, want in zip(jax.tree.leaves(m_resumed.params),
                         jax.tree.leaves(m_fused.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # predict still works off the synced state
    x = np.linspace(-5, 5, 30)
    ctx_x = np.linspace(-4, 4, 5)
    ctx_y = np.sin(ctx_x) + 2
    mean, std = m_fused.predict(ctx_x, ctx_y, x)
    assert np.all(np.isfinite(mean)) and np.all(std > 0)


def test_weighted_count_task_batching_matches_gather(monkeypatch):
    """The TPU no-gather step (weight the full-batch MLL vector by sampled
    task multiplicities) computes the same estimator as the gather step:
    same randint draws, association-only float differences."""

    def build(s=7):
        env = SinusoidDataset(random_state=np.random.RandomState(3))
        mt = env.generate_meta_train_data(n_tasks=6, n_samples=5)
        return GPRegressionMetaLearned(
            mt, num_iter_fit=20, random_seed=s, weight_decay=0.1,
            task_batch_size=3, mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
        )

    monkeypatch.setenv("PACOH_TPU_MAP_WEIGHTED", "0")
    m_gather = build()
    assert not m_gather._weight_by_counts()
    m_gather.meta_fit(verbose=False, log_period=20, n_iter=20)

    monkeypatch.setenv("PACOH_TPU_MAP_WEIGHTED", "1")
    m_weighted = build()
    assert m_weighted._weight_by_counts()
    m_weighted.meta_fit(verbose=False, log_period=20, n_iter=20)

    for got, want in zip(jax.tree.leaves(_drop_degenerate(m_weighted.params)),
                         jax.tree.leaves(_drop_degenerate(m_gather.params))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=3e-4)


def _build_counted(seed=7, n_iter=20):
    env = SinusoidDataset(random_state=np.random.RandomState(3))
    mt = env.generate_meta_train_data(n_tasks=6, n_samples=5)
    return GPRegressionMetaLearned(
        mt, num_iter_fit=n_iter, random_seed=seed, weight_decay=WD,
        lr_params=LR, feature_dim=FDIM, task_batch_size=3,
        mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
    )


def test_fused_counted_batching_matches_xla_trajectory(monkeypatch):
    """Sampled task batches through the fused kernel == the XLA
    count-weighted step on the SAME fold_in/randint draws. Step-1 loss is
    exact (1e-7); the trajectory drifts only at Adam-amplified f32 scale."""
    monkeypatch.setenv("PACOH_TPU_MAP_WEIGHTED", "1")
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_f = _build_counted()
    assert m_f._fused_path_ok(), "counted configs must hit the fused window"
    assert m_f._weight_by_counts()
    m_f.meta_fit(verbose=False, log_period=20, n_iter=20)

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    m_x = _build_counted()
    assert not m_x._fused_path_ok()
    m_x.meta_fit(verbose=False, log_period=20, n_iter=20)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    for got, want in zip(jax.tree.leaves(_drop_degenerate(m_f.params)),
                         jax.tree.leaves(_drop_degenerate(m_x.params))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-2)

    # chunking determinism through the counted fused path: 2x10 == 1x20
    m_c = _build_counted()
    m_c.meta_fit(verbose=False, log_period=10, n_iter=20)
    for got, want in zip(jax.tree.leaves(m_c.params),
                         jax.tree.leaves(m_f.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fused_counted_gate(monkeypatch):
    """Gather-mode (PACOH_TPU_MAP_WEIGHTED=0) keeps the XLA path; the
    counted window requires the weighted estimator."""
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    monkeypatch.setenv("PACOH_TPU_MAP_WEIGHTED", "0")
    m = _build_counted()
    assert not m._fused_path_ok()
    monkeypatch.setenv("PACOH_TPU_MAP_WEIGHTED", "1")
    m2 = _build_counted()
    assert m2._fused_path_ok()
