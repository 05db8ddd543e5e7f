"""Fused large-N PACOH-MAP training kernel (ops/pallas/fused_map_bign_kernel).

Validation chain (interpret mode on CPU), mirroring test_fused_map.py for
the blocked-linalg window 9 <= N <= 512:
 1. kernel loss == -sum_t gp_prior_mll_batch at the initial parameters
    (ragged masks included),
 2. hand-derived matrix-form backward == jax.grad of the learner loss,
 3. multi-step kernel trajectory == the learner's jitted XLA step,
 4. learner-level dispatch + chunking determinism + counted task batching,
 5. a multi-panel (Np=128) case exercising the panel solve/SYRK coupling.

Reference semantics guarded: GPR_meta_mll.py:104-117 at Swissfel-like
shapes (experiments/data_sim.py:380-497).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu import GPRegressionMetaLearned
from meta_learning_pacoh_tpu.models.gp_base import gp_prior_mll_batch
from meta_learning_pacoh_tpu.ops.pallas.fused_map_bign_kernel import (
    FusedMAPBigNTrainer,
    bign_fits,
    bign_shapes,
)

HIDDEN = (8, 8)
LR = 1e-3
WD = 0.2
FDIM = 2
N_PTS = 12  # > 8: outside the entry-tile window, Np pads to 64


def _make_tasks(n_tasks=3, n_samples=N_PTS, ragged=False, seed=26):
    env = SinusoidDataset(random_state=np.random.RandomState(seed))
    mt = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=n_samples)
    if ragged:  # drop trailing points from later tasks -> padded masks
        mt = [(x[: n_samples - 2 * i] if i else x,
               y[: n_samples - 2 * i] if i else y)
              for i, (x, y) in enumerate(mt)]
    return mt


def _build(mt=None, seed=30, n_iter=100, task_batch_size=-1):
    return GPRegressionMetaLearned(
        mt if mt is not None else _make_tasks(), num_iter_fit=n_iter,
        random_seed=seed, weight_decay=WD, lr_params=LR, feature_dim=FDIM,
        task_batch_size=task_batch_size,
        mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
    )


def _trainer(m, interpret=True):
    return FusedMAPBigNTrainer(
        m.params, m.X, m.Y, m.mask, feature_dim=FDIM, mean_hidden=HIDDEN,
        kernel_hidden=HIDDEN, lr=LR, weight_decay=WD,
        noise_floor=m.cfg.noise_floor, interpret=interpret)


@pytest.fixture(scope="module")
def ragged_model():
    return _build(_make_tasks(ragged=True))


def test_shapes_and_gate():
    from meta_learning_pacoh_tpu.ops.pallas.fused_map_bign_kernel import _NBF

    def np_(n):  # points pad to the mega-kernel's pinned panel size
        return max(_NBF, -(-n // _NBF) * _NBF)

    # tasks ride the pure batch dim: NO padding (T=5 padded to 8 wasted
    # 37% of every batched pass); points pad to the panel size
    assert bign_shapes(3, 12) == (3, np_(12))
    assert bign_shapes(5, 200) == (5, np_(200))
    assert bign_fits(5, 200)
    assert bign_fits(16, 512)
    assert not bign_fits(64, 512)  # VMEM gate


def test_kernel_loss_matches_mll(ragged_model):
    m = ragged_model
    tr = _trainer(m)
    tr.run(1, 0)
    want = -float(jnp.sum(gp_prior_mll_batch(
        m.cfg, m.params, jnp.asarray(m.X), jnp.asarray(m.Y),
        jnp.asarray(m.mask))))
    np.testing.assert_allclose(float(tr.last_loss), want, rtol=1e-5,
                               atol=1e-5)


def _drop_degenerate(tree):
    """kernel_nn b_out has an exactly-zero true gradient (pairwise feature
    distances are shift-invariant) — both paths random-walk float noise
    there; see test_fused_map.py."""
    out = jax.tree.map(lambda x: x, tree)
    out["kernel_nn"] = dict(out["kernel_nn"])
    del out["kernel_nn"]["b_out"]
    return out


def test_kernel_gradient_matches_jax_grad(ragged_model):
    """mu after one step is (1-b1)*g: the matrix-form hand-derived backward
    against jax.grad of the learner loss, ALL leaves."""
    m = ragged_model
    tr = _trainer(m)
    tr.run(1, 0)
    _, mu, _ = tr.sync()
    g_ref = jax.grad(lambda p: -jnp.sum(gp_prior_mll_batch(
        m.cfg, p, jnp.asarray(m.X), jnp.asarray(m.Y),
        jnp.asarray(m.mask))))(m.params)
    for got, want in zip(jax.tree.leaves(mu), jax.tree.leaves(g_ref)):
        scale = max(float(jnp.max(jnp.abs(np.asarray(want)))), 1e-3)
        np.testing.assert_allclose(np.asarray(got) / 0.1, np.asarray(want),
                                   rtol=0, atol=2e-5 * scale + 1e-6)


def test_bign_kernel_trajectory_matches_xla_step(ragged_model):
    m = ragged_model
    n_steps = 3

    params, opt_state, losses = m._step_fn(
        m.params, m.opt_state, m.X, m.Y, m.mask, m._train_key, 0, n_steps)

    tr = _trainer(m)
    tr.run(n_steps, 0)
    got_params, got_mu, got_nu = tr.sync()

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


def test_multi_panel_gradient_matches_jax_grad():
    """N=72 -> Np=128, two 64-panels: the off-diagonal panel solve, SYRK,
    and blocked W-assembly all engage inside the mega-kernel."""
    m = _build(_make_tasks(n_tasks=2, n_samples=72))
    tr = _trainer(m)
    tr.run(1, 0)
    _, mu, _ = tr.sync()
    g_ref = jax.grad(lambda p: -jnp.sum(gp_prior_mll_batch(
        m.cfg, p, jnp.asarray(m.X), jnp.asarray(m.Y),
        jnp.asarray(m.mask))))(m.params)
    for got, want in zip(jax.tree.leaves(mu), jax.tree.leaves(g_ref)):
        scale = max(float(jnp.max(jnp.abs(np.asarray(want)))), 1e-3)
        np.testing.assert_allclose(np.asarray(got) / 0.1, np.asarray(want),
                                   rtol=0, atol=2e-5 * scale + 1e-6)


def test_learner_fused_matches_xla_and_resumes(monkeypatch):
    n_iter = 20

    m_plain = _build(seed=31, n_iter=n_iter)
    m_plain.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_fused = _build(seed=31, n_iter=n_iter)
    assert m_fused._fused_path_ok(), "N=12 must hit the big-N fused window"
    m_fused.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    for got, want in zip(jax.tree.leaves(_drop_degenerate(m_fused.params)),
                         jax.tree.leaves(_drop_degenerate(m_plain.params))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-3)

    # chunking determinism: 2 x 10 == 1 x 20 through the fused path
    m_chunked = _build(seed=31, n_iter=n_iter)
    m_chunked.meta_fit(verbose=False, log_period=10, n_iter=n_iter)
    for got, want in zip(jax.tree.leaves(m_chunked.params),
                         jax.tree.leaves(m_fused.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # state_dict round-trip + continued fused training stays in sync
    import pickle

    state = pickle.loads(pickle.dumps(m_fused.state_dict()))
    m_resumed = _build(seed=31, n_iter=n_iter)
    m_resumed.load_state_dict(state)
    m_resumed.meta_fit(verbose=False, log_period=10, n_iter=10)
    m_fused.meta_fit(verbose=False, log_period=10, n_iter=10)
    for got, want in zip(jax.tree.leaves(m_resumed.params),
                         jax.tree.leaves(m_fused.params)):
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    # predict still works off the synced state
    x = np.linspace(-5, 5, 30)
    ctx_x = np.linspace(-4, 4, 8)
    ctx_y = np.sin(ctx_x) + 2
    mean, std = m_fused.predict(ctx_x, ctx_y, x)
    assert np.all(np.isfinite(mean)) and np.all(std > 0)


def test_disable_fused_flag_keeps_linalg_tiers(monkeypatch):
    """PACOH_TPU_DISABLE_FUSED turns off only the single-launch training
    kernels (bench.py's blocked-in-scan continuity line); pallas_enabled()
    — the scoped linalg tiers' gate — stays on."""
    from meta_learning_pacoh_tpu import config

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m = _build(seed=3, n_iter=5)
    assert m._fused_path_ok()
    monkeypatch.setenv("PACOH_TPU_DISABLE_FUSED", "1")
    assert config.pallas_enabled() and not config.fused_enabled()
    assert not m._fused_path_ok()
    m.meta_fit(verbose=False, log_period=5, n_iter=5)  # XLA-scan path runs
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(m.params)[0])))


def test_bign_fused_counted_matches_xla_trajectory(monkeypatch):
    """Sampled task batches through the big-N fused kernel == the XLA
    count-weighted step on the SAME fold_in/randint draws."""
    mt = _make_tasks(n_tasks=4)
    monkeypatch.setenv("PACOH_TPU_MAP_WEIGHTED", "1")
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_f = _build(mt, seed=7, n_iter=10, task_batch_size=2)
    assert m_f._fused_path_ok()
    assert m_f._weight_by_counts()
    m_f.meta_fit(verbose=False, log_period=10, n_iter=10)

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    m_x = _build(mt, seed=7, n_iter=10, task_batch_size=2)
    assert not m_x._fused_path_ok()
    m_x.meta_fit(verbose=False, log_period=10, n_iter=10)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    for got, want in zip(jax.tree.leaves(_drop_degenerate(m_f.params)),
                         jax.tree.leaves(_drop_degenerate(m_x.params))):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-2)
