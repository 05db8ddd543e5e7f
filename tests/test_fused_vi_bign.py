"""Fused large-N PACOH-VI training kernel (ops/pallas/fused_vi_bign_kernel).

Validation chain (interpret mode on CPU), mirroring test_fused_vi.py for
the blocked-linalg window 9 <= N <= 256:
 1. multi-step kernel trajectory == the closed-form spec
    (ops/fused_vi_math.vi_step_closed_form — itself pinned against
    jax.grad + optax.adam of the live neg-ELBO in test_fused_vi.py),
    ragged masks + Adam moments + loss outputs included,
 2. learner-level dispatch + trajectory + chunking determinism against the
    XLA scan step (same fold_in/split noise discipline -> same random
    trajectory),
 3. counted task batching == the XLA count-weighted step on the same draws,
 4. the VMEM/shape gate.

Reference semantics guarded: meta_learn/GPR_meta_vi.py:216-226 at
Swissfel-like shapes (experiments/data_sim.py:380-497).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu import GPRegressionMetaLearnedVI
from meta_learning_pacoh_tpu.models.random_gp import (
    init_posterior,
    make_hyper_prior,
    random_gp_config,
)
from meta_learning_pacoh_tpu.ops.fused_vi_math import vi_step_closed_form
from meta_learning_pacoh_tpu.ops.pallas.fused_vi_bign_kernel import (
    FusedVIBigNTrainer,
    vi_bign_fits,
)

HIDDEN = (8, 8)
WPS, BPS = 0.4, 3.0
LR = 1e-3
PF = 0.01
N_PTS = 12  # > 8: outside the entry-tile window, Np pads to 64


def _problem(T=3, N=N_PTS, D=1, hidden=HIDDEN, seed=0, ragged=True):
    rs = np.random.RandomState(seed)
    X = jnp.asarray(rs.randn(T, N, D).astype(np.float32))
    Y = jnp.asarray(rs.randn(T, N).astype(np.float32))
    mask = np.ones((T, N), np.float32)
    if ragged:
        mask[1, 9:] = 0.0
    mask = jnp.asarray(mask)
    cfg = random_gp_config(D, feature_dim=1, mean_module="NN",
                           covar_module="NN", mean_nn_layers=hidden,
                           kernel_nn_layers=hidden)
    hp = make_hyper_prior(cfg, weight_prior_std=WPS, bias_prior_std=BPS)
    return X, Y, mask, hp


def test_gate():
    assert vi_bign_fits(10, 5, 200)
    assert not vi_bign_fits(10, 5, 300)   # Np > 256
    assert not vi_bign_fits(10, 5, 5)     # entry-tile window owns N <= 8


@pytest.mark.parametrize("ragged", [False, True])
def test_bign_vi_kernel_matches_spec_interpret(ragged):
    """3 kernel steps (interpret) == 3 sequential spec steps, same eps.
    The spec is pinned against jax.grad of the live neg-ELBO in
    test_fused_vi.py — this transitively anchors the blocked-linalg score
    + wql sections to the learner objective at N=12 (Np=64)."""
    S = 6
    X, Y, mask, hp = _problem(ragged=ragged)
    post = init_posterior(jax.random.PRNGKey(1), hp.dim, cov_type="diag")
    base_key = jax.random.PRNGKey(7)

    tr = FusedVIBigNTrainer(hp, post, X, Y, mask, hidden=HIDDEN, lr=LR,
                            prior_factor=PF, weight_prior_std=WPS,
                            bias_prior_std=BPS, svi_batch_size=S,
                            base_key=base_key, interpret=True)

    n_steps = 3
    post_s = dict(post)
    m = jax.tree.map(jnp.zeros_like, post)
    v = jax.tree.map(jnp.zeros_like, post)
    losses = []
    for i in range(n_steps):
        key = jax.random.fold_in(base_key, i)
        _, k_s = jax.random.split(key)
        eps = jax.random.normal(k_s, (S, hp.dim), jnp.float32)
        post_s, m, v, loss = vi_step_closed_form(
            post_s, m, v, float(i), eps, X, Y, mask, hp, prior_factor=PF,
            weight_prior_std=WPS, bias_prior_std=BPS, lr=LR)
        losses.append(float(loss))

    tr.run(n_steps, 0)
    post_k, m_k, v_k = tr.sync()
    np.testing.assert_allclose(float(tr.last_loss), losses[-1], rtol=1e-4)
    np.testing.assert_allclose(float(tr.avg_loss), np.mean(losses),
                               rtol=1e-4)
    for k in ("loc", "log_scale"):
        np.testing.assert_allclose(np.asarray(post_k[k]),
                                   np.asarray(post_s[k]),
                                   rtol=0, atol=3e-4)
        np.testing.assert_allclose(np.asarray(m_k[k]), np.asarray(m[k]),
                                   rtol=0, atol=5e-4)


def _build(mt=None, seed=30, n_iter=4, task_batch_size=-1, n_tasks=3):
    if mt is None:
        env = SinusoidDataset(random_state=np.random.RandomState(26))
        mt = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=N_PTS)
    return GPRegressionMetaLearnedVI(
        mt, num_iter_fit=n_iter, svi_batch_size=4, random_seed=seed,
        feature_dim=1, mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
        prior_factor=PF, lr=LR, task_batch_size=task_batch_size)


def _loc(m):
    return np.asarray(m.posterior["loc"])


def test_learner_fused_matches_xla_and_chunking(monkeypatch):
    n_iter = 4

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    m_plain = _build(seed=31, n_iter=n_iter)
    assert not m_plain._fused_path_ok()
    m_plain.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    # big-N SVGD/VI fused dispatch is measured-off by default (svgd_bign_wins)
    monkeypatch.setenv("PACOH_TPU_FORCE_BIGN_FUSED", "1")
    m_fused = _build(seed=31, n_iter=n_iter)
    assert m_fused._fused_path_ok(), "N=12 must hit the big-N fused window"
    m_fused.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    # the XLA learner path at N=12 runs the blocked Pallas MLL tier (its
    # own f32 rounding), so sign-boundary coordinates may drift O(lr);
    # the kernel itself is pinned to the closed-form spec at 3e-4 above
    np.testing.assert_allclose(_loc(m_fused), _loc(m_plain),
                               rtol=0, atol=8e-3)

    # chunking determinism: 2 x 2 == 1 x 4 through the fused path
    m_chunked = _build(seed=31, n_iter=n_iter)
    m_chunked.meta_fit(verbose=False, log_period=2, n_iter=n_iter)
    np.testing.assert_array_equal(_loc(m_chunked), _loc(m_fused))

    # predict still works off the synced state
    x = np.linspace(-5, 5, 30)
    ctx_x = np.linspace(-4, 4, 8)
    ctx_y = np.sin(ctx_x) + 2
    mean, std = m_fused.predict(ctx_x, ctx_y, x)
    assert np.all(np.isfinite(mean)) and np.all(std > 0)


@pytest.mark.slow
def test_bign_vi_counted_matches_xla_trajectory(monkeypatch):
    """Sampled task batches through the big-N fused VI kernel == the XLA
    count-weighted step on the SAME fold_in/randint draws."""
    monkeypatch.setenv("PACOH_TPU_VI_WEIGHTED", "1")
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    # big-N SVGD/VI fused dispatch is measured-off by default (svgd_bign_wins)
    monkeypatch.setenv("PACOH_TPU_FORCE_BIGN_FUSED", "1")
    m_f = _build(seed=7, n_iter=6, task_batch_size=2, n_tasks=4)
    assert m_f._fused_path_ok()
    assert m_f._weight_by_counts()
    m_f.meta_fit(verbose=False, log_period=6, n_iter=6)

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    m_x = _build(seed=7, n_iter=6, task_batch_size=2, n_tasks=4)
    assert not m_x._fused_path_ok()
    m_x.meta_fit(verbose=False, log_period=6, n_iter=6)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    np.testing.assert_allclose(_loc(m_f), _loc(m_x), rtol=0, atol=1.5e-2)
