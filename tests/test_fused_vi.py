"""Parity chain for the fused single-launch PACOH-VI training kernel.

kernel (ops/pallas/fused_vi_kernel.py, interpret mode)
  == closed-form spec (ops/fused_vi_math.py)
  == jax.grad + optax.adam of the live learner's neg-ELBO
and the fused learner path follows the XLA learner's exact random
trajectory (the reparameterization noise uses the same fold_in/split key
discipline). Reference semantics: meta_learn/GPR_meta_vi.py:216-226.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from meta_learning_pacoh_tpu.models.random_gp import (
    init_posterior,
    make_hyper_prior,
    meta_log_prob,
    posterior_entropy,
    random_gp_config,
)
from meta_learning_pacoh_tpu.ops.fused_vi_math import vi_step_closed_form


def _problem(T=4, N=5, D=1, hidden=(8, 8), seed=0):
    rs = np.random.RandomState(seed)
    X = jnp.asarray(rs.randn(T, N, D).astype(np.float32))
    Y = jnp.asarray(rs.randn(T, N).astype(np.float32))
    mask = np.ones((T, N), np.float32)
    mask[1, 3:] = 0.0
    mask = jnp.asarray(mask)
    cfg = random_gp_config(D, feature_dim=1, mean_module="NN",
                           covar_module="NN", mean_nn_layers=hidden,
                           kernel_nn_layers=hidden)
    hp = make_hyper_prior(cfg, weight_prior_std=0.4, bias_prior_std=3.0)
    return X, Y, mask, hp


def test_vi_spec_matches_jax_grad_step():
    """vi_step_closed_form == jax.value_and_grad(neg_elbo) + optax.adam."""
    S, pf, lr = 6, 0.01, 1e-3
    X, Y, mask, hp = _problem()
    post = init_posterior(jax.random.PRNGKey(1), hp.dim, cov_type="diag")
    eps = jax.random.normal(jax.random.PRNGKey(2), (S, hp.dim), jnp.float32)

    def neg_elbo(p):
        samples = p["loc"][None] + jnp.exp(p["log_scale"])[None] * eps
        lp = meta_log_prob(hp, pf, samples, X, Y, mask)
        return -(jnp.mean(lp) + pf * posterior_entropy(p))

    opt = optax.adam(lr)
    loss_ref, g_ref = jax.value_and_grad(neg_elbo)(post)
    upd, _ = opt.update(g_ref, opt.init(post), post)
    post_ref = optax.apply_updates(post, upd)

    zeros = jax.tree.map(jnp.zeros_like, post)
    post_s, _, _, loss_s = vi_step_closed_form(
        post, zeros, zeros, 0.0, eps, X, Y, mask, hp, prior_factor=pf,
        weight_prior_std=0.4, bias_prior_std=3.0, lr=lr)

    np.testing.assert_allclose(float(loss_s), float(loss_ref), rtol=1e-5)
    for k in ("loc", "log_scale"):
        np.testing.assert_allclose(np.asarray(post_s[k]),
                                   np.asarray(post_ref[k]),
                                   rtol=2e-4, atol=2e-6)


def test_vi_kernel_matches_spec_interpret():
    """3 kernel steps (interpret) == 3 sequential spec steps, same eps."""
    from meta_learning_pacoh_tpu.ops.pallas.fused_vi_kernel import (
        FusedVITrainer,
    )

    S, pf, lr = 6, 0.01, 1e-3
    hidden = (8, 8)
    X, Y, mask, hp = _problem(hidden=hidden)
    post = init_posterior(jax.random.PRNGKey(1), hp.dim, cov_type="diag")
    base_key = jax.random.PRNGKey(7)

    tr = FusedVITrainer(hp, post, X, Y, mask, hidden=hidden, lr=lr,
                        prior_factor=pf, weight_prior_std=0.4,
                        bias_prior_std=3.0, svi_batch_size=S,
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
            post_s, m, v, float(i), eps, X, Y, mask, hp, prior_factor=pf,
            weight_prior_std=0.4, bias_prior_std=3.0, lr=lr)
        losses.append(float(loss))

    tr.run(n_steps, 0)
    post_k, m_k, v_k = tr.sync()
    np.testing.assert_allclose(float(tr.last_loss), losses[-1], rtol=1e-4)
    np.testing.assert_allclose(float(tr.avg_loss), np.mean(losses),
                               rtol=1e-4)
    for k in ("loc", "log_scale"):
        np.testing.assert_allclose(np.asarray(post_k[k]),
                                   np.asarray(post_s[k]),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(m_k[k]), np.asarray(m[k]),
                                   rtol=1e-4, atol=1e-7)
        np.testing.assert_allclose(np.asarray(v_k[k]), np.asarray(v[k]),
                                   rtol=1e-4, atol=1e-9)


def _make_learners(monkeypatch, n_iter=30, **extra):
    from meta_learning_pacoh_tpu import GPRegressionMetaLearnedVI
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=4, n_samples=5)
    kw = dict(num_iter_fit=n_iter, svi_batch_size=4, random_seed=30,
              feature_dim=1, mean_nn_layers=(8,), kernel_nn_layers=(8,),
              task_batch_size=-1)
    kw.update(extra)
    return GPRegressionMetaLearnedVI(train, **kw), train, kw


def test_vi_fused_learner_matches_xla_trajectory(monkeypatch):
    """Fused meta_fit follows the XLA step's exact random trajectory."""
    from meta_learning_pacoh_tpu import GPRegressionMetaLearnedVI

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_f, train, kw = _make_learners(monkeypatch)
    assert m_f._fused_path_ok()
    loss_f = m_f.meta_fit(verbose=False, log_period=15)

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    monkeypatch.delenv("PACOH_TPU_FORCE_PALLAS", raising=False)
    m_x = GPRegressionMetaLearnedVI(train, **kw)
    assert not m_x._fused_path_ok()
    loss_x = m_x.meta_fit(verbose=False, log_period=15)

    np.testing.assert_allclose(loss_f, loss_x, rtol=1e-3)
    for k in ("loc", "log_scale"):
        err = float(jnp.max(jnp.abs(m_f.posterior[k] - m_x.posterior[k])))
        assert err < 2e-4, (k, err)


def test_vi_fused_resume_and_chunking_deterministic(monkeypatch):
    """2 x 10-step chunks == 1 x 20-step chunk, and a state_dict round-trip
    into a fresh learner resumes the fused path bit-compatibly."""
    from meta_learning_pacoh_tpu import GPRegressionMetaLearnedVI

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_a, train, kw = _make_learners(monkeypatch, n_iter=20)
    m_a.meta_fit(verbose=False, log_period=10)   # 2 chunks

    m_b = GPRegressionMetaLearnedVI(train, **kw)
    m_b.meta_fit(verbose=False, log_period=20)   # 1 chunk
    for k in ("loc", "log_scale"):
        np.testing.assert_allclose(np.asarray(m_a.posterior[k]),
                                   np.asarray(m_b.posterior[k]),
                                   rtol=1e-5, atol=1e-7)

    # resume: 10 steps, checkpoint, restore into a fresh learner, 10 more
    m_c = GPRegressionMetaLearnedVI(train, **kw)
    m_c.meta_fit(verbose=False, log_period=10, n_iter=10)
    state = m_c.state_dict()
    m_d = GPRegressionMetaLearnedVI(train, **kw)
    m_d.load_state_dict(state)
    m_d.meta_fit(verbose=False, log_period=10, n_iter=10)
    for k in ("loc", "log_scale"):
        np.testing.assert_allclose(np.asarray(m_d.posterior[k]),
                                   np.asarray(m_b.posterior[k]),
                                   rtol=1e-5, atol=1e-6)


def test_vi_fused_gate_rejects_out_of_window_configs(monkeypatch):
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m, train, kw = _make_learners(monkeypatch)
    assert m._fused_path_ok()
    # lr_decay no longer disqualifies: staircase launches handle it
    # (tests/test_fused_lr_decay.py)
    for bad in (dict(cov_type="full"), dict(feature_dim=2),
                dict(covar_module="SE"),
                dict(task_batch_size=2)):
        from meta_learning_pacoh_tpu import GPRegressionMetaLearnedVI

        kw_bad = dict(kw)
        kw_bad.update(bad)
        m_bad = GPRegressionMetaLearnedVI(train, **kw_bad)
        assert not m_bad._fused_path_ok(), bad
