"""Fused-MLAP parity chain: closed-form math spec == jax.grad of the live
learner's loss == (later stages) the Pallas mega-kernel and the learner's
fused dispatch. Mirrors tests/test_fused_vi.py's structure."""

import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC
from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu.models.random_gp import (
    posterior_kl_to_prior,
    posterior_rsample,
)
from meta_learning_pacoh_tpu.ops.fused_mlap_math import mlap_loss_and_grads


def _make_learner(n_tasks=6, n_samples=5, svi=3, seed=1, **kw):
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=n_samples)
    return GPRegressionMetaLearnedPAC(
        train, num_iter_fit=200, random_seed=seed, covar_module="NN",
        mean_module="NN", svi_batch_size=svi, meta_kl_weight=1e-3,
        task_kl_weight=0.5, **kw)


def _learner_loss(m, params, eps, counts):
    """The learner's loss_fn with the sampling replaced by explicit
    (eps, counts) so the spec and autodiff see identical randomness."""
    X, Y, M = jnp.asarray(m.X), jnp.asarray(m.Y), jnp.asarray(m.mask)
    T = m.n_tasks
    svi = m.svi_batch_size

    def loss_fn(params):
        post = params["hyper_post"]
        theta = post["loc"][None, :] + jnp.exp(
            post["log_scale"])[None, :] * eps
        kl_outer = m.meta_kl_weight * posterior_kl_to_prior(
            post, m.hyper_prior)
        noise_var = m._noise_var(params["raw_noise"])

        def per_task(i):
            return m._task_bound(
                params["q_means"][i], params["q_trils"][i], X[i], Y[i],
                theta, noise_var, kl_outer, float(T), mask=M[i])

        bounds, avg_lls, kl_inners = jax.vmap(per_task)(jnp.arange(T))
        u = counts / jnp.sum(counts)
        meta_complexity = jnp.sqrt(
            (kl_outer + math.log(2.0) + math.log(float(T))
             - math.log(m.delta)) / (2.0 * (T - 1.0)))
        return jnp.sum(u * bounds) + meta_complexity

    return loss_fn


class TestMLAPSpecVsAutodiff:
    @pytest.mark.parametrize("ragged", [False, True])
    def test_loss_and_grads_match(self, ragged):
        if ragged:
            env = SinusoidDataset(random_state=np.random.RandomState(7))
            train = [env.generate_meta_train_data(1, n)[0]
                     for n in (5, 3, 5, 4, 5, 2)]
            m = GPRegressionMetaLearnedPAC(
                train, num_iter_fit=200, random_seed=1, covar_module="NN",
                mean_module="NN", svi_batch_size=3, meta_kl_weight=1e-3,
                task_kl_weight=0.5)
        else:
            m = _make_learner()

        rs = np.random.RandomState(0)
        eps = jnp.asarray(
            rs.randn(m.svi_batch_size, m.hyper_prior.dim).astype(np.float32))
        counts = jnp.asarray(
            np.bincount(rs.randint(0, m.n_tasks, m.n_tasks),
                        minlength=m.n_tasks).astype(np.float32))

        params = m.params
        loss_fn = _learner_loss(m, params, eps, counts)
        loss_ad, grads_ad = jax.value_and_grad(loss_fn)(params)

        loss_cf, grads_cf, diag = mlap_loss_and_grads(
            params, eps, counts, jnp.asarray(m.X), jnp.asarray(m.Y),
            jnp.asarray(m.mask), m.hyper_prior,
            task_kl_weight=m.task_kl_weight,
            meta_kl_weight=m.meta_kl_weight, delta=m.delta)

        np.testing.assert_allclose(float(loss_cf), float(loss_ad), rtol=2e-5)
        flat_ad, _ = jax.flatten_util.ravel_pytree(grads_ad)
        flat_cf, _ = jax.flatten_util.ravel_pytree(grads_cf)
        scale = float(jnp.max(jnp.abs(flat_ad))) + 1e-12
        # atol band: the no-noise inner gram (kappa ~1e6) amplifies f32
        # rounding by ~kappa*eps ~ 0.1 on KL-side entries; 2e-4 of the max
        # grad keeps ~100x headroom below any real math error while
        # tolerating the amplification (observed worst case ~6e-5 of scale)
        np.testing.assert_allclose(
            np.asarray(flat_cf), np.asarray(flat_ad),
            rtol=5e-4, atol=2e-4 * scale)

    def test_grads_after_training_steps(self):
        """Spec parity must hold away from init too (q_trils asymmetric,
        noise moved)."""
        m = _make_learner(seed=3)
        m.meta_fit(log_period=100, n_iter=100, verbose=False)

        rs = np.random.RandomState(5)
        eps = jnp.asarray(
            rs.randn(m.svi_batch_size, m.hyper_prior.dim).astype(np.float32))
        counts = jnp.asarray(
            np.bincount(rs.randint(0, m.n_tasks, m.n_tasks),
                        minlength=m.n_tasks).astype(np.float32))

        params = m.params
        loss_fn = _learner_loss(m, params, eps, counts)
        loss_ad, grads_ad = jax.value_and_grad(loss_fn)(params)
        loss_cf, grads_cf, _ = mlap_loss_and_grads(
            params, eps, counts, jnp.asarray(m.X), jnp.asarray(m.Y),
            jnp.asarray(m.mask), m.hyper_prior,
            task_kl_weight=m.task_kl_weight,
            meta_kl_weight=m.meta_kl_weight, delta=m.delta)

        np.testing.assert_allclose(float(loss_cf), float(loss_ad), rtol=2e-5)
        flat_ad, _ = jax.flatten_util.ravel_pytree(grads_ad)
        flat_cf, _ = jax.flatten_util.ravel_pytree(grads_cf)
        scale = float(jnp.max(jnp.abs(flat_ad))) + 1e-12
        np.testing.assert_allclose(
            np.asarray(flat_cf), np.asarray(flat_ad),
            rtol=5e-4, atol=2e-4 * scale)


# ---------------------------------------------------------------- kernel


def _spec_optax_steps(m, n_steps, start_step=0):
    """Sequential closed-form spec steps through the learner's EXACT optax
    multi_transform optimizer, following the XLA step's key discipline."""
    import optax

    X, Y, M = jnp.asarray(m.X), jnp.asarray(m.Y), jnp.asarray(m.mask)
    params, opt_state = m.params, m.opt_state
    losses, diags = [], []
    for i in range(start_step, start_step + n_steps):
        key = jax.random.fold_in(m._train_key, i)
        k_task, k_theta = jax.random.split(key)
        idx = jax.random.randint(k_task, (m.task_batch_size,), 0, m.n_tasks)
        counts = jnp.sum(jax.nn.one_hot(idx, m.n_tasks, dtype=jnp.float32),
                         axis=0)
        eps = jax.random.normal(k_theta, (m.svi_batch_size, m.hyper_prior.dim),
                                jnp.float32)
        loss, grads, diag = mlap_loss_and_grads(
            params, eps, counts, X, Y, M, m.hyper_prior,
            task_kl_weight=m.task_kl_weight,
            meta_kl_weight=m.meta_kl_weight, delta=m.delta)
        upd, opt_state = m._opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        losses.append(float(loss))
        diags.append({k: float(v) for k, v in diag.items()})
    return params, opt_state, losses, diags


def test_mlap_kernel_matches_spec_interpret():
    """3 kernel steps (interpret) == 3 sequential spec+optax steps, same
    randomness. The inner-KL gram has no likelihood noise (condition number
    ~1e6 at init), so KL-side gradients inherit amplified f32 rounding —
    tolerances are scale-relative with that amplification in mind; the
    unamplified outputs (avg_ll, outer KL, noise grad) are tight."""
    from meta_learning_pacoh_tpu.ops.pallas.fused_mlap_kernel import (
        FusedMLAPTrainer,
    )

    m = _make_learner(posterior_lr_multiplier=2.0)
    tr = FusedMLAPTrainer(
        m.hyper_prior, m.params, jnp.asarray(m.X), jnp.asarray(m.Y),
        jnp.asarray(m.mask), hidden=(32, 32), lr=m.lr,
        posterior_lr_multiplier=2.0, task_batch_size=m.task_batch_size,
        svi_batch_size=m.svi_batch_size, task_kl_weight=m.task_kl_weight,
        meta_kl_weight=m.meta_kl_weight, delta=m.delta,
        weight_prior_std=0.5, bias_prior_std=3.0, base_key=m._train_key,
        interpret=True)

    params_s, opt_s, losses, diags = _spec_optax_steps(m, 3)
    tr.run(3, 0)
    pk, mk, vk = tr.sync()

    np.testing.assert_allclose(float(tr.last_loss), losses[-1], rtol=2e-3)
    np.testing.assert_allclose(float(tr.avg_loss), np.mean(losses),
                               rtol=2e-3)
    np.testing.assert_allclose(float(tr.last_diag["avg_ll"]),
                               diags[-1]["avg_ll"], rtol=1e-4)
    np.testing.assert_allclose(float(tr.last_diag["kl_outer_weighted"]),
                               diags[-1]["kl_outer_weighted"], rtol=1e-4)

    flat_k, _ = jax.flatten_util.ravel_pytree(pk)
    flat_s, _ = jax.flatten_util.ravel_pytree(params_s)
    scale = float(jnp.max(jnp.abs(flat_s))) + 1e-12
    np.testing.assert_allclose(np.asarray(flat_k), np.asarray(flat_s),
                               rtol=2e-2, atol=1e-2 * scale)

    main = opt_s.inner_states["main"].inner_state[0]
    post = opt_s.inner_states["posterior"].inner_state[0]
    for kern, spec in [
        (mk["hyper_post"]["loc"], main.mu["hyper_post"]["loc"]),
        (mk["raw_noise"], main.mu["raw_noise"]),
        (mk["q_means"], post.mu["q_means"]),
        (mk["q_trils"], post.mu["q_trils"]),
        (vk["q_trils"], post.nu["q_trils"]),
    ]:
        s = float(jnp.max(jnp.abs(jnp.asarray(spec)))) + 1e-12
        np.testing.assert_allclose(np.asarray(jnp.asarray(kern)),
                                   np.asarray(jnp.asarray(spec)),
                                   rtol=5e-2, atol=3e-2 * s)


def _make_fused_learner(n_iter=100, seed=1, **extra):
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=4, n_samples=5)
    kw = dict(num_iter_fit=n_iter, random_seed=seed, covar_module="NN",
              mean_module="NN", svi_batch_size=3, meta_kl_weight=1e-3,
              task_kl_weight=0.5, mean_nn_layers=(8, 8),
              kernel_nn_layers=(8, 8))
    kw.update(extra)
    return GPRegressionMetaLearnedPAC(train, **kw), train, kw


def test_mlap_fused_learner_close_to_xla_within_chaos_bound(monkeypatch):
    """Fused meta_fit tracks the XLA trajectory as closely as f32 chaos
    permits: the no-noise inner-KL gram (condition ~1e6) amplifies ANY
    rounding difference, so the yardstick is an XLA run whose init is
    perturbed by 1e-7 — the fused-vs-XLA gap must be within a small factor
    of that intrinsic chaos gap."""
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_f, train, kw = _make_fused_learner()
    assert m_f._fused_path_ok()
    loss_f, diag_f = m_f.meta_fit(verbose=False, log_period=50)

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    monkeypatch.delenv("PACOH_TPU_FORCE_PALLAS", raising=False)
    m_x = GPRegressionMetaLearnedPAC(train, **kw)
    assert not m_x._fused_path_ok()
    loss_x, diag_x = m_x.meta_fit(verbose=False, log_period=50)

    m_p = GPRegressionMetaLearnedPAC(train, **kw)
    m_p.params["hyper_post"]["loc"] = (
        m_p.params["hyper_post"]["loc"] * (1.0 + 1e-7))
    m_p.meta_fit(verbose=False, log_period=50)

    np.testing.assert_allclose(loss_f, loss_x, rtol=1e-2)
    np.testing.assert_allclose(diag_f["avg_ll"], diag_x["avg_ll"], rtol=2e-2)

    flat_f, _ = jax.flatten_util.ravel_pytree(m_f.params)
    flat_x, _ = jax.flatten_util.ravel_pytree(m_x.params)
    flat_p, _ = jax.flatten_util.ravel_pytree(m_p.params)
    gap_fused = float(jnp.max(jnp.abs(flat_f - flat_x)))
    gap_chaos = float(jnp.max(jnp.abs(flat_p - flat_x)))
    # factor calibrated loose: both gaps are chaos-scale random variables
    # (observed ratios 2-4.2x across init points); a math bug diverges at
    # param scale, orders of magnitude above this band
    assert gap_fused <= 6.0 * gap_chaos + 1e-4, (gap_fused, gap_chaos)


def test_mlap_fused_resume_and_chunking_deterministic(monkeypatch):
    """2 x 10-step chunks == 1 x 20-step chunk, and a state_dict round-trip
    into a fresh learner resumes the fused path bit-compatibly (Adam
    moments of BOTH multi_transform groups carried)."""
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m_a, train, kw = _make_fused_learner(n_iter=20)
    assert m_a._fused_path_ok()
    m_a.meta_fit(verbose=False, log_period=10)   # 2 chunks

    m_b = GPRegressionMetaLearnedPAC(train, **kw)
    m_b.meta_fit(verbose=False, log_period=20)   # 1 chunk
    flat_a, _ = jax.flatten_util.ravel_pytree(m_a.params)
    flat_b, _ = jax.flatten_util.ravel_pytree(m_b.params)
    np.testing.assert_allclose(np.asarray(flat_a), np.asarray(flat_b),
                               rtol=1e-5, atol=1e-7)

    # resume: 10 steps, checkpoint, restore into a fresh learner, 10 more
    m_c = GPRegressionMetaLearnedPAC(train, **kw)
    m_c.meta_fit(verbose=False, log_period=10, n_iter=10)
    state = m_c.state_dict()
    m_d = GPRegressionMetaLearnedPAC(train, **kw)
    m_d.load_state_dict(state)
    m_d.meta_fit(verbose=False, log_period=10, n_iter=10)
    flat_d, _ = jax.flatten_util.ravel_pytree(m_d.params)
    np.testing.assert_allclose(np.asarray(flat_d), np.asarray(flat_b),
                               rtol=1e-5, atol=1e-6)


def test_mlap_fused_gate_rejects_out_of_window_configs(monkeypatch):
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m, train, kw = _make_fused_learner()
    assert m._fused_path_ok()
    # lr_decay no longer disqualifies: staircase launches handle it
    # (tests/test_fused_lr_decay.py)
    for bad in (dict(cov_type="full"), dict(feature_dim=2),
                dict(covar_module="SE"), dict(mean_module="constant"),
                dict(optimizer="SGD")):
        kw_bad = dict(kw)
        kw_bad.update(bad)
        m_bad = GPRegressionMetaLearnedPAC(train, **kw_bad)
        assert not m_bad._fused_path_ok(), bad
    # sampled task minibatches ARE in the window (count-weighted)
    kw_tb = dict(kw)
    kw_tb.update(task_batch_size=2)
    assert GPRegressionMetaLearnedPAC(train, **kw_tb)._fused_path_ok()


# ------------------------------------------------------------ meta-test


def _metatest_setup(monkeypatch, n_test_tasks=4, **extra):
    """Fused-window learner + test contexts, _next_key pinned so the fused
    and XLA meta-test paths consume IDENTICAL randomness."""
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    m, train, kw = _make_fused_learner(n_iter=20, **extra)
    m.meta_fit(verbose=False, log_period=20)
    env = SinusoidDataset(random_state=np.random.RandomState(27))
    test = env.generate_meta_test_data(
        n_tasks=n_test_tasks, n_samples_context=5, n_samples_test=10)
    fixed = jax.random.PRNGKey(123)
    monkeypatch.setattr(m, "_next_key", lambda: fixed)
    return m, test


def test_mlap_metatest_fused_matches_xla_trajectory(monkeypatch):
    """3 fused inference steps == 3 XLA run_inference steps on the same
    split(k_opt) keys. Tolerance is Adam-step-scale (lr=1e-2, 3 steps):
    the kl_inner side rides the kappa~1e6 no-noise gram, so q drifts by a
    small fraction of the total step budget, never more."""
    m, test = _metatest_setup(monkeypatch)
    ctx = [t[:2] for t in test]

    st_f = m._meta_test_inference(ctx, n_iter=3)
    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    assert not m._fused_window_ok(5)
    st_x = m._meta_test_inference(ctx, n_iter=3)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    budget = 3 * 1e-2  # n_iter * adam lr
    for k in ("q_means", "q_trils"):
        d = float(np.max(np.abs(np.asarray(st_f[k]) - np.asarray(st_x[k]))))
        assert d <= 0.15 * budget, (k, d, budget)
    # deterministic theta_agg: same pinned key on both paths
    np.testing.assert_array_equal(np.asarray(st_f["theta_agg"]),
                                  np.asarray(st_x["theta_agg"]))


def test_mlap_metatest_loss_bitexact_when_kl_free(monkeypatch):
    """With both KL weights zero the bound is avg_ll + sqrt(c_t/c2) — no
    kappa-amplified arithmetic — and the fused step-1 loss must equal the
    XLA bound EXACTLY. This pins the delta-rescaling trick that routes the
    meta-TRAIN task count through the kernel's static meta_ct constant
    (FusedMLAPMetaTest.__init__)."""
    from meta_learning_pacoh_tpu.ops.pallas.fused_mlap_kernel import (
        FusedMLAPMetaTest,
    )

    m, test = _metatest_setup(monkeypatch, meta_kl_weight=0.0,
                              task_kl_weight=0.0)
    ctx = [t[:2] for t in test]
    Xc, Yc, Mc = map(jnp.asarray, m._prepare_meta_data(ctx))
    key = jax.random.PRNGKey(5)
    k_init, k_opt, _ = jax.random.split(key, 3)
    q_means, q_trils = m._init_task_posteriors(
        m.params["hyper_post"], Xc, k_init, mask=Mc)

    keys = jax.random.split(k_opt, 3)
    theta = posterior_rsample(m.params["hyper_post"], keys[0],
                              m.svi_batch_size)
    kl_outer = m.meta_kl_weight * posterior_kl_to_prior(
        m.params["hyper_post"], m.hyper_prior)
    noise_var = m._noise_var(m.params["raw_noise"])

    def per_task(qm, qt, x, y, mk):
        b, _, _ = m._task_bound(qm, qt, x, y, theta, noise_var, kl_outer,
                                float(m.n_tasks), mask=mk)
        return b

    loss_x = float(jnp.sum(jax.vmap(per_task)(q_means, q_trils, Xc, Yc, Mc)))

    mt = FusedMLAPMetaTest(
        m.hyper_prior,
        {"hyper_post": m.params["hyper_post"],
         "raw_noise": m.params["raw_noise"],
         "q_means": q_means, "q_trils": q_trils},
        Xc, Yc, Mc, hidden=tuple(m.cfg.mean_nn_layers), lr=1e-2,
        svi_batch_size=m.svi_batch_size, task_kl_weight=m.task_kl_weight,
        meta_kl_weight=m.meta_kl_weight, delta=m.delta,
        bound_n_tasks=m.n_tasks, weight_prior_std=m._weight_prior_std,
        bias_prior_std=m._bias_prior_std, base_key=k_opt, total_iters=3,
        interpret=True)
    mt.run(1, 0)
    np.testing.assert_allclose(float(mt.last_loss), loss_x, rtol=1e-7)


def test_mlap_metatest_eval_close_and_single_task_predict(monkeypatch):
    """Learner-level: eval_datasets via the fused inference lands within a
    small gap of the XLA path at a short horizon, and the T=1 predict path
    compiles and returns finite moments."""
    m, test = _metatest_setup(monkeypatch)
    ll_f, rmse_f, _ = m.eval_datasets(test, n_iter_meta_test=30)
    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    ll_x, rmse_x, _ = m.eval_datasets(test, n_iter_meta_test=30)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")
    # 30-iter inference is far from converged (LL ~ -18): small q drift
    # moves LL visibly, so the bar is loose — it guards against wrong-math
    # divergence (nats), not f32 chaos (centinats)
    assert abs(ll_f - ll_x) <= 0.1, (ll_f, ll_x)
    assert abs(rmse_f - rmse_x) <= 0.1, (rmse_f, rmse_x)

    mean, std = m.predict(*test[0][:2], np.linspace(-5, 5, 30),
                          n_iter_meta_test=5)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(std) > 0)
