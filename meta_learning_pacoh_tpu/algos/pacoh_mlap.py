"""PACOH-MLAP/PAC: nested two-level PAC-Bayes bound with per-task variational
GP posteriors.

Algorithmic parity with the reference `GPRegressionMetaLearnedPAC`
(reference: meta_learn/GPR_meta_mlap.py): a Gaussian hyper-posterior over
GP-prior parameters, a global Gaussian likelihood noise, and one variational
Gaussian q_t(f) per task at its train points, all trained jointly on

    loss = mean_t [ -avg E_{q_t}[ll] + sqrt((KL_out + KL_in + log 2 + log m
                                             + log n - log delta)/(2(m-1))) ]
           + meta_complexity                       (GPR_meta_mlap.py:318-370)

Meta-testing *optimizes* fresh per-task posteriors (default 3000 Adam steps,
lr=1e-2) initialized from the moment-matched aggregation of 20 hyper-posterior
prior samples (GPR_meta_mlap.py:244-291, 407-435).

TPU-first design deltas:
- KL(q_hyper || hyper_prior) is the closed form (both Gaussian) instead of an
  S-sample estimate; per-(task x theta-sample) inner KLs are analytic Gaussian
  KLs vmapped over both axes.
- Meta-test inference is ONE jitted `lax.scan` over optimizer steps, vmapped
  over ALL test tasks at once — the reference loops tasks x 3000 Python/torch
  steps (its meta-test is the dominant eval cost, SURVEY.md §3.2).
- meta_complexity uses the paper's formula sqrt((KL + log 2 + log n - log
  delta)/(2(n-1))); the reference's parenthesization divides only log delta
  (GPR_meta_mlap.py:360) — behavior judged a bug, not copied.
"""

import functools
import math
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.algos.base import RegressionModelMetaLearned
from meta_learning_pacoh_tpu.algos.pacoh_map import make_lr_schedule
from meta_learning_pacoh_tpu.models.gp_base import gp_mean, gp_gram
from meta_learning_pacoh_tpu.models.random_gp import (
    init_posterior,
    make_hyper_prior,
    posterior_kl_to_prior,
    posterior_rsample,
    random_gp_config,
)
from meta_learning_pacoh_tpu.ops.chol import safe_cholesky
from meta_learning_pacoh_tpu.ops.kernels import softplus, inv_softplus
from meta_learning_pacoh_tpu.ops.variational import (
    expected_log_prob_gaussian,
    gaussian_kl_chol,
    svgp_predict,
)
from meta_learning_pacoh_tpu.ops.distributions import (
    AffineTransformed,
    MultivariateNormal,
    Normal,
)
from meta_learning_pacoh_tpu.utils.input_handling import handle_input_dim
from meta_learning_pacoh_tpu.utils.jit_cache import shared

_N_AGG_SAMPLES = 20  # hyper-posterior samples for prior aggregation (ref :244)


class GPRegressionMetaLearnedPAC(RegressionModelMetaLearned):

    def __init__(self, meta_train_data, num_iter_fit=40000, feature_dim=1,
                 weight_prior_std=0.5, bias_prior_std=3.0, delta=0.1,
                 task_kl_weight=1.0, meta_kl_weight=1.0, posterior_lr_multiplier=1.0,
                 covar_module="SE", mean_module="zero", mean_nn_layers=(32, 32),
                 kernel_nn_layers=(32, 32), optimizer="Adam", lr=1e-3, lr_decay=1.0,
                 svi_batch_size=5, cov_type="diag", task_batch_size=-1,
                 likelihood_noise_init=0.01, normalize_data=True, random_seed=None,
                 mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'task' axis — shards the
        meta-train tensors, the per-task variational posteriors, AND the
        vmapped meta-test inference (MLAP's dominant eval cost) over devices;
        requires task_batch_size=-1 (full batch)."""
        super().__init__(normalize_data, random_seed)

        # the RandomGP flavor supports NN/constant means; 'zero' maps to a
        # constant mean initialized (and hyper-prior-centred) at zero
        if mean_module == "zero":
            mean_module = "constant"
        assert mean_module in ["NN", "constant"]
        assert covar_module in ["NN", "SE"]
        assert optimizer in ["Adam", "SGD"]

        self.num_iter_fit = num_iter_fit
        self.delta = delta
        self.task_kl_weight, self.meta_kl_weight = task_kl_weight, meta_kl_weight
        self.svi_batch_size = svi_batch_size
        self.lr = lr
        self._optimizer_name = optimizer
        self._lr_decay = lr_decay
        self._posterior_lr_multiplier = posterior_lr_multiplier
        self._cov_type = cov_type
        self._weight_prior_std = weight_prior_std
        self._bias_prior_std = bias_prior_std

        self._check_and_set_dims(meta_train_data)
        self._compute_normalization_stats(meta_train_data)
        self.X, self.Y, self.mask = self._prepare_meta_data(meta_train_data)
        self.n_tasks = self.X.shape[0]
        if task_batch_size < 1:
            self.task_batch_size = self.n_tasks
        else:
            self.task_batch_size = min(task_batch_size, self.n_tasks)

        self._mesh = mesh
        if mesh is not None:
            assert self.task_batch_size == self.n_tasks, (
                "mesh-sharded training requires task_batch_size=-1 (full batch)"
            )
            from meta_learning_pacoh_tpu.parallel.mesh import shard_task_batch

            self.X, self.Y, self.mask = shard_task_batch(
                mesh, self.X, self.Y, self.mask
            )

        self.cfg = random_gp_config(
            self.input_dim, feature_dim=feature_dim, mean_module=mean_module,
            covar_module=covar_module, mean_nn_layers=mean_nn_layers,
            kernel_nn_layers=kernel_nn_layers,
        )
        self.hyper_prior = make_hyper_prior(
            self.cfg, weight_prior_std=weight_prior_std, bias_prior_std=bias_prior_std
        )

        hyper_post = init_posterior(self._next_key(), self.hyper_prior.dim,
                                    cov_type=cov_type)
        raw_noise = inv_softplus(likelihood_noise_init - 1e-4)
        q_means, q_trils = self._init_task_posteriors(
            hyper_post, self.X, self._next_key()
        )
        self.params = {
            "hyper_post": hyper_post,
            "raw_noise": jnp.asarray(raw_noise, jnp.float32),
            "q_means": q_means,
            "q_trils": q_trils,
        }
        if mesh is not None:
            # per-task posteriors ride the task axis next to their data;
            # the hyper-posterior and noise stay replicated
            from jax.sharding import NamedSharding, PartitionSpec as P

            s_task = NamedSharding(mesh, P("task"))
            self.params["q_means"] = jax.device_put(q_means, s_task)
            self.params["q_trils"] = jax.device_put(q_trils, s_task)
        self._train_key = self._next_key()
        # jit functions are memoized on their full static config so learner
        # instances with identical configs share XLA compile caches
        hp_key = (self.cfg, weight_prior_std, bias_prior_std)
        from meta_learning_pacoh_tpu.ops.pallas import launch_sched

        opt_key = (optimizer, lr, lr_decay, launch_sched.LR_TRANSITION_STEPS,
                   posterior_lr_multiplier, cov_type)
        bound_key = (svi_batch_size, task_kl_weight, meta_kl_weight, delta)
        self._setup_optimizer(optimizer, lr, lr_decay, posterior_lr_multiplier,
                              opt_key)
        self._step_fn = shared(
            ("mlap.step",) + hp_key + opt_key + bound_key
            + (self.task_batch_size, self.n_tasks),
            self._build_step_fn,
        )
        self._meta_test_fn = shared(
            ("mlap.meta_test",) + hp_key + bound_key + (self.n_tasks,),
            self._build_meta_test_fn,
        )
        self._batch_metrics_fn = shared(
            ("mlap.batch_metrics",) + hp_key, self._build_batch_metrics_fn
        )
        self._step_count = 0
        self._fused = None  # lazily-built Pallas mega-kernel trainer

    # --------------------------------------------------------------- helpers
    def _noise_var(self, raw_noise):
        return softplus(raw_noise) + 1e-4

    def _prior_moments(self, theta, x, mask=None):
        """Moment-matched GP prior from hyper-posterior samples theta [S, P]
        at points x [N, D] -> (mean [N], cov [N, N])
        (reference aggregation: GPR_meta_mlap.py:407-435).

        mask [N] turns padded points inert: zero mean, identity cov rows."""
        unravel, cfg = self.hyper_prior.unravel, self.cfg

        def one(flat):
            p = unravel(flat)
            return gp_mean(cfg, p, x), gp_gram(cfg, p, x)

        means, covs = jax.vmap(one)(theta)
        mean = jnp.mean(means, axis=0)
        resid = means - mean
        cov = (jnp.mean(covs, axis=0)
               + jnp.mean(resid[:, :, None] * resid[:, None, :], axis=0)
               + 1e-5 * jnp.eye(x.shape[0]))
        if mask is not None:
            mean = mean * mask
            m2 = mask[:, None] * mask[None, :]
            cov = cov * m2 + jnp.diag(1.0 - mask)
        return mean, cov

    def _init_task_posteriors(self, hyper_post, X, key, mask=None):
        """q_t init at the aggregated prior (reference: GPR_meta_mlap.py:247-256).

        Jitted once per learner: this runs on EVERY predict/eval call
        (meta-test inference), and eager tracing dispatches hundreds of tiny
        ops through the device tunnel — tens of ms per call on the axon
        relay."""
        if mask is None:
            mask = jnp.ones(X.shape[:2], jnp.float32)
        fn = getattr(self, "_init_q_jit", None)
        if fn is None:
            def init_q(hyper_post, X, mask, key):
                k_theta, k_eps = jax.random.split(key)
                theta = posterior_rsample(hyper_post, k_theta,
                                          _N_AGG_SAMPLES)
                eps = jax.random.normal(k_eps, X.shape[:2], jnp.float32)

                def one(x, e, m):
                    mean, cov = self._prior_moments(theta, x, mask=m)
                    q_mean = mean + 1e-3 * e * m
                    q_tril = safe_cholesky(cov + 1e-3 * jnp.eye(x.shape[0]))
                    return q_mean, q_tril

                return jax.vmap(one)(X, eps, mask)

            fn = self._init_q_jit = jax.jit(init_q)
        return fn(hyper_post, jnp.asarray(X), jnp.asarray(mask), key)

    def _task_bound(self, q_mean, q_tril, x, y, theta, noise_var, kl_outer,
                    n_tasks, mask=None):
        """One task's PAC bound term (reference: GPR_meta_mlap.py:318-355).

        With a padding mask, q is pinned to N(0, I) on padded dims and the
        prior is identity there too, so padded dims contribute exactly 0 to
        both the expected log-likelihood and the inner KL."""
        unravel, cfg = self.hyper_prior.unravel, self.cfg
        if mask is None:
            mask = jnp.ones_like(y)
        m2 = mask[:, None] * mask[None, :]
        L = jnp.tril(q_tril) * m2 + jnp.diag(1.0 - mask)
        q_mean_eff = q_mean * mask
        f_var = jnp.sum(L**2, axis=-1)
        n_eff = jnp.sum(mask)
        lp = expected_log_prob_gaussian(y, q_mean_eff, f_var, noise_var)
        avg_ll = jnp.sum(lp * mask) / n_eff

        def kl_one(flat):
            p = unravel(flat)
            prior_mean = gp_mean(cfg, p, x) * mask
            prior_cov = gp_gram(cfg, p, x) * m2 + jnp.diag(1.0 - mask)
            return gaussian_kl_chol(q_mean_eff, L, prior_mean, prior_cov)

        kl_inner = self.task_kl_weight * jnp.mean(jax.vmap(kl_one)(theta))
        complexity = jnp.sqrt(
            (kl_outer + kl_inner + math.log(2.0) + jnp.log(n_eff)
             + math.log(n_tasks) - math.log(self.delta)) / (2.0 * (n_eff - 1.0))
        )
        return -avg_ll + complexity, avg_ll, kl_inner

    # ------------------------------------------------------------------ setup
    def _setup_optimizer(self, optimizer, lr, lr_decay, posterior_lr_multiplier,
                         opt_key):
        def build():
            schedule = make_lr_schedule(lr, lr_decay)
            post_schedule = make_lr_schedule(lr * posterior_lr_multiplier, lr_decay)
            make = optax.adam if optimizer == "Adam" else optax.sgd
            labels = {
                "hyper_post": jax.tree.map(lambda _: "main",
                                           self.params["hyper_post"]),
                "raw_noise": "main",
                "q_means": "posterior",
                "q_trils": "posterior",
            }
            return optax.multi_transform(
                {"main": make(schedule), "posterior": make(post_schedule)}, labels
            )

        self._opt = shared(("mlap.opt",) + opt_key, build)
        self.opt_state = self._opt.init(self.params)

    # ------------------------------------------------------------- train step
    def _build_step_fn(self):
        n_tasks, batch_size = self.n_tasks, self.task_batch_size
        svi = self.svi_batch_size
        opt = self._opt
        hyper_prior = self.hyper_prior
        meta_kl_weight = self.meta_kl_weight

        def loss_fn(params, key, idx, X, Y, M):
            theta = posterior_rsample(params["hyper_post"], key, svi)
            kl_outer_raw = posterior_kl_to_prior(params["hyper_post"], hyper_prior)
            kl_outer = meta_kl_weight * kl_outer_raw
            noise_var = self._noise_var(params["raw_noise"])

            def per_task(i):
                return self._task_bound(
                    params["q_means"][i], params["q_trils"][i], X[i], Y[i],
                    theta, noise_var, kl_outer, float(n_tasks), mask=M[i],
                )

            bounds, avg_lls, kl_inners = jax.vmap(per_task)(idx)
            meta_complexity = jnp.sqrt(
                (kl_outer + math.log(2.0) + math.log(float(n_tasks))
                 - math.log(self.delta)) / (2.0 * (n_tasks - 1.0))
            )
            loss = jnp.mean(bounds) + meta_complexity
            diag = {
                "avg_ll": jnp.mean(avg_lls),
                "kl_outer_weighted": kl_outer,
                "kl_inner_weighted": jnp.mean(kl_inners),
            }
            return loss, diag

        def single_step(carry, key, X, Y, M):
            params, opt_state = carry
            k_task, k_theta = jax.random.split(key)
            idx = jax.random.randint(k_task, (batch_size,), 0, n_tasks)
            (loss, diag), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, k_theta, idx, X, Y, M
            )
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), (loss, diag)

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, opt_state, X, Y, M, base_key, start_step, n_steps):
            steps = start_step + jnp.arange(n_steps)
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(steps)

            def body(carry, key):
                return single_step(carry, key, X, Y, M)

            (params, opt_state), (losses, diags) = jax.lax.scan(
                body, (params, opt_state), keys
            )
            return params, opt_state, losses, diags

        return run_chunk

    # ------------------------------------------------ fused-kernel fast path
    def _fused_window_ok(self, n_points):
        """The structural window both MLAP mega-kernels share: NN/NN with
        one shared hidden width, feature_dim 1, diag hyper-posterior,
        n_points within the unrolled-linalg window, lane budget for the
        S-sample layout."""
        from meta_learning_pacoh_tpu import config

        cfg = self.cfg
        hidden = tuple(cfg.mean_nn_layers)
        return (
            config.fused_enabled()
            and self._mesh is None
            and self._cov_type == "diag"
            and cfg.mean_module == "NN" and cfg.covar_module == "NN"
            and cfg.feature_dim == 1
            and hidden == tuple(cfg.kernel_nn_layers)
            and len(set(hidden)) == 1 and len(hidden) >= 1
            and self.svi_batch_size * hidden[0] <= 1024  # lane budget
            and n_points <= 8  # unrolled-linalg window (ops/gp.py)
        )

    def _fused_path_ok(self):
        """Whether the single-launch Pallas MLAP training kernel applies.

        The mega-kernel (ops/pallas/fused_mlap_kernel.py) covers the
        NN/NN flagship window: one shared hidden width, feature_dim 1,
        diag hyper-posterior, Adam (any lr_decay), N within the
        unrolled-linalg window. Everything else uses the general
        scan-fused XLA step.
        """
        st = self.opt_state
        adam_ok = (
            hasattr(st, "inner_states")
            and all(
                g in st.inner_states
                and hasattr(st.inner_states[g].inner_state[0], "mu")
                for g in ("main", "posterior")
            )
        )
        return (
            self._fused_window_ok(self.X.shape[1])
            # lr_decay < 1: staircase-aligned launches, runtime lr scalars
            # for both param groups (ops/pallas/launch_sched.py)
            and self._optimizer_name == "Adam"
            and adam_ok
        )

    def _extract_moments(self):
        """Adam (mu, nu) as full params-shaped pytrees from the two
        multi_transform groups."""
        main = self.opt_state.inner_states["main"].inner_state[0]
        post = self.opt_state.inner_states["posterior"].inner_state[0]
        mu = {"hyper_post": main.mu["hyper_post"],
              "raw_noise": main.mu["raw_noise"],
              "q_means": post.mu["q_means"], "q_trils": post.mu["q_trils"]}
        nu = {"hyper_post": main.nu["hyper_post"],
              "raw_noise": main.nu["raw_noise"],
              "q_means": post.nu["q_means"], "q_trils": post.nu["q_trils"]}
        return mu, nu

    def _fused_run_chunk(self, chunk):
        from meta_learning_pacoh_tpu import config
        from meta_learning_pacoh_tpu.ops.pallas.fused_mlap_kernel import (
            FusedMLAPTrainer,
        )

        if self._fused is None:
            self._fused = FusedMLAPTrainer(
                self.hyper_prior, self.params, self.X, self.Y, self.mask,
                hidden=tuple(self.cfg.mean_nn_layers), lr=self.lr,
                posterior_lr_multiplier=self._posterior_lr_multiplier,
                task_batch_size=self.task_batch_size,
                svi_batch_size=self.svi_batch_size,
                task_kl_weight=self.task_kl_weight,
                meta_kl_weight=self.meta_kl_weight, delta=self.delta,
                weight_prior_std=self._weight_prior_std,
                bias_prior_std=self._bias_prior_std,
                base_key=self._train_key, lr_decay=self._lr_decay,
                interpret=config.pallas_interpret(),
            )
            if self._step_count > 0:  # resume: carry the live Adam moments
                mu, nu = self._extract_moments()
                self._fused.load_moments(mu, nu)
        self._fused.run(chunk, self._step_count)

    def _fused_sync(self, total_steps):
        """Unpack the kernel-resident state into the canonical learner state
        (predict/eval/state_dict read self.params / self.opt_state)."""
        self._fused_dirty = False
        self.params, mu, nu = self._fused.sync()

        def set_group(masked_state, keys):
            adam = masked_state.inner_state[0]
            new_mu = {k: (mu[k] if k in keys else adam.mu[k])
                      for k in adam.mu}
            new_nu = {k: (nu[k] if k in keys else adam.nu[k])
                      for k in adam.nu}
            from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
                bump_counts,
            )

            new_adam = adam._replace(
                count=jnp.asarray(total_steps, jnp.int32),
                mu=new_mu, nu=new_nu)
            return masked_state._replace(
                inner_state=(new_adam,)
                + bump_counts(masked_state.inner_state[1:], total_steps))

        inner = dict(self.opt_state.inner_states)
        inner["main"] = set_group(inner["main"], {"hyper_post", "raw_noise"})
        inner["posterior"] = set_group(inner["posterior"],
                                       {"q_means", "q_trils"})
        self.opt_state = self.opt_state._replace(inner_states=inner)

    def meta_fit(self, valid_tuples=None, verbose=True, log_period=500,
                 eval_period=5000, n_iter=None):
        """Trains the hyper-posterior + per-task posteriors on the PAC bound."""
        assert (valid_tuples is None) or all(len(t) == 4 for t in valid_tuples)
        if n_iter is None:
            n_iter = self.num_iter_fit

        use_fused = self._fused_path_ok()
        # loss/diag readbacks fence the pipeline (10-30 ms tunnel round trip
        # each): only per-chunk when the log message is consumed; otherwise
        # keep device handles and read once after the loop
        want_metrics = verbose or (valid_tuples is not None)
        t = time.time()
        dev_loss, dev_diag = None, {}
        remaining, itr = n_iter, 0
        try:
            while remaining > 0:
                chunk = int(min(log_period, remaining))
                if use_fused:
                    self._fused_run_chunk(chunk)
                    self._step_count += chunk
                    self._fused_dirty = True
                    if valid_tuples is not None or remaining <= chunk:
                        self._fused_sync(self._step_count)
                    dev_loss = self._fused.last_loss
                    dev_diag = dict(self._fused.last_diag)
                else:
                    self.params, self.opt_state, losses, diags = self._step_fn(
                        self.params, self.opt_state, self.X, self.Y,
                        self.mask, self._train_key, self._step_count, chunk
                    )
                    self._step_count += chunk
                    dev_loss = losses[-1]
                    dev_diag = {k: v[-1] for k, v in diags.items()}
                remaining -= chunk
                itr += chunk

                if want_metrics:
                    loss = float(dev_loss)
                    diag = {k: float(v) for k, v in dev_diag.items()}
                    duration = time.time() - t
                    t = time.time()
                    message = "Iter %d/%d - Loss: %.6f - Time %.2f sec - " % (
                        itr, n_iter, loss, duration,
                    )
                    if valid_tuples is not None and itr % eval_period == 0:
                        valid_ll, valid_rmse, calib = self.eval_datasets(
                            valid_tuples)
                        message += (" - Valid-LL: %.3f - Valid-RMSE: %.3f"
                                    " - Calib-Err %.3f" % (
                                        valid_ll, valid_rmse, calib))
                    message += " - ".join("%s: %.4f" % (k, v)
                                          for k, v in diag.items())
                    if verbose:
                        self.logger.info(message)
        finally:
            # an interrupted fused run must not leave self.params stale
            # relative to _step_count (state_dict/predict read them)
            if use_fused and getattr(self, "_fused_dirty", False):
                self._fused_sync(self._step_count)

        self.fitted = True
        loss = float("nan") if dev_loss is None else float(dev_loss)
        return loss, {k: float(v) for k, v in dev_diag.items()}

    # ------------------------------------------------------- meta-test (fit q)
    def _build_meta_test_fn(self):
        svi = self.svi_batch_size
        hyper_prior = self.hyper_prior
        meta_kl_weight = self.meta_kl_weight

        def make_loss(Xc, Yc, Mc, n_tasks_meta):
            def loss_fn(q_params, hyper_post, raw_noise, key):
                theta = posterior_rsample(hyper_post, key, svi)
                kl_outer = meta_kl_weight * posterior_kl_to_prior(hyper_post, hyper_prior)
                noise_var = self._noise_var(raw_noise)

                def per_task(q_mean, q_tril, x, y, m):
                    b, _, _ = self._task_bound(
                        q_mean, q_tril, x, y, theta, noise_var, kl_outer,
                        float(n_tasks_meta), mask=m,
                    )
                    return b

                bounds = jax.vmap(per_task)(
                    q_params["q_means"], q_params["q_trils"], Xc, Yc, Mc
                )
                return jnp.sum(bounds)

            return loss_fn

        @functools.partial(jax.jit, static_argnames=("n_iter", "lr"))
        def run_inference(hyper_post, raw_noise, Xc, Yc, Mc, q_means, q_trils, key,
                          n_iter, lr):
            loss_fn = make_loss(Xc, Yc, Mc, self.n_tasks)
            opt = optax.adam(lr)
            q_params = {"q_means": q_means, "q_trils": q_trils}
            opt_state = opt.init(q_params)

            def step(carry, k):
                q, st = carry
                loss, grads = jax.value_and_grad(loss_fn)(q, hyper_post, raw_noise, k)
                updates, st = opt.update(grads, st, q)
                q = optax.apply_updates(q, updates)
                return (q, st), loss

            keys = jax.random.split(key, n_iter)
            (q_params, _), losses = jax.lax.scan(step, (q_params, opt_state), keys)
            return q_params, losses

        return run_inference

    def _build_batch_metrics_fn(self):
        """All-task predictive metrics in one jitted lax.map; every
        data-dependent quantity (theta samples, contexts, posteriors, noise,
        y stats) is a runtime argument so the compiled fn is shared across
        instances and eval calls."""
        from meta_learning_pacoh_tpu.ops.metrics import gp_eval_metrics

        @jax.jit
        def batch_metrics(theta, Xc, Mc, q_means, q_trils, noise_var, TX, TY,
                          y_mean, y_std):
            nc = Xc.shape[1]

            def one(args):
                xc, mc, qm, qt, tx, ty = args
                x_all = jnp.concatenate([xc, tx], axis=0)
                mask_all = jnp.concatenate(
                    [mc, jnp.ones(tx.shape[0], mc.dtype)]
                )
                mean_all, cov_all = self._prior_moments(theta, x_all,
                                                        mask=mask_all)
                m2c = mc[:, None] * mc[None, :]
                qt_eff = jnp.tril(qt) * m2c + jnp.diag(1.0 - mc)
                m, c = svgp_predict(
                    qm * mc, qt_eff, mean_all[:nc], cov_all[:nc, :nc],
                    cov_all[:nc, nc:], mean_all[nc:], cov_all[nc:, nc:],
                )
                c = c + noise_var * jnp.eye(c.shape[-1])
                return gp_eval_metrics(m, c, ty, y_mean, y_std)

            return jax.lax.map(one, (Xc, Mc, q_means, q_trils, TX, TY))

        return batch_metrics

    def _meta_test_inference(self, context_tuples, n_iter=3000, lr=1e-2):
        """Fit per-task posteriors for the given contexts; returns the task
        state needed for prediction. All tasks (ragged ones padded + masked)
        optimized in ONE vmapped scan."""
        Xc, Yc, Mc = self._prepare_meta_data(context_tuples)
        Xc, Yc, Mc = jnp.asarray(Xc), jnp.asarray(Yc), jnp.asarray(Mc)
        if self._mesh is not None and Xc.shape[0] % self._mesh.shape["task"] == 0:
            # shard the meta-test tasks: the 3000-step vmapped inner Adam
            # (MLAP's dominant eval cost) then runs task-parallel across chips
            from meta_learning_pacoh_tpu.parallel.mesh import shard_task_batch

            Xc, Yc, Mc = shard_task_batch(self._mesh, Xc, Yc, Mc)

        k_init, k_opt, k_theta = jax.random.split(self._next_key(), 3)
        theta_agg = posterior_rsample(self.params["hyper_post"], k_theta, _N_AGG_SAMPLES)
        q_means, q_trils = self._init_task_posteriors(
            self.params["hyper_post"], Xc, k_init, mask=Mc
        )
        if self._fused_window_ok(Xc.shape[1]):
            # single-launch Pallas inference: same per-step theta noise as
            # the XLA path (split(k_opt, n_iter) keys), frozen hyper state,
            # q-only Adam — see FusedMLAPMetaTest. Instances are cached by
            # (T, N, n_iter, lr): construction jits per-instance closures,
            # so a fresh instance per predict would recompile every call.
            from meta_learning_pacoh_tpu import config
            from meta_learning_pacoh_tpu.ops.pallas.fused_mlap_kernel import (
                FusedMLAPMetaTest,
            )

            params = {"hyper_post": self.params["hyper_post"],
                      "raw_noise": self.params["raw_noise"],
                      "q_means": q_means, "q_trils": q_trils}
            cache = getattr(self, "_mt_cache", None)
            if cache is None:
                cache = self._mt_cache = {}
            ck = (Xc.shape[0], Xc.shape[1], int(n_iter), float(lr))
            mt = cache.get(ck)
            if mt is None:
                if len(cache) >= 8:  # bound pathological n_iter churn
                    cache.pop(next(iter(cache)))
                mt = cache[ck] = FusedMLAPMetaTest(
                    self.hyper_prior, params, Xc, Yc, Mc,
                    hidden=tuple(self.cfg.mean_nn_layers), lr=lr,
                    svi_batch_size=self.svi_batch_size,
                    task_kl_weight=self.task_kl_weight,
                    meta_kl_weight=self.meta_kl_weight, delta=self.delta,
                    bound_n_tasks=self.n_tasks,
                    weight_prior_std=self._weight_prior_std,
                    bias_prior_std=self._bias_prior_std, base_key=k_opt,
                    total_iters=n_iter, interpret=config.pallas_interpret())
            else:
                mt.reset(params, Xc, Yc, Mc, k_opt)
            mt.run(n_iter, 0)
            q_params = mt.q_params()
        else:
            q_params, _losses = self._meta_test_fn(
                self.params["hyper_post"], self.params["raw_noise"], Xc, Yc,
                Mc, q_means, q_trils, k_opt, n_iter, lr,
            )
        return {
            "Xc": Xc, "Yc": Yc, "Mc": Mc,
            "q_means": q_params["q_means"], "q_trils": q_params["q_trils"],
            "theta_agg": theta_agg,
        }

    def _predictive(self, task_state, i, x_test_n):
        """Aggregated-prior SVGP predictive for task i at normalized test x."""
        xc = task_state["Xc"][i]
        mc = task_state["Mc"][i]
        nc = xc.shape[0]
        x_all = jnp.concatenate([xc, x_test_n], axis=0)
        mask_all = jnp.concatenate([mc, jnp.ones(x_test_n.shape[0], mc.dtype)])
        mean_all, cov_all = self._prior_moments(task_state["theta_agg"], x_all,
                                                mask=mask_all)
        mean_c, mean_t = mean_all[:nc], mean_all[nc:]
        K_cc = cov_all[:nc, :nc]
        K_ct = cov_all[:nc, nc:]
        K_tt = cov_all[nc:, nc:]
        m2c = mc[:, None] * mc[None, :]
        q_tril = jnp.tril(task_state["q_trils"][i]) * m2c + jnp.diag(1.0 - mc)
        m, c = svgp_predict(
            task_state["q_means"][i] * mc, q_tril,
            mean_c, K_cc, K_ct, mean_t, K_tt,
        )
        noise_var = self._noise_var(self.params["raw_noise"])
        c = c + noise_var * jnp.eye(c.shape[-1])
        return m, c

    def predict(self, context_x, context_y, test_x, n_iter_meta_test=3000,
                return_density=False):
        context_x, context_y = handle_input_dim(context_x, context_y)
        test_x = handle_input_dim(test_x)
        assert test_x.shape[1] == context_x.shape[1]

        task_state = self._meta_test_inference([(context_x, context_y)],
                                               n_iter=n_iter_meta_test)
        test_xn = jnp.asarray(self._normalize_x(test_x))
        mean, cov = self._predictive(task_state, 0, test_xn)
        pred_dist = AffineTransformed(
            MultivariateNormal(mean, cov), self.y_mean[0], self.y_std[0]
        )
        if return_density:
            return pred_dist
        return np.asarray(pred_dist.mean), np.asarray(pred_dist.stddev)

    def eval_datasets(self, test_tuples, n_iter_meta_test=3000, **kwargs):
        """Meta-test inference for ALL tasks in one vmapped scan, then one
        jitted lax.map for all predictive metrics."""
        assert all(len(t) == 4 for t in test_tuples)
        from meta_learning_pacoh_tpu.ops.metrics import gp_eval_metrics

        context_tuples = [t[:2] for t in test_tuples]
        task_state = self._meta_test_inference(context_tuples, n_iter=n_iter_meta_test)

        test_prepared = [handle_input_dim(tx, ty) for _, _, tx, ty in test_tuples]
        if len({tx.shape for tx, _ in test_prepared}) == 1:
            TX = jnp.stack([jnp.asarray(self._normalize_x(tx)) for tx, _ in test_prepared])
            TY = jnp.stack([jnp.asarray(ty.flatten()) for _, ty in test_prepared])
            lls, rmses, calibs = self._batch_metrics_fn(
                task_state["theta_agg"], task_state["Xc"], task_state["Mc"],
                task_state["q_means"], task_state["q_trils"],
                self._noise_var(self.params["raw_noise"]), TX, TY,
                float(self.y_mean[0]), float(self.y_std[0]),
            )
            return (float(jnp.mean(lls)), float(jnp.mean(rmses)),
                    float(jnp.mean(calibs)))

        from meta_learning_pacoh_tpu.algos.base import calib_error

        lls, rmses, calibs = [], [], []
        for i, (tx, ty) in enumerate(test_prepared):
            test_y_flat = ty.flatten()
            test_xn = jnp.asarray(self._normalize_x(tx))
            mean, cov = self._predictive(task_state, i, test_xn)
            pred_dist = AffineTransformed(
                MultivariateNormal(mean, cov), self.y_mean[0], self.y_std[0]
            )
            lls.append(float(pred_dist.log_prob(jnp.asarray(test_y_flat)))
                       / test_y_flat.shape[0])
            rmses.append(float(jnp.sqrt(jnp.mean((pred_dist.mean - test_y_flat) ** 2))))
            calibs.append(calib_error(Normal(pred_dist.mean, pred_dist.stddev),
                                      test_y_flat))
        return float(np.mean(lls)), float(np.mean(rmses)), float(np.mean(calibs))

    def prior_mean(self, x, n_hyperposterior_samples=1000):
        """Aggregated prior mean curve in original units
        (reference: GPR_meta_mlap.py:392-405)."""
        x = handle_input_dim(np.asarray(x))
        xn = jnp.asarray(self._normalize_x(x))
        theta = posterior_rsample(self.params["hyper_post"], self._next_key(),
                                  n_hyperposterior_samples)
        unravel, cfg = self.hyper_prior.unravel, self.cfg
        means = jax.vmap(lambda f: gp_mean(cfg, unravel(f), xn))(theta)
        return np.asarray(jnp.mean(means, axis=0)) * self.y_std[0] + self.y_mean[0]

    def _vectorize_pred_dist(self, pred_dist):
        return Normal(pred_dist.mean, pred_dist.stddev)

    # ------------------------------------------------------------- checkpoint
    def state_dict(self):
        return {
            "params": jax.tree.map(np.asarray, self.params),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "step": self._step_count,
        }

    def load_state_dict(self, state_dict):
        self.params = jax.tree.map(jnp.asarray, state_dict["params"])
        self.opt_state = jax.tree.map(jnp.asarray, state_dict["opt_state"])
        self._step_count = state_dict.get("step", 0)
        self._fused = None  # repack from the restored state on next fit
