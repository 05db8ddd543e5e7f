"""PACOH-VI: Gaussian variational hyper-posterior over GP-prior parameters.

Algorithmic parity with the reference `GPRegressionMetaLearnedVI`
(reference: meta_learn/GPR_meta_vi.py): the negative ELBO

    -E_q[ log p~(params | batch) - prior_factor * log q(params) ]

estimated with `svi_batch_size` reparameterized samples
(GPR_meta_vi.py:216-226), a diag- or full-covariance Gaussian posterior
(random_gp.py:224-286), and Bayes/MAP prediction modes (mixture over
posterior samples vs. posterior-mean GP, GPR_meta_vi.py:130-174).

Note: the reference's `state_dict` is broken as written (references a
nonexistent task model, GPR_meta_vi.py:176-184); here it round-trips the
posterior + optimizer state.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.algos.base import RegressionModelMetaLearned
from meta_learning_pacoh_tpu.algos.pacoh_map import make_lr_schedule
from meta_learning_pacoh_tpu.models.gp_base import gp_predict
from meta_learning_pacoh_tpu.models.random_gp import (
    init_posterior,
    make_hyper_prior,
    meta_log_prob,
    posterior_entropy,
    posterior_log_prob,
    posterior_rsample,
    random_gp_config,
)
from meta_learning_pacoh_tpu.ops.distributions import (
    AffineTransformed,
    EqualWeightedMixture,
    MultivariateNormal,
    Normal,
)
from meta_learning_pacoh_tpu.utils.input_handling import handle_input_dim
from meta_learning_pacoh_tpu.utils.jit_cache import shared


class GPRegressionMetaLearnedVI(RegressionModelMetaLearned):

    def __init__(self, meta_train_data, num_iter_fit=10000, feature_dim=1,
                 prior_factor=0.01, weight_prior_std=0.5, bias_prior_std=3.0,
                 covar_module="NN", mean_module="NN", mean_nn_layers=(32, 32),
                 kernel_nn_layers=(32, 32), optimizer="Adam", lr=1e-3, lr_decay=1.0,
                 svi_batch_size=10, cov_type="diag", task_batch_size=-1,
                 normalize_data=True, random_seed=None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'task' axis (full-batch
        data parallelism over tasks; requires task_batch_size=-1)."""
        super().__init__(normalize_data, random_seed)

        assert mean_module in ["NN", "constant"]
        assert covar_module in ["NN", "SE"]
        assert optimizer in ["Adam", "SGD"]
        assert cov_type in ["diag", "full"]

        self.num_iter_fit = num_iter_fit
        self.prior_factor = prior_factor
        self.svi_batch_size = svi_batch_size

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
        self._cov_type = cov_type
        self._optimizer_name = optimizer
        self._lr, self._lr_decay = lr, lr_decay
        self._weight_prior_std = weight_prior_std
        self._bias_prior_std = bias_prior_std
        self.hyper_prior = make_hyper_prior(
            self.cfg, weight_prior_std=weight_prior_std, bias_prior_std=bias_prior_std
        )
        self.posterior = init_posterior(
            self._next_key(), self.hyper_prior.dim, cov_type=cov_type
        )
        self._train_key = self._next_key()

        def build_opt():
            schedule = make_lr_schedule(lr, lr_decay)
            return optax.adam(schedule) if optimizer == "Adam" else optax.sgd(schedule)

        # jit functions are memoized on their full static config so learner
        # instances with identical configs share XLA compile caches
        hp_key = (self.cfg, weight_prior_std, bias_prior_std)
        from meta_learning_pacoh_tpu.ops.pallas import launch_sched

        opt_key = (optimizer, lr, lr_decay, launch_sched.LR_TRANSITION_STEPS)
        self._opt = shared(("pacoh_vi.opt",) + opt_key, build_opt)
        self.opt_state = self._opt.init(self.posterior)

        self._step_fn = shared(
            ("pacoh_vi.step",) + hp_key + opt_key
            + (prior_factor, svi_batch_size, cov_type,
               self.task_batch_size, self.n_tasks, self._weight_by_counts()),
            self._build_step_fn,
        )
        self._predict_fn = shared(
            ("pacoh_vi.predict",) + hp_key, self._build_predict_fn
        )
        self._batch_eval_fn = shared(
            ("pacoh_vi.batch_eval",) + hp_key, self._build_batch_eval_fn
        )
        self._step_count = 0
        self._fused = None  # lazily-built Pallas mega-kernel trainer


    # ------------------------------------------------------------- train step
    def _weight_by_counts(self):
        """TPU no-gather sampled task batches (see pacoh_svgd/pacoh_map's
        _weight_by_counts). PACOH_TPU_VI_WEIGHTED=0/1 overrides."""
        from meta_learning_pacoh_tpu.config import _env_flag

        if self.task_batch_size == self.n_tasks:
            return False
        return _env_flag("PACOH_TPU_VI_WEIGHTED",
                         default=jax.default_backend() == "tpu")

    def _build_step_fn(self):
        hyper_prior, prior_factor = self.hyper_prior, self.prior_factor
        svi_batch_size = self.svi_batch_size
        n_tasks, batch_size = self.n_tasks, self.task_batch_size
        weight_by_counts = self._weight_by_counts()
        opt = self._opt

        def neg_elbo(post, key, xb, yb, mb, pf, counts=None):
            samples = posterior_rsample(post, key, svi_batch_size)  # [S, P]
            lp = meta_log_prob(hyper_prior, pf, samples, xb, yb, mb,
                               counts=counts)  # [S]
            # E_q[log q] == -H(q) exactly for a Gaussian: the reference
            # estimates it from samples (GPR_meta_vi.py:221), but for the
            # full-covariance family the triangular solve behind log q is
            # catastrophically ill-conditioned in f32 at P ~ thousands of
            # parameters; the closed form is the same objective with zero
            # variance and no solve.
            elbo = jnp.mean(lp) + pf * posterior_entropy(post)
            return -elbo

        full_batch = batch_size == n_tasks

        def single_step(carry, key, X, Y, M, pf):
            post, opt_state = carry
            k_task, k_sample = jax.random.split(key)
            if full_batch:
                xb, yb, mb = X, Y, M
            else:
                idx = jax.random.randint(k_task, (batch_size,), 0, n_tasks)
                xb, yb, mb = X[idx], Y[idx], M[idx]
            loss, grads = jax.value_and_grad(neg_elbo)(post, k_sample, xb, yb,
                                                       mb, pf)
            updates, opt_state = opt.update(grads, opt_state, post)
            post = optax.apply_updates(post, updates)
            return (post, opt_state), loss

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(post, opt_state, X, Y, M, base_key, start_step, n_steps,
                      pf=None):
            # pf: optional TRACED prior_factor override (utils/tuning_parallel
            # vmaps trials over it); None keeps the constructor constant.
            pf = prior_factor if pf is None else pf
            steps = start_step + jnp.arange(n_steps)
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(steps)

            def body(carry, key):
                return single_step(carry, key, X, Y, M, pf)

            (post, opt_state), losses = jax.lax.scan(body, (post, opt_state), keys)
            return post, opt_state, losses

        return run_chunk

    # ------------------------------------------------ fused-kernel fast path
    def _fused_path_ok(self):
        """Whether the single-launch Pallas VI training kernel applies.

        The mega-kernel (ops/pallas/fused_vi_kernel.py) covers the flagship
        configuration: NN mean + NN kernel with one shared hidden width,
        feature_dim 1, diag posterior, full task batch, Adam (any lr_decay),
        N within the unrolled-linalg window. Everything else uses the
        general scan-fused XLA step.
        """
        from meta_learning_pacoh_tpu import config

        import numpy as np

        cfg = self.cfg
        hidden = tuple(cfg.mean_nn_layers)
        sizes = np.asarray(jnp.sum(self.mask, axis=-1))
        return (
            config.fused_enabled()
            and self._mesh is None
            and self._cov_type == "diag"
            # full batch, or sampled batches via count-weighted pages
            # (uniform task sizes keep the pre-factor / mll_const per-launch
            # constants inside the kernel)
            and (self.task_batch_size == self.n_tasks
                 or (self._weight_by_counts()
                     and bool(np.all(sizes == sizes[0]))))
            # lr_decay < 1: staircase-aligned launches, runtime lr scalar
            # (ops/pallas/launch_sched.py)
            and self._optimizer_name == "Adam"
            and cfg.mean_module == "NN" and cfg.covar_module == "NN"
            and cfg.feature_dim == 1
            and hidden == tuple(cfg.kernel_nn_layers)
            and len(set(hidden)) == 1 and len(hidden) >= 1
            and self.svi_batch_size * hidden[0] <= 1024  # lane budget
            # N <= 8: entry-wise unrolled linalg; 9..256: the big-N blocked
            # mega-kernel (ops/pallas/fused_vi_bign_kernel.py)
            and (self.X.shape[1] <= 8 or self._bign_fits())
            and hasattr(self.opt_state[0], "mu")
        )

    def _bign_fits(self):
        from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import (
            svgd_bign_wins,
        )
        from meta_learning_pacoh_tpu.ops.pallas.fused_vi_bign_kernel import (
            vi_bign_fits,
        )

        return svgd_bign_wins() and vi_bign_fits(
            self.svi_batch_size, self.X.shape[0], self.X.shape[1])

    def _fused_run_chunk(self, chunk):
        from meta_learning_pacoh_tpu import config
        from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
            pack_state,
        )
        from meta_learning_pacoh_tpu.ops.pallas.fused_vi_kernel import (
            FusedVITrainer,
        )
        from meta_learning_pacoh_tpu.ops.pallas.fused_vi_bign_kernel import (
            FusedVIBigNTrainer,
        )

        trainer_cls = (FusedVITrainer if self.X.shape[1] <= 8
                       else FusedVIBigNTrainer)
        hidden = tuple(self.cfg.mean_nn_layers)
        if self._fused is None:
            self._fused = trainer_cls(
                self.hyper_prior, self.posterior, self.X, self.Y, self.mask,
                hidden=hidden, lr=self._lr, prior_factor=self.prior_factor,
                weight_prior_std=self._weight_prior_std,
                bias_prior_std=self._bias_prior_std,
                svi_batch_size=self.svi_batch_size,
                base_key=self._train_key, lr_decay=self._lr_decay,
                task_batch_size=self.task_batch_size,
                interpret=config.pallas_interpret(),
            )
            if self._step_count > 0:  # resume: carry the live Adam moments
                adam = self.opt_state[0]
                self._fused.m_loc = pack_state(
                    self.hyper_prior, adam.mu["loc"][None, :], hidden)
                self._fused.m_lsc = pack_state(
                    self.hyper_prior, adam.mu["log_scale"][None, :], hidden)
                self._fused.v_loc = pack_state(
                    self.hyper_prior, adam.nu["loc"][None, :], hidden)
                self._fused.v_lsc = pack_state(
                    self.hyper_prior, adam.nu["log_scale"][None, :], hidden)
        self._fused.run(chunk, self._step_count)

    def _fused_sync(self, total_steps):
        """Unpack the kernel-resident state into the canonical learner state
        (predict/eval/state_dict read self.posterior / self.opt_state)."""
        self._fused_dirty = False
        self.posterior, mu, nu = self._fused.sync()
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import bump_counts

        adam = self.opt_state[0]._replace(
            count=jnp.asarray(total_steps, jnp.int32), mu=mu, nu=nu
        )
        self.opt_state = (adam,) + bump_counts(self.opt_state[1:], total_steps)

    def meta_fit(self, valid_tuples=None, verbose=True, log_period=500, n_iter=None):
        """Fits the variational hyper-posterior by minimizing the negative ELBO."""
        assert (valid_tuples is None) or all(len(t) == 4 for t in valid_tuples)
        if n_iter is None:
            n_iter = self.num_iter_fit

        use_fused = self._fused_path_ok()
        # loss readbacks fence the pipeline (10-30 ms tunnel round trip):
        # only per-chunk when the log message is consumed, once otherwise
        want_metrics = verbose or (valid_tuples is not None)
        t = time.time()
        dev_loss = None
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
                else:
                    self.posterior, self.opt_state, losses = self._step_fn(
                        self.posterior, self.opt_state, self.X, self.Y,
                        self.mask, self._train_key, self._step_count, chunk
                    )
                    self._step_count += chunk
                    dev_loss = losses[-1]
                remaining -= chunk
                itr += chunk

                if want_metrics:
                    loss = float(dev_loss)
                    duration = time.time() - t
                    t = time.time()
                    message = "Iter %d/%d - Loss: %.6f - Time %.2f sec" % (
                        itr, n_iter, loss, duration)
                    if valid_tuples is not None:
                        valid_ll, valid_rmse, calib = self.eval_datasets(
                            valid_tuples)
                        message += (" - Valid-LL: %.3f - Valid-RMSE: %.3f"
                                    " - Calib-Err %.3f" % (
                                        valid_ll, valid_rmse, calib))
                    if verbose:
                        self.logger.info(message)
        finally:
            # an interrupted fused run must not leave self.posterior stale
            # relative to _step_count (state_dict/predict read it)
            if use_fused and getattr(self, "_fused_dirty", False):
                self._fused_sync(self._step_count)

        self.fitted = True
        return float("nan") if dev_loss is None else float(dev_loss)

    # ---------------------------------------------------------------- predict
    def _build_predict_fn(self):
        cfg, hyper_prior = self.cfg, self.hyper_prior

        @functools.partial(jax.jit, static_argnames=("n_samples",))
        def predict_bayes(post, key, x_context, y_context, x_test, n_samples):
            samples = posterior_rsample(post, key, n_samples)

            def one(flat):
                params = hyper_prior.unravel(flat)
                return gp_predict(cfg, params, x_context, y_context, x_test)

            means, covs = jax.vmap(one)(samples)
            return means, covs

        @jax.jit
        def predict_map(post, x_context, y_context, x_test):
            params = hyper_prior.unravel(post["loc"])
            return gp_predict(cfg, params, x_context, y_context, x_test)

        return predict_bayes, predict_map

    def _build_batch_eval_fn(self, n_posterior_samples=100):
        cfg, hyper_prior = self.cfg, self.hyper_prior
        from meta_learning_pacoh_tpu.ops.metrics import mixture_eval_metrics

        @jax.jit
        def batch_eval(post, key, CX, CY, TX, TY, y_mean, y_std):
            # one shared set of posterior samples across all eval tasks
            samples = posterior_rsample(post, key, n_posterior_samples)

            def one(cx, cy, tx, ty):
                def per_sample(flat):
                    params = hyper_prior.unravel(flat)
                    return gp_predict(cfg, params, cx, cy, tx)

                means, covs = jax.vmap(per_sample)(samples)
                return mixture_eval_metrics(means, covs, ty, y_mean, y_std)

            # lax.map over tasks: compile cost is T-independent
            return jax.lax.map(lambda args: one(*args), (CX, CY, TX, TY))

        return batch_eval

    def _run_batch_eval(self, CX, CY, TX, TY):
        return self._batch_eval_fn(
            self.posterior, self._next_key(), CX, CY, TX, TY,
            float(self.y_mean[0]), float(self.y_std[0]),
        )

    def predict(self, context_x, context_y, test_x, n_posterior_samples=100,
                mode="Bayes", return_density=False):
        assert mode in ["bayes", "Bayes", "MAP", "map"]
        context_x, context_y = handle_input_dim(context_x, context_y)
        test_x = handle_input_dim(test_x)
        assert test_x.shape[1] == context_x.shape[1]

        ctx_x, ctx_y = self._prepare_data_per_task(context_x, context_y)
        test_xn = jnp.asarray(self._normalize_x(test_x))

        predict_bayes, predict_map = self._predict_fn
        if mode.lower() == "bayes":
            means, covs = predict_bayes(
                self.posterior, self._next_key(), ctx_x, ctx_y, test_xn,
                n_posterior_samples,
            )
            base = MultivariateNormal(means, covs)
            pred_dist = EqualWeightedMixture(
                AffineTransformed(base, self.y_mean[0], self.y_std[0])
            )
        else:
            mean, cov = predict_map(self.posterior, ctx_x, ctx_y, test_xn)
            pred_dist = AffineTransformed(
                MultivariateNormal(mean, cov), self.y_mean[0], self.y_std[0]
            )
        if return_density:
            return pred_dist
        return np.asarray(pred_dist.mean), np.asarray(pred_dist.stddev)

    def _vectorize_pred_dist(self, pred_dist):
        if isinstance(pred_dist, EqualWeightedMixture):
            base = pred_dist.base
            return EqualWeightedMixture(Normal(base.mean, base.stddev))
        return Normal(pred_dist.mean, pred_dist.stddev)

    # ------------------------------------------------------------- checkpoint
    def state_dict(self):
        return {
            "posterior": jax.tree.map(np.asarray, self.posterior),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "step": self._step_count,
        }

    def load_state_dict(self, state_dict):
        self.posterior = jax.tree.map(jnp.asarray, state_dict["posterior"])
        self.opt_state = jax.tree.map(jnp.asarray, state_dict["opt_state"])
        self._step_count = state_dict.get("step", 0)
        self._fused = None  # repack from the restored state on next fit
