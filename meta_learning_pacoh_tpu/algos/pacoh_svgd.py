"""PACOH-SVGD: Stein Variational Gradient Descent on the PAC-optimal hyper-posterior.

Algorithmic parity with the reference `GPRegressionMetaLearnedSVGD`
(reference: meta_learn/GPR_meta_svgd.py + meta_learn/svgd.py): K particles in
GP-prior parameter space, score = grad log(hyper-prior^prior_factor * product
of task MLLs), kernelized SVGD transport through an Adam/SGD optimizer fed
-phi as the gradient.

TPU-first design deltas:
- A particle is a flat f32 vector; the score is one `jax.grad` of the
  vmapped-over-(particles x tasks) masked GP MLL — no `deepcopy` of a
  mutable GP per evaluation (reference: random_gp.py:166-169) and no autograd
  through the Stein kernel (phi's kernel term is analytic, ops/svgd.py).
- The whole SVGD step (task sampling, K x T batched Cholesky MLLs, score,
  pairwise kernel, Adam update) is one jitted function `lax.scan`ned over
  `log_period` iterations per host call.
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
    make_hyper_prior,
    meta_log_prob,
    random_gp_config,
)
from meta_learning_pacoh_tpu.ops.distributions import (
    AffineTransformed,
    EqualWeightedMixture,
    MultivariateNormal,
    Normal,
)
from meta_learning_pacoh_tpu.ops.svgd import svgd_phi
from meta_learning_pacoh_tpu.utils.input_handling import handle_input_dim
from meta_learning_pacoh_tpu.utils.jit_cache import shared


class GPRegressionMetaLearnedSVGD(RegressionModelMetaLearned):

    def __init__(self, meta_train_data, num_iter_fit=10000, feature_dim=1,
                 prior_factor=0.01, weight_prior_std=0.5, bias_prior_std=3.0,
                 covar_module="NN", mean_module="NN", mean_nn_layers=(32, 32),
                 kernel_nn_layers=(32, 32), optimizer="Adam", lr=1e-3, lr_decay=1.0,
                 kernel="RBF", bandwidth=None, num_particles=10, task_batch_size=-1,
                 normalize_data=True, random_seed=None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'task' axis — full-batch
        training shards the meta-task tensor across devices (data parallel
        over tasks; requires task_batch_size=-1)."""
        super().__init__(normalize_data, random_seed)

        assert mean_module in ["NN", "constant"]
        assert covar_module in ["NN", "SE"]
        assert optimizer in ["Adam", "SGD"]
        assert kernel in ["RBF", "IMQ"]

        self.num_iter_fit = num_iter_fit
        self.prior_factor = prior_factor
        self.num_particles = num_particles
        self.svgd_kernel, self.bandwidth = kernel, bandwidth
        self._optimizer_name, self._lr, self._lr_decay = optimizer, lr, lr_decay
        self._weight_prior_std, self._bias_prior_std = weight_prior_std, bias_prior_std

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
        self.particles = self.hyper_prior.sample(self._next_key(), (num_particles,))
        self._train_key = self._next_key()

        def build_opt():
            schedule = make_lr_schedule(lr, lr_decay)
            return optax.adam(schedule) if optimizer == "Adam" else optax.sgd(schedule)

        # jit functions are memoized on their full static config so learner
        # instances with identical configs share XLA compile caches
        hp_key = (self.cfg, weight_prior_std, bias_prior_std)
        from meta_learning_pacoh_tpu.ops.pallas import launch_sched

        opt_key = (optimizer, lr, lr_decay, launch_sched.LR_TRANSITION_STEPS)
        self._opt = shared(("pacoh_svgd.opt",) + opt_key, build_opt)
        self.opt_state = self._opt.init(self.particles)

        self._step_fn = shared(
            ("pacoh_svgd.step",) + hp_key + opt_key
            + (prior_factor, kernel, bandwidth, self.task_batch_size,
               self.n_tasks, self._weight_by_counts()),
            self._build_step_fn,
        )
        self._predict_fn = shared(
            ("pacoh_svgd.predict",) + hp_key, self._build_predict_fn
        )
        self._batch_eval_fn = shared(
            ("pacoh_svgd.batch_eval",) + hp_key, self._build_batch_eval_fn
        )
        self._step_count = 0
        self._fused = None  # lazily-built Pallas mega-kernel trainer


    # ------------------------------------------------------------- train step
    def _weight_by_counts(self):
        """TPU no-gather sampled task batches: weight the full-batch task
        MLLs by the sampled multiplicities instead of gathering (same
        randint draws, same estimator — models/random_gp.meta_log_prob
        counts=; rationale as algos/pacoh_map._weight_by_counts). CPU keeps
        the gather (golden-stable). PACOH_TPU_SVGD_WEIGHTED=0/1 overrides."""
        from meta_learning_pacoh_tpu.config import _env_flag

        if self.task_batch_size == self.n_tasks:
            return False
        return _env_flag("PACOH_TPU_SVGD_WEIGHTED",
                         default=jax.default_backend() == "tpu")

    def _build_step_fn(self):
        hyper_prior, prior_factor = self.hyper_prior, self.prior_factor
        kernel, bandwidth = self.svgd_kernel, self.bandwidth
        n_tasks, batch_size = self.n_tasks, self.task_batch_size
        full_batch = batch_size == n_tasks
        weight_by_counts = self._weight_by_counts()
        opt = self._opt

        def single_step(carry, key_X_Y_M, pf, bw):
            key, X, Y, M = key_X_Y_M
            particles, opt_state = carry
            counts = None
            if full_batch:
                # no task subsampling: the task axis stays contiguous, so a
                # mesh-sharded [T, N, D] shards cleanly across chips (the
                # per-task MLL sum becomes an XLA psum over the task axis)
                xb, yb, mb = X, Y, M
            elif weight_by_counts:
                idx = jax.random.randint(key, (batch_size,), 0, n_tasks)
                counts = jnp.sum(jax.nn.one_hot(idx, n_tasks, dtype=X.dtype),
                                 axis=0)
                xb, yb, mb = X, Y, M
            else:
                idx = jax.random.randint(key, (batch_size,), 0, n_tasks)
                xb, yb, mb = X[idx], Y[idx], M[idx]

            def total_log_prob(p):
                return jnp.sum(meta_log_prob(hyper_prior, pf, p,
                                             xb, yb, mb, counts=counts))

            score = jax.grad(total_log_prob)(particles)  # [K, P]
            phi = svgd_phi(particles, score, kernel=kernel, bandwidth=bw)
            updates, opt_state = opt.update(-phi, opt_state, particles)
            particles = optax.apply_updates(particles, updates)
            return (particles, opt_state), jnp.mean(jnp.abs(phi))

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(particles, opt_state, X, Y, M, base_key, start_step,
                      n_steps, pf=None, bw=None):
            # pf / bw: optional TRACED overrides of prior_factor / bandwidth
            # (utils/tuning_parallel vmaps trials over them); None keeps the
            # constructor value as a compile-time constant.
            pf = prior_factor if pf is None else pf
            bw = bandwidth if bw is None else bw
            steps = start_step + jnp.arange(n_steps)
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(steps)

            def body(carry, key):
                return single_step(carry, (key, X, Y, M), pf, bw)

            (particles, opt_state), phis = jax.lax.scan(
                body, (particles, opt_state), keys
            )
            return particles, opt_state, phis

        return run_chunk

    # ------------------------------------------------ fused-kernel fast path
    def _fused_path_ok(self):
        """Whether the single-launch Pallas training kernel applies.

        The mega-kernel (ops/pallas/fused_train_kernel.py) covers the
        flagship configuration: NN mean + NN kernel with one shared hidden
        width, feature_dim 1, full task batch, RBF median-heuristic SVGD,
        Adam (any lr_decay), N within the unrolled-linalg window. Everything
        else uses the general scan-fused XLA step.
        """
        from meta_learning_pacoh_tpu import config

        import numpy as np

        cfg = self.cfg
        hidden = tuple(cfg.mean_nn_layers)
        sizes = np.asarray(jnp.sum(self.mask, axis=-1))
        return (
            config.fused_enabled()
            and self._mesh is None
            # full batch, or sampled batches via count-weighted pages
            # (uniform task sizes keep the harmonic-mean pre-factor a
            # per-launch constant inside the kernel)
            and (self.task_batch_size == self.n_tasks
                 or (self._weight_by_counts()
                     and bool(np.all(sizes == sizes[0]))))
            and self.svgd_kernel == "RBF" and self.bandwidth is None
            # lr_decay < 1: staircase-aligned launches, runtime lr scalar
            # (ops/pallas/launch_sched.py)
            and self._optimizer_name == "Adam"
            and cfg.mean_module == "NN" and cfg.covar_module == "NN"
            and cfg.feature_dim == 1
            and hidden == tuple(cfg.kernel_nn_layers)
            and len(set(hidden)) == 1 and len(hidden) >= 1
            and self.num_particles * hidden[0] <= 1024  # VMEM-resident state
            # N <= 8: entry-wise unrolled linalg; 9..256: the big-N blocked
            # mega-kernel (ops/pallas/fused_svgd_bign_kernel.py)
            and (self.X.shape[1] <= 8
                 or self._bign_fits())
            and hasattr(self.opt_state[0], "mu")
        )

    def _bign_fits(self):
        from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import (
            svgd_bign_fits,
            svgd_bign_wins,
        )

        return svgd_bign_wins() and svgd_bign_fits(
            self.num_particles, self.X.shape[0], self.X.shape[1])

    def _fused_run_chunk(self, chunk):
        from meta_learning_pacoh_tpu import config
        from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
            FusedSVGDTrainer,
            pack_state,
        )
        from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import (
            FusedSVGDBigNTrainer,
        )

        trainer_cls = (FusedSVGDTrainer if self.X.shape[1] <= 8
                       else FusedSVGDBigNTrainer)
        hidden = tuple(self.cfg.mean_nn_layers)
        if self._fused is None:
            self._fused = trainer_cls(
                self.hyper_prior, self.particles, self.X, self.Y, self.mask,
                hidden=hidden, lr=self._lr, lr_decay=self._lr_decay,
                prior_factor=self.prior_factor,
                weight_prior_std=self._weight_prior_std,
                bias_prior_std=self._bias_prior_std,
                task_batch_size=self.task_batch_size,
                base_key=self._train_key,
                interpret=config.pallas_interpret(),
            )
            if self._step_count > 0:  # resume: carry the live Adam moments
                adam = self.opt_state[0]
                self._fused.m = pack_state(self.hyper_prior, adam.mu, hidden)
                self._fused.v = pack_state(self.hyper_prior, adam.nu, hidden)
        self._fused.run(chunk, self._step_count)

    def _fused_sync(self, total_steps):
        """Unpack the kernel-resident state into the canonical learner state
        (predict/eval/state_dict read self.particles / self.opt_state)."""
        self._fused_dirty = False
        self.particles, mu, nu = self._fused.sync()
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import bump_counts

        adam = self.opt_state[0]._replace(
            count=jnp.asarray(total_steps, jnp.int32), mu=mu, nu=nu
        )
        self.opt_state = (adam,) + bump_counts(self.opt_state[1:], total_steps)

    def meta_fit(self, valid_tuples=None, verbose=True, log_period=500, n_iter=None):
        """Fits the hyper-posterior particles with SVGD."""
        assert (valid_tuples is None) or all(len(t) == 4 for t in valid_tuples)
        if n_iter is None:
            n_iter = self.num_iter_fit

        use_fused = self._fused_path_ok()
        # per-chunk fences cost a 10-30 ms tunnel round trip each; only pay
        # them when the chunk's wall-clock message is actually consumed
        want_metrics = verbose or (valid_tuples is not None)
        t = time.time()
        remaining, itr = n_iter, 0
        try:
            while remaining > 0:
                chunk = int(min(log_period, remaining))
                if use_fused:
                    self._fused_run_chunk(chunk)
                    self._step_count += chunk
                    self._fused_dirty = True
                    # sync the canonical state lazily: only when this chunk's
                    # metrics are actually read (or once, after the last
                    # chunk); the finally-clause syncs on abnormal exits
                    if valid_tuples is not None or remaining <= chunk:
                        self._fused_sync(self._step_count)
                    if want_metrics:
                        # fence on the kernel-resident state (self.particles
                        # may be a ready stale array between lazy syncs)
                        self._fused.packed["nz"].block_until_ready()
                else:
                    self.particles, self.opt_state, _ = self._step_fn(
                        self.particles, self.opt_state, self.X, self.Y,
                        self.mask, self._train_key, self._step_count, chunk
                    )
                    if want_metrics:
                        self.particles.block_until_ready()
                    self._step_count += chunk
                remaining -= chunk
                itr += chunk

                if want_metrics:
                    duration = time.time() - t
                    t = time.time()
                    message = "Iter %d/%d - Time %.2f sec" % (
                        itr, n_iter, duration)
                    if valid_tuples is not None:
                        valid_ll, valid_rmse, calib = self.eval_datasets(
                            valid_tuples)
                        message += (" - Valid-LL: %.3f - Valid-RMSE: %.3f"
                                    " - Calib-Err %.3f"
                                    % (valid_ll, valid_rmse, calib))
                    if verbose:
                        self.logger.info(message)
        finally:
            # an interrupted fused run must not leave self.particles stale
            # relative to _step_count (state_dict/predict read them)
            if use_fused and getattr(self, "_fused_dirty", False):
                self._fused_sync(self._step_count)

        self.fitted = True

    # ---------------------------------------------------------------- predict
    def _build_predict_fn(self):
        cfg, hyper_prior = self.cfg, self.hyper_prior

        @jax.jit
        def predict_fn(particles, x_context, y_context, x_test):
            def one(flat):
                params = hyper_prior.unravel(flat)
                return gp_predict(cfg, params, x_context, y_context, x_test)

            means, covs = jax.vmap(one)(particles)
            return means, covs  # [K, Nt], [K, Nt, Nt]

        return predict_fn

    def _build_batch_eval_fn(self):
        cfg, hyper_prior = self.cfg, self.hyper_prior
        from meta_learning_pacoh_tpu.ops.metrics import mixture_eval_metrics

        @jax.jit
        def batch_eval(particles, CX, CY, TX, TY, y_mean, y_std):
            def one(cx, cy, tx, ty):
                def per_particle(flat):
                    params = hyper_prior.unravel(flat)
                    return gp_predict(cfg, params, cx, cy, tx)

                means, covs = jax.vmap(per_particle)(particles)
                return mixture_eval_metrics(means, covs, ty, y_mean, y_std)

            # lax.map over tasks: compile cost is T-independent (one body),
            # unlike vmap which inlines all T tasks into one giant XLA graph
            return jax.lax.map(lambda args: one(*args), (CX, CY, TX, TY))

        return batch_eval

    def _run_batch_eval(self, CX, CY, TX, TY):
        return self._batch_eval_fn(
            self.particles, CX, CY, TX, TY,
            float(self.y_mean[0]), float(self.y_std[0]),
        )

    def predict(self, context_x, context_y, test_x, return_density=False):
        """Mixture-over-particles posterior predictive, in original y units."""
        context_x, context_y = handle_input_dim(context_x, context_y)
        test_x = handle_input_dim(test_x)
        assert test_x.shape[1] == context_x.shape[1]

        ctx_x, ctx_y = self._prepare_data_per_task(context_x, context_y)
        test_xn = jnp.asarray(self._normalize_x(test_x))

        means, covs = self._predict_fn(self.particles, ctx_x, ctx_y, test_xn)
        base = MultivariateNormal(means, covs)
        pred_dist = EqualWeightedMixture(
            AffineTransformed(base, self.y_mean[0], self.y_std[0])
        )
        if return_density:
            return pred_dist
        return np.asarray(pred_dist.mean), np.asarray(pred_dist.stddev)

    def _vectorize_pred_dist(self, pred_dist):
        # mixture of per-point Normals (reference: GPR_meta_svgd.py:232-235)
        base = pred_dist.base
        return EqualWeightedMixture(Normal(base.mean, base.stddev))

    # ------------------------------------------------------------- checkpoint
    def state_dict(self):
        return {
            "particles": np.asarray(self.particles),
            "opt_state": jax.tree.map(np.asarray, self.opt_state),
            "step": self._step_count,
        }

    def load_state_dict(self, state_dict):
        self.particles = jnp.asarray(state_dict["particles"])
        self.opt_state = jax.tree.map(jnp.asarray, state_dict["opt_state"])
        self._step_count = state_dict.get("step", 0)
        self._fused = None  # repack from the restored state on next fit
