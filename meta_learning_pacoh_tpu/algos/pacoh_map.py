"""PACOH-MAP: meta-learning a shared GP prior by weight-decayed summed MLL.

Algorithmic parity with the reference `GPRegressionMetaLearned`
(reference: meta_learn/GPR_meta_mll.py): shared NN mean / NN-feature kernel /
likelihood noise trained by AdamW (weight decay = meta-regularization) on the
negative sum of per-task exact MLLs over a sampled task batch; meta-test
prediction conditions a fresh GP posterior on the context set.

TPU-first design deltas:
- All tasks live in one padded [T, N, D] tensor; the per-task MLL is `vmap`ed
  and the whole training step (task sampling + loss + grad + AdamW update) is
  one jitted function, `lax.scan`ned over `log_period` steps per host call —
  the reference pays Python/optimizer overhead every iteration
  (GPR_meta_mll.py:104-117).
- learning_mode freezes parameter groups via an optax update mask instead of
  building optimizer param groups (GPR_meta_mll.py:207-251).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.algos.base import RegressionModelMetaLearned
from meta_learning_pacoh_tpu.models.gp_base import (
    GPConfig,
    init_gp_params,
    gp_prior_mll,
    gp_prior_mll_batch,
    gp_predict,
)
from meta_learning_pacoh_tpu.ops.distributions import (
    AffineTransformed,
    MultivariateNormal,
    Normal,
)
from meta_learning_pacoh_tpu.utils.input_handling import handle_input_dim
from meta_learning_pacoh_tpu.utils.jit_cache import shared


def make_lr_schedule(lr, lr_decay):
    if lr_decay < 1.0:
        # StepLR with step_size=1000 (reference: GPR_meta_mll.py:261-262).
        # The transition constant lives in launch_sched so the fused kernels'
        # staircase launch splitting stays in lockstep with the XLA schedule
        # (tests shrink it to exercise boundary crossings cheaply).
        from meta_learning_pacoh_tpu.ops.pallas import launch_sched

        return optax.exponential_decay(
            init_value=lr,
            transition_steps=launch_sched.LR_TRANSITION_STEPS,
            decay_rate=lr_decay, staircase=True,
        )
    return lr


class GPRegressionMetaLearned(RegressionModelMetaLearned):

    def __init__(self, meta_train_data, learning_mode="both", lr_params=1e-3,
                 weight_decay=0.0, feature_dim=2, num_iter_fit=10000,
                 covar_module="NN", mean_module="NN", mean_nn_layers=(32, 32),
                 kernel_nn_layers=(32, 32), task_batch_size=5, normalize_data=True,
                 optimizer="Adam", lr_decay=1.0, random_seed=None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'task' axis — requires
        task_batch_size=-1 (full batch); shards the meta-task tensor so the
        per-task MLL sum reduces with an XLA psum across devices."""
        super().__init__(normalize_data, random_seed)

        from meta_learning_pacoh_tpu.models.modules import KernelModule, MeanModule

        assert learning_mode in ["learn_mean", "learn_kernel", "both", "vanilla"]
        # user-supplied module instances are accepted next to the string
        # shorthands, matching the reference (GPR_meta_mll.py:42)
        assert mean_module in ["NN", "constant", "zero"] or isinstance(
            mean_module, MeanModule
        )
        assert covar_module in ["NN", "SE"] or isinstance(
            covar_module, KernelModule
        )
        assert optimizer in ["Adam", "SGD"]
        if covar_module == "NN":
            assert learning_mode in ["learn_kernel", "both"], "kernel NN must be learned"
        if mean_module == "NN":
            assert learning_mode in ["learn_mean", "both"], "mean NN must be learned"

        self.lr_params, self.weight_decay = lr_params, weight_decay
        self.num_iter_fit = num_iter_fit
        self.task_batch_size = task_batch_size
        self.learning_mode = learning_mode
        self._optimizer_name, self._lr_decay = optimizer, lr_decay

        self._check_and_set_dims(meta_train_data)
        self._compute_normalization_stats(meta_train_data)
        self.X, self.Y, self.mask = self._prepare_meta_data(meta_train_data)
        self.n_tasks = self.X.shape[0]
        if task_batch_size < 0:
            self.task_batch_size = task_batch_size = self.n_tasks

        self._mesh = mesh
        self._dist_linalg = None
        if mesh is not None:
            assert task_batch_size == self.n_tasks, (
                "mesh-sharded training requires task_batch_size=-1 (full batch)"
            )
            from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
                BLOCKED_MAX_N,
            )

            if self.X.shape[1] > BLOCKED_MAX_N and "task" in mesh.axis_names:
                # Large-N regime: the O(N^3) per-task Cholesky dwarfs the
                # cross-task sum, so instead of spreading TASKS over devices
                # (DP), every device cooperates on ONE Gram factorization at
                # a time — block rows sharded over the 'task' mesh axis via
                # parallel/dist_chol.py (SURVEY.md §5 long-context row; the
                # N x N system is the analog of the exact-MLL Cholesky inside
                # reference meta_learn/models.py:505-519). Task tensors stay
                # replicated.
                self._dist_linalg = (mesh, "task", 128, BLOCKED_MAX_N + 1)
            else:
                from meta_learning_pacoh_tpu.parallel.mesh import (
                    shard_task_batch,
                )

                self.X, self.Y, self.mask = shard_task_batch(
                    mesh, self.X, self.Y, self.mask
                )

        self.cfg = GPConfig(
            input_dim=self.input_dim,
            feature_dim=feature_dim,
            mean_module=mean_module,
            covar_module=covar_module,
            mean_nn_layers=tuple(mean_nn_layers),
            kernel_nn_layers=tuple(kernel_nn_layers),
            has_outputscale=True,
            noise_floor=1e-3,
            init_scheme="torch_linear",
        )
        self.params = init_gp_params(self.cfg, self._next_key())
        # Fixed base key for training: step i always uses fold_in(key, i), so
        # the run is bit-identical regardless of log_period chunking (the
        # reference's determinism contract, tests/test_GPR.py:173-187).
        self._train_key = self._next_key()
        # jit functions are memoized on their full static config so learner
        # instances with identical configs share XLA compile caches
        from meta_learning_pacoh_tpu.ops.pallas import launch_sched

        opt_key = (self.cfg, learning_mode, optimizer, lr_params, lr_decay,
                   launch_sched.LR_TRANSITION_STEPS, weight_decay)
        self._setup_optimizer(optimizer, lr_params, lr_decay, opt_key)
        self._step_fn = shared(
            ("pacoh_map.step",) + opt_key
            + (self.task_batch_size, self.n_tasks, self._weight_by_counts(),
               self._dist_linalg),
            self._build_step_fn,
        )
        self._predict_fn = shared(
            ("pacoh_map.predict", self.cfg), self._build_predict_fn
        )
        self._batch_eval_fn = shared(
            ("pacoh_map.batch_eval", self.cfg), self._build_batch_eval_fn
        )
        self._step_count = 0
        self._fused = None  # lazily-built Pallas mega-kernel trainer

    # ------------------------------------------------------------------ setup

    def _trainable_mask(self):
        """Which parameter groups receive updates, per learning_mode
        (reference: GPR_meta_mll.py:207-251; likelihood noise always trains)."""
        mode = self.learning_mode
        learn_kernel = mode in ("learn_kernel", "both")
        learn_mean = mode in ("learn_mean", "both")

        def leaf_mask(name):
            if name == "noise_raw":
                return True
            if name in ("lengthscale_raw", "outputscale_raw", "custom_kernel"):
                return learn_kernel
            if name == "custom_mean":
                return learn_mean
            if name == "kernel_nn":
                return learn_kernel
            if name in ("mean_nn", "constant_mean"):
                return learn_mean
            return False

        labels = {}
        for name, leaf in self.params.items():
            label = "train" if leaf_mask(name) else "freeze"
            labels[name] = (
                jax.tree.map(lambda _: label, leaf) if isinstance(leaf, dict) else label
            )
        return labels

    def _setup_optimizer(self, optimizer, lr, lr_decay, opt_key):
        def build():
            schedule = make_lr_schedule(lr, lr_decay)
            if optimizer == "Adam":
                # torch.optim.AdamW(groups, lr, weight_decay=wd): every group
                # decays (reference: GPR_meta_mll.py:255)
                base = optax.adamw(schedule, weight_decay=self.weight_decay)
            else:
                base = optax.sgd(schedule)
            return optax.multi_transform(
                {"train": base, "freeze": optax.set_to_zero()},
                self._trainable_mask(),
            )

        self._opt = shared(("pacoh_map.opt",) + opt_key, build)
        self.opt_state = self._opt.init(self.params)

    # ------------------------------------------------------------- train step
    def _weight_by_counts(self):
        """On TPU, gathering the sampled task batch costs more than just
        computing every task's MLL (dynamic gathers lay out poorly; the
        batched MLL rides the fused lane kernel): weight the full-batch MLL
        vector by the sampled multiplicities instead. Same randint draws,
        same estimator, bit-identical expectation — only float association
        differs (measured on v5e, sin_20 batch 5: 40.8 vs 60.6 us/iter).
        CPU keeps the gather (cheaper there, golden-stable).
        PACOH_TPU_MAP_WEIGHTED=0/1 overrides."""
        from meta_learning_pacoh_tpu.config import _env_flag

        if self.task_batch_size == self.n_tasks:
            return False
        return _env_flag("PACOH_TPU_MAP_WEIGHTED",
                         default=jax.default_backend() == "tpu")

    def _build_step_fn(self):
        import contextlib

        from meta_learning_pacoh_tpu.ops import gp as gp_ops

        cfg = self.cfg
        batch_size = self.task_batch_size
        opt = self._opt
        n_tasks = self.n_tasks
        dist_linalg = self._dist_linalg

        full_batch = batch_size == n_tasks
        weight_by_counts = self._weight_by_counts()

        def dist_ctx():
            # distributed-linalg dispatch happens at TRACE time, so the
            # context wraps the loss/grad construction inside the jit
            if dist_linalg is None:
                return contextlib.nullcontext()
            mesh, axis, block, min_n = dist_linalg
            return gp_ops.distributed_linalg(mesh, axis, block, min_n)

        def single_step(carry, key_X_Y_M):
            key, X, Y, M = key_X_Y_M
            params, opt_state = carry
            counts = None
            if full_batch:
                # contiguous task axis -> shards cleanly over a 'task' mesh
                xb, yb, mb = X, Y, M
            elif weight_by_counts:
                idx = jax.random.randint(key, (batch_size,), 0, n_tasks)
                counts = jnp.sum(jax.nn.one_hot(idx, n_tasks, dtype=X.dtype),
                                 axis=0)
                xb, yb, mb = X, Y, M
            else:
                idx = jax.random.randint(key, (batch_size,), 0, n_tasks)
                xb, yb, mb = X[idx], Y[idx], M[idx]

            def loss_fn(p):
                lls = gp_prior_mll_batch(cfg, p, xb, yb, mb)
                if counts is not None:
                    # Mask rather than multiply: a NaN/Inf MLL from a task
                    # that was never sampled this step (count 0) must not
                    # poison the loss via 0*NaN=NaN — the gather path would
                    # be unaffected by such a task, so this one must be too.
                    lls = jnp.where(counts > 0,
                                    counts * jnp.where(counts > 0, lls, 0.0),
                                    0.0)
                return -jnp.sum(lls)

            with dist_ctx():
                loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, opt_state, X, Y, M, base_key, start_step, n_steps):
            steps = start_step + jnp.arange(n_steps)
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(steps)

            def body(carry, key):
                return single_step(carry, (key, X, Y, M))

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), keys
            )
            return params, opt_state, losses

        return run_chunk

    # ------------------------------------------------ fused-kernel fast path
    def _fused_path_ok(self):
        """Whether the single-launch Pallas training kernel applies.

        Two mega-kernels cover the NN/NN + learning_mode 'both' + Adam(W)
        configs (full or count-weighted sampled task batches, any staircase
        lr_decay): the entry-tile kernel for N <= 8
        (ops/pallas/fused_map_kernel.py) and the blocked-linalg kernel for
        9 <= N <= 512 (ops/pallas/fused_map_bign_kernel.py — the
        Swissfel/Physionet-shaped window). Everything else uses the general
        scan-fused XLA step.
        """
        from meta_learning_pacoh_tpu import config

        cfg = self.cfg
        try:  # optax multi_transform(adamw) state the kernel can carry
            train = self.opt_state.inner_states["train"]
            has_adam = hasattr(train.inner_state[0], "mu")
        except (AttributeError, KeyError, TypeError):
            return False
        if not (
            config.fused_enabled()
            and self._mesh is None
            # full batch, or sampled batches via the count-weighted pages
            # (the kernel mirrors _weight_by_counts; gather-mode stays XLA
            # so the golden CPU trajectories are untouched)
            and (self.task_batch_size == self.n_tasks
                 or self._weight_by_counts())
            and self.learning_mode == "both"
            # lr_decay < 1 (staircase StepLR) is handled host-side: launches
            # are split at staircase boundaries and the per-launch lr rides
            # the existing runtime scalar (ops/pallas/launch_sched.py)
            and self._optimizer_name == "Adam"
            and cfg.mean_module == "NN" and cfg.covar_module == "NN"
            and cfg.feature_dim <= 8
            and has_adam
        ):
            return False
        if self.X.shape[1] <= 8:  # unrolled-linalg window (ops/gp.py)
            return self.X.shape[0] * self.X.shape[1] <= 2048  # VMEM-resident
        from meta_learning_pacoh_tpu.ops.pallas.fused_map_bign_kernel import (
            bign_fits,
        )

        return (self.X.shape[1] <= 512
                and bign_fits(self.X.shape[0], self.X.shape[1]))

    def _fused_run_chunk(self, chunk):
        from meta_learning_pacoh_tpu import config
        from meta_learning_pacoh_tpu.ops.pallas.fused_map_kernel import (
            FusedMAPTrainer,
            pack_state,
        )
        from meta_learning_pacoh_tpu.ops.pallas.fused_map_bign_kernel import (
            FusedMAPBigNTrainer,
        )

        trainer_cls = (FusedMAPTrainer if self.X.shape[1] <= 8
                       else FusedMAPBigNTrainer)
        if self._fused is None:
            self._fused = trainer_cls(
                self.params, self.X, self.Y, self.mask,
                feature_dim=self.cfg.feature_dim,
                mean_hidden=self.cfg.mean_nn_layers,
                kernel_hidden=self.cfg.kernel_nn_layers,
                lr=self.lr_params, lr_decay=self._lr_decay,
                weight_decay=self.weight_decay,
                noise_floor=self.cfg.noise_floor,
                task_batch_size=self.task_batch_size,
                base_key=self._train_key,
                interpret=config.pallas_interpret(),
            )
            if self._step_count > 0:  # resume: carry the live Adam moments
                adam = self.opt_state.inner_states["train"].inner_state[0]
                mh, kh = self.cfg.mean_nn_layers, self.cfg.kernel_nn_layers
                self._fused.m = pack_state(adam.mu, mh, kh)
                self._fused.v = pack_state(adam.nu, mh, kh)
        self._fused.run(chunk, self._step_count)

    def _fused_sync(self, total_steps):
        """Unpack the kernel-resident state into the canonical learner state
        (predict/eval/state_dict read self.params / self.opt_state)."""
        self._fused_dirty = False
        self.params, mu, nu = self._fused.sync()
        train = self.opt_state.inner_states["train"]
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import bump_counts

        adam = train.inner_state[0]._replace(
            count=jnp.asarray(total_steps, jnp.int32), mu=mu, nu=nu
        )
        # with an lr schedule the chain carries a ScaleByScheduleState whose
        # count feeds the schedule — stamp it too or a fused->XLA continuation
        # resumes at the wrong lr
        new_inner = (adam,) + bump_counts(train.inner_state[1:], total_steps)
        states = dict(self.opt_state.inner_states)
        states["train"] = train._replace(inner_state=new_inner)
        self.opt_state = self.opt_state._replace(inner_states=states)

    def meta_fit(self, valid_tuples=None, verbose=True, log_period=500, n_iter=None):
        """Meta-learns the GP prior parameters. Returns the last loss."""
        assert (valid_tuples is None) or all(len(t) == 4 for t in valid_tuples)
        if n_iter is None:
            n_iter = self.num_iter_fit

        import time

        use_fused = self._fused_path_ok()
        # device->host loss readbacks fence the pipeline; over the tunneled
        # TPU runtime each costs 10-30 ms. Only pay per-chunk when the
        # metrics are actually consumed (log message / validation); otherwise
        # keep device handles and read the final loss ONCE after the loop.
        want_metrics = verbose or (valid_tuples is not None)
        t = time.time()
        dev_loss = None
        remaining = n_iter
        itr = 0
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
                    dev_loss = self._fused.last_loss
                    remaining -= chunk
                    itr += chunk
                    if want_metrics:
                        avg_loss = float(self._fused.avg_loss)
                else:
                    self.params, self.opt_state, losses = self._step_fn(
                        self.params, self.opt_state, self.X, self.Y, self.mask,
                        self._train_key, self._step_count, chunk
                    )
                    remaining -= chunk
                    itr += chunk
                    self._step_count += chunk
                    dev_loss = losses[-1]
                    if want_metrics:
                        avg_loss = float(jnp.mean(losses))

                if want_metrics:
                    duration = time.time() - t
                    t = time.time()
                    message = "Iter %d/%d - Loss: %.6f - Time %.2f sec" % (
                        itr, n_iter, avg_loss, duration,
                    )
                    if valid_tuples is not None:
                        valid_ll, valid_rmse, calib = self.eval_datasets(
                            valid_tuples)
                        message += (" - Valid-LL: %.3f - Valid-RMSE: %.3f"
                                    " - Calib-Err %.3f"
                                    % (valid_ll, valid_rmse, calib))
                    if verbose:
                        self.logger.info(message)
        finally:
            # an interrupted fused run must not leave self.params stale
            # relative to _step_count (state_dict/predict read them)
            if use_fused and getattr(self, "_fused_dirty", False):
                self._fused_sync(self._step_count)

        self.fitted = True
        return float("nan") if dev_loss is None else float(dev_loss)

    # ---------------------------------------------------------------- predict
    def _build_predict_fn(self):
        cfg = self.cfg

        @jax.jit
        def predict_fn(params, x_context, y_context, x_test):
            return gp_predict(cfg, params, x_context, y_context, x_test)

        return predict_fn

    def _build_batch_eval_fn(self):
        cfg = self.cfg
        from meta_learning_pacoh_tpu.ops.metrics import gp_eval_metrics

        @jax.jit
        def batch_eval(params, CX, CY, TX, TY, y_mean, y_std):
            def one(cx, cy, tx, ty):
                mean, cov = gp_predict(cfg, params, cx, cy, tx)
                return gp_eval_metrics(mean, cov, ty, y_mean, y_std)

            # lax.map over tasks: compile cost is T-independent (one body),
            # unlike vmap which inlines all T tasks into one giant XLA graph
            return jax.lax.map(lambda args: one(*args), (CX, CY, TX, TY))

        return batch_eval

    def _run_batch_eval(self, CX, CY, TX, TY):
        return self._batch_eval_fn(
            self.params, CX, CY, TX, TY,
            float(self.y_mean[0]), float(self.y_std[0]),
        )

    def predict(self, context_x, context_y, test_x, return_density=False):
        """Posterior-predictive p(y* | x*, context) in original y units."""
        context_x, context_y = handle_input_dim(context_x, context_y)
        test_x = handle_input_dim(test_x)
        assert test_x.shape[1] == context_x.shape[1]

        ctx_x, ctx_y = self._prepare_data_per_task(context_x, context_y)
        test_xn = jnp.asarray(self._normalize_x(test_x))

        mean, cov = self._predict_fn(self.params, ctx_x, ctx_y, test_xn)
        base = MultivariateNormal(mean, cov)
        pred_dist = AffineTransformed(base, self.y_mean[0], self.y_std[0])
        if return_density:
            return pred_dist
        return np.asarray(pred_dist.mean), np.asarray(pred_dist.stddev)

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
