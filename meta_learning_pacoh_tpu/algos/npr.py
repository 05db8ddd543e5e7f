"""Neural Process meta-learner.

Parity with the reference `NPRegressionMetaLearned` (reference:
meta_learn/NPR_meta.py wrapping third_party/neural_processes): per-task ELBO
with context-subset-of-target splits, AdamW meta-optimization, and stochastic
eval-mode prediction with z ~ q(z | context).

Note: the reference constructor swaps `context_split_ratio` and
`weight_decay` when storing them (NPR_meta.py:45 — a bug); here the names
mean what they say.
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.algos.base import RegressionModelMetaLearned
from meta_learning_pacoh_tpu.algos.pacoh_map import make_lr_schedule
from meta_learning_pacoh_tpu.models.neural_process import (
    init_np_params,
    np_elbo_loss,
    np_predict,
)
from meta_learning_pacoh_tpu.ops.distributions import AffineTransformed, Normal
from meta_learning_pacoh_tpu.utils.input_handling import handle_input_dim
from meta_learning_pacoh_tpu.utils.jit_cache import shared


class NPRegressionMetaLearned(RegressionModelMetaLearned):

    def __init__(self, meta_train_data, context_split_ratio=0.5, lr_params=1e-3,
                 r_dim=50, z_dim=50, h_dim=50, num_iter_fit=10000, weight_decay=1e-2,
                 task_batch_size=5, normalize_data=True, optimizer="Adam",
                 lr_decay=1.0, random_seed=None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'task' axis — requires
        task_batch_size=-1 (full batch); shards the meta-task tensors so the
        per-task NP ELBO terms compute on their own devices and the gradient
        reduces with a psum over ICI."""
        super().__init__(normalize_data, random_seed)
        assert optimizer in ["Adam", "SGD"]

        self._check_and_set_dims(meta_train_data)
        self._compute_normalization_stats(meta_train_data)
        X, Y, mask = self._prepare_meta_data(meta_train_data)
        self.X, self.Y, self.mask = X, Y[..., None], mask  # y kept 2-D per point
        self.n_tasks, n_samples = X.shape[0], X.shape[1]
        if task_batch_size < 1:
            task_batch_size = self.n_tasks

        self._mesh = mesh
        if mesh is not None:
            assert task_batch_size == self.n_tasks, (
                "mesh-sharded training requires task_batch_size=-1 (full batch)"
            )
            from meta_learning_pacoh_tpu.parallel.mesh import shard_task_batch

            self.X, self.Y, self.mask = shard_task_batch(
                mesh, self.X, self.Y, self.mask
            )

        # per-task context sizes (tasks may be ragged, reference NPR_meta.py:74-76)
        n_per_task = mask.sum(axis=1)
        self.num_context_per_task = np.ceil(
            context_split_ratio * n_per_task
        ).astype(np.int32)
        self.num_context = int(self.num_context_per_task[0])
        self.num_iter_fit = num_iter_fit
        self.task_batch_size = task_batch_size

        self.params = init_np_params(
            self._next_key(), self.input_dim, self.output_dim,
            r_dim=r_dim, z_dim=z_dim, h_dim=h_dim,
        )
        self._train_key = self._next_key()

        def build_opt():
            schedule = make_lr_schedule(lr_params, lr_decay)
            if optimizer == "Adam":
                return optax.adamw(schedule, weight_decay=weight_decay)
            return optax.sgd(schedule)

        # jit functions are memoized on their full static config so learner
        # instances with identical configs share XLA compile caches.
        # LR_TRANSITION_STEPS is part of the key because make_lr_schedule
        # reads the mutable module constant at build time — tests shrink it.
        from meta_learning_pacoh_tpu.ops.pallas import launch_sched

        opt_key = (optimizer, lr_params, lr_decay, weight_decay,
                   launch_sched.LR_TRANSITION_STEPS)
        self._opt = shared(("npr.opt",) + opt_key, build_opt)
        self.opt_state = self._opt.init(self.params)
        self._step_fn = shared(
            ("npr.step",) + opt_key + (task_batch_size, self.n_tasks),
            self._build_step_fn,
        )
        self._predict_fn = shared(("npr.predict",), lambda: jax.jit(np_predict))
        self._batch_eval_fn = shared(("npr.batch_eval",), self._build_batch_eval_fn)
        self._step_count = 0

    # ------------------------------------------------------------- train step
    def _build_step_fn(self):
        n_tasks, batch_size = self.n_tasks, self.task_batch_size
        opt = self._opt

        full_batch = batch_size == n_tasks

        def single_step(carry, key, X, Y, M, num_context_arr):
            params, opt_state = carry
            k_task, k_split = jax.random.split(key)
            if full_batch:
                # contiguous task axis -> shards cleanly over a 'task' mesh
                xb, yb, mb, ncb = X, Y, M, num_context_arr
            else:
                idx = jax.random.randint(k_task, (batch_size,), 0, n_tasks)
                xb, yb, mb, ncb = X[idx], Y[idx], M[idx], num_context_arr[idx]

            def loss_fn(p):
                keys = jax.random.split(k_split, batch_size)
                losses = jax.vmap(
                    lambda k, x, y, nc, m: np_elbo_loss(p, k, x, y, nc, mask=m)
                )(keys, xb, yb, ncb, mb)
                return jnp.sum(losses)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, opt_state, X, Y, M, num_context_arr, base_key,
                      start_step, n_steps):
            steps = start_step + jnp.arange(n_steps)
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(steps)

            def body(carry, key):
                return single_step(carry, key, X, Y, M, num_context_arr)

            (params, opt_state), losses = jax.lax.scan(
                body, (params, opt_state), keys
            )
            return params, opt_state, losses

        return run_chunk

    def meta_fit(self, valid_tuples=None, verbose=True, log_period=500, n_iter=None):
        assert (valid_tuples is None) or all(len(t) == 4 for t in valid_tuples)
        if n_iter is None:
            n_iter = self.num_iter_fit
        t = time.time()
        loss = float("nan")
        remaining, itr = n_iter, 0
        while remaining > 0:
            chunk = int(min(log_period, remaining))
            self.params, self.opt_state, losses = self._step_fn(
                self.params, self.opt_state, self.X, self.Y,
                jnp.asarray(self.mask), jnp.asarray(self.num_context_per_task),
                self._train_key, self._step_count, chunk
            )
            remaining -= chunk
            itr += chunk
            self._step_count += chunk
            loss = float(losses[-1])

            duration = time.time() - t
            t = time.time()
            message = "Iter %d/%d - Loss: %.6f - Time %.2f sec" % (
                itr, n_iter, float(jnp.mean(losses)), duration,
            )
            if valid_tuples is not None:
                valid_ll, valid_rmse, calib = self.eval_datasets(valid_tuples)
                message += " - Valid-LL: %.3f - Valid-RMSE: %.3f - Calib-Err %.3f" % (
                    valid_ll, valid_rmse, calib,
                )
            if verbose:
                self.logger.info(message)

        self.fitted = True
        return loss

    def _build_batch_eval_fn(self):
        """Whole-test-set NP evaluation in one jitted lax.map. Matches eval()
        semantics: per-point avg log-density (flatten_y=False convention),
        z ~ q(z | context) sampled per task."""
        from meta_learning_pacoh_tpu.ops.metrics import (
            _normal_cdf, calib_error_from_cdf,
        )

        @jax.jit
        def batch_eval(params, key, CX, CY, TX, TY, y_mean, y_std):
            keys = jax.random.split(key, CX.shape[0])

            def one(args):
                k, cx, cy, tx, ty = args
                mu, sigma = np_predict(params, k, cx, cy[:, None], tx)
                mean_o = y_mean + y_std * mu[:, 0]
                std_o = y_std * sigma[:, 0]
                z = (ty - mean_o) / std_o
                lp = -0.5 * (z**2 + jnp.log(2.0 * jnp.pi)) - jnp.log(std_o)
                avg_ll = jnp.mean(lp)
                rmse = jnp.sqrt(jnp.mean((mean_o - ty) ** 2))
                calib = calib_error_from_cdf(_normal_cdf(ty, mean_o, std_o))
                return avg_ll, rmse, calib

            return jax.lax.map(one, (keys, CX, CY, TX, TY))

        return batch_eval

    def _run_batch_eval(self, CX, CY, TX, TY):
        return self._batch_eval_fn(
            self.params, self._next_key(), CX, CY, TX, TY,
            float(self.y_mean[0]), float(self.y_std[0]),
        )

    # ---------------------------------------------------------------- predict
    def predict(self, context_x, context_y, test_x, return_density=False):
        """Stochastic NP prediction (z ~ q(z|context)), original y units."""
        context_x, context_y = handle_input_dim(context_x, context_y)
        test_x = handle_input_dim(test_x)
        assert test_x.shape[1] == context_x.shape[1]

        xc, yc = self._normalize_data(context_x, context_y)
        xt = self._normalize_x(test_x)
        mu, sigma = self._predict_fn(
            self.params, self._next_key(), jnp.asarray(xc), jnp.asarray(yc),
            jnp.asarray(xt),
        )
        base = Normal(mu[:, 0], sigma[:, 0])
        pred_dist = AffineTransformed(base, self.y_mean[0], self.y_std[0])
        if return_density:
            return pred_dist
        return np.asarray(pred_dist.mean), np.asarray(pred_dist.stddev)

    def eval(self, context_x, context_y, test_x, test_y, **kwargs):
        """avg_ll = mean per-point log-density (the reference evaluates NP
        with flatten_y=False, making the divisor 1 — NPR_meta.py via
        abstract.py:151-157)."""
        test_x, test_y = handle_input_dim(test_x, test_y)
        test_y_flat = test_y.flatten()
        pred_dist = self.predict(context_x, context_y, test_x, return_density=True)
        avg_ll = float(jnp.mean(pred_dist.log_prob(jnp.asarray(test_y_flat))))
        rmse = float(jnp.sqrt(jnp.mean((pred_dist.mean - test_y_flat) ** 2)))
        calib = self._calib_error(self._vectorize_pred_dist(pred_dist), test_y_flat)
        return avg_ll, rmse, calib

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
