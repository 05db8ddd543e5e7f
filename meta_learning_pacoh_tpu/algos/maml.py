"""MAML for few-shot regression.

Parity with the reference `MAMLRegression` (reference: meta_learn/MAML.py):
a plain tanh MLP whose initialization is meta-learned; each task's data is
split in half — the first ceil(n/2) points drive `num_inner_steps` inner SGD
steps (lr_inner), the rest give the meta MSE objective; second-order
meta-gradients (the reference's create_graph=True, MAML.py:210-214) come for
free from differentiating through the unrolled `lax.scan` inner loop.
Evaluation is RMSE-only (MAML.py:148-185).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.algos.base import RegressionModelMetaLearned
from meta_learning_pacoh_tpu.algos.pacoh_map import make_lr_schedule
from meta_learning_pacoh_tpu.models.mlp import init_mlp_params, mlp_apply
from meta_learning_pacoh_tpu.utils.input_handling import handle_input_dim
from meta_learning_pacoh_tpu.utils.jit_cache import shared


def _mse(params, x, y):
    return jnp.mean((mlp_apply(params, x) - y) ** 2)


def inner_adapt(params, x, y, lr_inner, num_steps):
    """Differentiable unrolled inner SGD; gradients flow through the unroll."""
    def step(p, _):
        grads = jax.grad(_mse)(p, x, y)
        p = jax.tree.map(lambda w, g: w - lr_inner * g, p, grads)
        return p, None

    params, _ = jax.lax.scan(step, params, None, length=num_steps)
    return params


class MAMLRegression(RegressionModelMetaLearned):

    def __init__(self, meta_train_data, layer_sizes=(32, 32, 32, 32),
                 num_iter_fit=20000, lr_inner=0.05, num_inner_steps=1,
                 task_batch_size=5, lr_meta=1e-3, lr_decay=1.0, optimizer="Adam",
                 normalize_data=True, random_seed=None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'task' axis — requires
        task_batch_size=-1 (full batch); shards the meta-task tensors so each
        device adapts its own task shard and the meta-gradient reduces with a
        psum over ICI."""
        super().__init__(normalize_data, random_seed)
        assert optimizer in ["Adam", "SGD"]

        self._check_and_set_dims(meta_train_data)
        self._compute_normalization_stats(meta_train_data)
        X, Y, mask = self._prepare_meta_data(meta_train_data)
        self.X, self.Y, self.mask = X, Y, mask
        self.n_tasks = X.shape[0]
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

        self.lr_inner = lr_inner
        self.num_inner_steps = num_inner_steps
        self.task_batch_size = task_batch_size
        self.num_iter_fit = num_iter_fit

        self.params = init_mlp_params(
            self._next_key(), self.input_dim, self.output_dim,
            tuple(layer_sizes), scheme="torch_linear",
        )
        self._train_key = self._next_key()

        def build_opt():
            schedule = make_lr_schedule(lr_meta, lr_decay)
            return optax.adam(schedule) if optimizer == "Adam" else optax.sgd(schedule)

        # per-task split index = ceil(n_i / 2) over REAL points (ragged tasks
        # keep their real points first; reference splits by order, MAML.py:203)
        self._split_arr = jnp.asarray(
            np.ceil(np.asarray(self.mask).sum(axis=1) / 2.0).astype(np.int32)
        )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            self._split_arr = jax.device_put(
                self._split_arr, NamedSharding(mesh, PartitionSpec("task"))
            )

        # jit functions are memoized on their full static config so learner
        # instances with identical configs share XLA compile caches.
        # LR_TRANSITION_STEPS is part of the key because make_lr_schedule
        # reads the mutable module constant at build time — tests shrink it.
        from meta_learning_pacoh_tpu.ops.pallas import launch_sched

        opt_key = (optimizer, lr_meta, lr_decay,
                   launch_sched.LR_TRANSITION_STEPS)
        arch_key = (self.input_dim, self.output_dim, tuple(layer_sizes))
        self._opt = shared(("maml.opt",) + opt_key, build_opt)
        self.opt_state = self._opt.init(self.params)
        self._step_fn = shared(
            ("maml.step",) + arch_key + opt_key
            + (lr_inner, num_inner_steps, task_batch_size, self.n_tasks),
            self._build_step_fn,
        )
        self._adapt_fn = shared(
            ("maml.adapt", lr_inner), self._build_adapt_fn
        )
        self._batch_rmse_fn = shared(
            ("maml.batch_rmse", lr_inner), self._build_batch_rmse_fn
        )
        self._step_count = 0

    def _prepare_meta_data(self, meta_train_tuples):
        """MAML keeps y 2-D (output_dim may exceed 1)."""
        from meta_learning_pacoh_tpu.utils.input_handling import stack_task_tuples

        tasks = [handle_input_dim(x, y) for x, y in meta_train_tuples]
        n_max = max(x.shape[0] for x, _ in tasks)
        T, d, dy = len(tasks), tasks[0][0].shape[1], tasks[0][1].shape[1]
        X = np.zeros((T, n_max, d), np.float32)
        Y = np.zeros((T, n_max, dy), np.float32)
        mask = np.zeros((T, n_max), np.float32)
        for i, (x, y) in enumerate(tasks):
            xn, yn = self._normalize_data(x, y)
            X[i, : x.shape[0]] = xn
            Y[i, : x.shape[0]] = yn
            mask[i, : x.shape[0]] = 1.0
        return jnp.asarray(X), jnp.asarray(Y), jnp.asarray(mask)

    # ------------------------------------------------------------- train step
    def _build_step_fn(self):
        lr_inner, num_inner = self.lr_inner, self.num_inner_steps
        n_tasks, batch_size = self.n_tasks, self.task_batch_size
        opt = self._opt

        def task_loss(params, x, y, m, split):
            pos = jnp.arange(x.shape[0])
            w1 = ((pos < split).astype(x.dtype) * m)[:, None]
            w2 = ((pos >= split).astype(x.dtype) * m)[:, None]

            def winner_mse(p):
                err = (mlp_apply(p, x) - y) ** 2 * w1
                return jnp.sum(err) / jnp.maximum(jnp.sum(w1 * jnp.ones_like(y)), 1.0)

            def step(p, _):
                grads = jax.grad(winner_mse)(p)
                p = jax.tree.map(lambda wt, g: wt - lr_inner * g, p, grads)
                return p, None

            adapted, _ = jax.lax.scan(step, params, None, length=num_inner)
            err2 = (mlp_apply(adapted, x) - y) ** 2 * w2
            return jnp.sum(err2) / jnp.maximum(jnp.sum(w2 * jnp.ones_like(y)), 1.0)

        full_batch = batch_size == n_tasks

        def single_step(carry, key, X, Y, M, splits):
            params, opt_state = carry
            if full_batch:
                # contiguous task axis -> shards cleanly over a 'task' mesh
                xb, yb, mb, spb = X, Y, M, splits
            else:
                idx = jax.random.randint(key, (batch_size,), 0, n_tasks)
                xb, yb, mb, spb = X[idx], Y[idx], M[idx], splits[idx]

            def meta_loss(p):
                losses = jax.vmap(
                    lambda x, y, m, sp: task_loss(p, x, y, m, sp)
                )(xb, yb, mb, spb)
                return jnp.mean(losses)
            loss, grads = jax.value_and_grad(meta_loss)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, opt_state, X, Y, M, splits, base_key, start_step, n_steps):
            steps = start_step + jnp.arange(n_steps)
            keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(steps)

            def body(carry, key):
                return single_step(carry, key, X, Y, M, splits)

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
                self.params, self.opt_state, self.X, self.Y, self.mask,
                self._split_arr, self._train_key, self._step_count, chunk
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
                valid_rmse = self.eval_datasets(valid_tuples)
                message += " Valid-RMSE: %.3f " % valid_rmse
            if verbose:
                self.logger.info(message)

        self.fitted = True
        return loss

    # ---------------------------------------------------------------- predict
    def _build_adapt_fn(self):
        lr_inner = self.lr_inner

        @functools.partial(jax.jit, static_argnames=("num_steps",))
        def adapt_and_predict(params, xc, yc, xt, num_steps):
            adapted = inner_adapt(params, xc, yc, lr_inner, num_steps)
            return mlp_apply(adapted, xt), mlp_apply(params, xt)

        return adapt_and_predict

    def predict(self, context_x, context_y, test_x, num_steps_eval=None):
        """Adapts on the context and predicts test means (adapted, initial)."""
        if num_steps_eval is None:
            num_steps_eval = self.num_inner_steps
        context_x, context_y = handle_input_dim(context_x, context_y)
        test_x = handle_input_dim(test_x)
        assert test_x.shape[1] == context_x.shape[1]

        xc, yc = self._normalize_data(context_x, context_y)
        xt = self._normalize_x(test_x)
        y_pred, y_pred_initial = self._adapt_fn(
            self.params, jnp.asarray(xc), jnp.asarray(yc), jnp.asarray(xt),
            num_steps_eval,
        )
        unnorm = lambda y: np.asarray(y) * self.y_std[None, :] + self.y_mean[None, :]
        return unnorm(y_pred), unnorm(y_pred_initial)

    def eval(self, context_x, context_y, test_x, test_y, num_steps_eval=None):
        """RMSE after adaptation (reference: MAML.py:148-170)."""
        test_x, test_y = handle_input_dim(test_x, test_y)
        y_pred, _ = self.predict(context_x, context_y, test_x,
                                 num_steps_eval=num_steps_eval)
        return float(np.sqrt(np.mean(np.sum((y_pred - test_y) ** 2, axis=-1))))

    def eval_datasets(self, test_tuples, num_steps_eval=None, **kwargs):
        """Mean adapted-RMSE. Uniform-shape task sets evaluate in one jitted
        lax.map (adapt + predict + RMSE for every task at once)."""
        assert all(len(t) == 4 for t in test_tuples)
        if num_steps_eval is None:
            num_steps_eval = self.num_inner_steps

        prepared = [tuple(handle_input_dim(a, b) + handle_input_dim(c, d))
                    for a, b, c, d in test_tuples]
        shapes = {(cx.shape, tx.shape) for cx, _, tx, _ in prepared}
        if len(shapes) == 1:
            CX = jnp.asarray(np.stack([self._normalize_x(cx) for cx, _, _, _ in prepared]))
            CY = jnp.asarray(np.stack([
                ((cy - self.y_mean[None, :]) / self.y_std[None, :]).astype(np.float32)
                for _, cy, _, _ in prepared
            ]))
            TX = jnp.asarray(np.stack([self._normalize_x(tx) for _, _, tx, _ in prepared]))
            TY = jnp.asarray(np.stack([ty for _, _, _, ty in prepared]).astype(np.float32))
            rmses = self._batch_rmse_fn(
                self.params, CX, CY, TX, TY,
                np.asarray(self.y_mean[None, :], np.float32),
                np.asarray(self.y_std[None, :], np.float32),
                num_steps_eval,
            )
            return float(jnp.mean(rmses))
        return float(np.mean([
            self.eval(*t, num_steps_eval=num_steps_eval, **kwargs) for t in test_tuples
        ]))

    def _build_batch_rmse_fn(self):
        lr_inner = self.lr_inner

        @functools.partial(jax.jit, static_argnames=("num_steps",))
        def batch_rmse(params, CX, CY, TX, TY, y_mean, y_std, num_steps):
            def one(args):
                cx, cy, tx, ty = args
                adapted = inner_adapt(params, cx, cy, lr_inner, num_steps)
                pred = mlp_apply(adapted, tx) * y_std + y_mean
                return jnp.sqrt(jnp.mean(jnp.sum((pred - ty) ** 2, axis=-1)))

            return jax.lax.map(one, (CX, CY, TX, TY))

        return batch_rmse

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
