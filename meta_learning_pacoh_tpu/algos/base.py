"""Base classes: data handling, normalization, eval metrics, CIs, checkpoints.

API and metric parity with the reference's `RegressionModel` /
`RegressionModelMetaLearned` (reference: meta_learn/abstract.py): global
z-score normalization pooled over all meta-train tasks (:212-221), average
test log-likelihood = joint predictive log-density / n_test (:156-158), RMSE,
calibration error = RMSE between empirical CDF frequencies and 20 confidence
levels in [0.05, 0.95] (:260-272), and confidence intervals via predictive
icdf (:183-204).

Design delta: seeding is explicit `jax.random` key threading (one PRNGKey
per learner, folded per use) instead of global torch/numpy seeds
(reference: abstract.py:125-129).
"""

import numpy as np
import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.utils.input_handling import handle_input_dim, stack_task_tuples
from meta_learning_pacoh_tpu.utils.logging import get_logger


def calib_error(pred_dist_vectorized, test_y):
    """Calibration error (reference: meta_learn/abstract.py:260-272)."""
    test_y = jnp.asarray(test_y).flatten()
    cdf_vals = jnp.asarray(pred_dist_vectorized.cdf(test_y)).flatten()
    num_points = test_y.shape[0]
    conf_levels = jnp.linspace(0.05, 0.95, 20)
    emp_freq = jnp.sum(cdf_vals[:, None] <= conf_levels[None, :], axis=0) / num_points
    return float(jnp.sqrt(jnp.mean((emp_freq - conf_levels) ** 2)))


class RegressionModelBase:
    """Shared normalization + eval logic (single-task and meta learners)."""

    def __init__(self, normalize_data=True, random_seed=None):
        self.normalize_data = normalize_data
        self.logger = get_logger()
        self.input_dim = None
        self.output_dim = None
        seed = 0 if random_seed is None else random_seed
        self._key = jax.random.PRNGKey(seed)
        self.fitted = False

    # -- RNG -----------------------------------------------------------------
    def _next_key(self):
        self._key, sub = jax.random.split(self._key)
        return sub

    # -- normalization ---------------------------------------------------------
    def _set_normalization_stats(self, X, Y):
        if self.normalize_data:
            self.x_mean = np.mean(X, axis=0)
            self.y_mean = np.mean(Y, axis=0)
            self.x_std = np.std(X, axis=0) + 1e-8
            self.y_std = np.std(Y, axis=0) + 1e-8
        else:
            self.x_mean, self.y_mean = np.zeros(X.shape[1]), np.zeros(Y.shape[1])
            self.x_std, self.y_std = np.ones(X.shape[1]), np.ones(Y.shape[1])

    def _compute_normalization_stats(self, meta_train_tuples):
        xs, ys = zip(*[handle_input_dim(x, y) for x, y in meta_train_tuples])
        self._set_normalization_stats(np.concatenate(xs, 0), np.concatenate(ys, 0))

    def _normalize_x(self, X):
        return ((X - self.x_mean[None, :]) / self.x_std[None, :]).astype(np.float32)

    def _normalize_data(self, X, Y=None):
        Xn = self._normalize_x(X)
        if Y is None:
            return Xn
        Yn = ((Y - self.y_mean[None, :]) / self.y_std[None, :]).astype(np.float32)
        return Xn, Yn

    def _prepare_data_per_task(self, x, y, flatten_y=True):
        x, y = handle_input_dim(x, y)
        x, y = self._normalize_data(x, y)
        if flatten_y:
            assert y.shape[1] == 1
            y = y.flatten()
        return x, y

    def _prepare_meta_data(self, meta_train_tuples):
        """Stack, normalize, pad -> (X [T,N,D], Y [T,N], mask [T,N]).

        Returned as HOST (numpy) arrays on purpose: training step closures
        capture these as jit constants, and embedding a *device* array as an
        MLIR constant forces a device->host readback that is pathologically
        slow on tunneled TPU runtimes (tens of seconds per array)."""
        X, Y, mask = stack_task_tuples(meta_train_tuples)
        Xn = (X - self.x_mean[None, None, :]) / self.x_std[None, None, :]
        Yn = (Y - self.y_mean[0]) / self.y_std[0]
        Xn = (Xn * mask[..., None]).astype(np.float32)
        Yn = (Yn * mask).astype(np.float32)
        return Xn, Yn, mask

    # -- metrics ---------------------------------------------------------------
    def _calib_error(self, pred_dist_vectorized, test_y):
        return calib_error(pred_dist_vectorized, test_y)

    def _vectorize_pred_dist(self, pred_dist):
        raise NotImplementedError


class RegressionModelMetaLearned(RegressionModelBase):
    """Base for meta-learners: predict(context_x, context_y, test_x)."""

    def _check_and_set_dims(self, meta_train_data):
        """Dim promotion + consistency checks (reference: abstract.py:235-241)."""
        shapes = [handle_input_dim(x, y) for x, y in meta_train_data]
        self.input_dim = shapes[0][0].shape[-1]
        self.output_dim = shapes[0][1].shape[-1]
        assert all(
            x.shape[-1] == self.input_dim and y.shape[-1] == self.output_dim
            for x, y in shapes
        ), "all tasks must share input/output dimensionality"

    def predict(self, context_x, context_y, test_x, **kwargs):
        raise NotImplementedError

    def meta_fit(self, valid_tuples=None, verbose=True, log_period=500, n_iter=None):
        raise NotImplementedError

    def eval(self, context_x, context_y, test_x, test_y, **kwargs):
        """(avg_log_likelihood, rmse, calibration_error) on one test task."""
        context_x, context_y = handle_input_dim(context_x, context_y)
        test_x, test_y = handle_input_dim(test_x, test_y)
        test_y_flat = test_y.flatten()

        if not kwargs and getattr(self, "_batch_eval_fn", None) is not None:
            stacked = self._stack_eval_tuples([(context_x, context_y, test_x, test_y)])
            lls, rmses, calibs = self._run_batch_eval(*stacked)
            return float(lls[0]), float(rmses[0]), float(calibs[0])

        pred_dist = self.predict(context_x, context_y, test_x, return_density=True, **kwargs)
        avg_ll = float(jnp.mean(pred_dist.log_prob(jnp.asarray(test_y_flat)))) / test_y_flat.shape[0]
        rmse = float(jnp.sqrt(jnp.mean((pred_dist.mean - test_y_flat) ** 2)))
        pred_dist_vect = self._vectorize_pred_dist(pred_dist)
        calib = self._calib_error(pred_dist_vect, test_y_flat)
        return avg_ll, rmse, calib

    def _stack_eval_tuples(self, test_tuples):
        """Stack uniform-shape test tuples into dense [T, ...] arrays:
        (ctx_x_norm, ctx_y_norm, test_x_norm, test_y_raw) or None if ragged."""
        prepared = []
        for cx, cy, tx, ty in test_tuples:
            cx, cy = handle_input_dim(cx, cy)
            tx, ty = handle_input_dim(tx, ty)
            prepared.append((cx, cy, tx, ty))
        shapes = {(cx.shape, tx.shape) for cx, _, tx, _ in prepared}
        if len(shapes) != 1:
            return None
        CX = np.stack([self._normalize_x(cx) for cx, _, _, _ in prepared])
        CY = np.stack([
            ((cy - self.y_mean[None, :]) / self.y_std[None, :]).flatten()
            for _, cy, _, _ in prepared
        ]).astype(np.float32)
        TX = np.stack([self._normalize_x(tx) for _, _, tx, _ in prepared])
        TY = np.stack([ty.flatten() for _, _, _, ty in prepared]).astype(np.float32)
        return (jnp.asarray(CX), jnp.asarray(CY), jnp.asarray(TX), jnp.asarray(TY))

    def eval_datasets(self, test_tuples, **kwargs):
        """Mean (ll, rmse, calib) over a list of (ctx_x, ctx_y, test_x, test_y).

        When all tuples share shapes and the learner provides a batched eval
        function, the whole evaluation runs as ONE jitted vmap over tasks
        (the reference loops tasks in Python, abstract.py:179)."""
        assert all(len(t) == 4 for t in test_tuples)
        if not kwargs and getattr(self, "_batch_eval_fn", None) is not None:
            stacked = self._stack_eval_tuples(test_tuples)
            if stacked is not None:
                lls, rmses, calibs = self._run_batch_eval(*stacked)
                return (float(jnp.mean(lls)), float(jnp.mean(rmses)),
                        float(jnp.mean(calibs)))
        results = [self.eval(*t, **kwargs) for t in test_tuples]
        ll, rmse, calib = zip(*results)
        return float(np.mean(ll)), float(np.mean(rmse)), float(np.mean(calib))

    _batch_eval_fn = None

    def _run_batch_eval(self, CX, CY, TX, TY):
        raise NotImplementedError

    def confidence_intervals(self, context_x, context_y, test_x, confidence=0.9, **kwargs):
        pred_dist = self.predict(context_x, context_y, test_x, return_density=True, **kwargs)
        pred_dist = self._vectorize_pred_dist(pred_dist)
        alpha = (1 - confidence) / 2
        n = handle_input_dim(test_x).shape[0]
        ucb = pred_dist.icdf(jnp.full((n,), 1 - alpha))
        lcb = pred_dist.icdf(jnp.full((n,), alpha))
        return np.asarray(ucb), np.asarray(lcb)


class RegressionModel(RegressionModelBase):
    """Base for single-task learners: fit(...) then predict(test_x)."""

    def predict(self, test_x, **kwargs):
        raise NotImplementedError

    def eval(self, test_x, test_y, **kwargs):
        test_x, test_y = handle_input_dim(test_x, test_y)
        test_y_flat = test_y.flatten()
        pred_dist = self.predict(test_x, return_density=True, **kwargs)
        avg_ll = float(pred_dist.log_prob(jnp.asarray(test_y_flat))) / test_y_flat.shape[0]
        rmse = float(jnp.sqrt(jnp.mean((pred_dist.mean - test_y_flat) ** 2)))
        pred_dist_vect = self._vectorize_pred_dist(pred_dist)
        calib = self._calib_error(pred_dist_vect, test_y_flat)
        return avg_ll, rmse, calib

    def confidence_intervals(self, test_x, confidence=0.9, **kwargs):
        pred_dist = self.predict(test_x, return_density=True, **kwargs)
        pred_dist = self._vectorize_pred_dist(pred_dist)
        alpha = (1 - confidence) / 2
        n = handle_input_dim(test_x).shape[0]
        ucb = pred_dist.icdf(jnp.full((n,), 1 - alpha))
        lcb = pred_dist.icdf(jnp.full((n,), alpha))
        return np.asarray(ucb), np.asarray(lcb)
