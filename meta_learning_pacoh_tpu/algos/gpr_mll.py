"""Single-task GP regression with learnable NN mean / NN-feature kernel.

Parity with the reference `GPRegressionLearned` (reference:
meta_learn/GPR_mll.py): the GP prior's mean/kernel are fit by maximizing the
exact MLL of the *same* dataset used for posterior inference; AdamW with
per-group weight decay (NN groups get `weight_decay`, hyperparameter groups
inherit torch AdamW's 0.01 default, GPR_mll.py:102-107); optional
ReduceLROnPlateau on the validation log-likelihood (GPR_mll.py:109-112).
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.algos.base import RegressionModel
from meta_learning_pacoh_tpu.models.gp_base import (
    GPConfig,
    init_gp_params,
    gp_prior_mll,
    gp_predict,
)
from meta_learning_pacoh_tpu.ops.distributions import (
    AffineTransformed,
    MultivariateNormal,
    Normal,
)
from meta_learning_pacoh_tpu.utils.input_handling import handle_input_dim
from meta_learning_pacoh_tpu.utils.jit_cache import shared


class ReduceLROnPlateau:
    """Host-side replica of torch.optim.lr_scheduler.ReduceLROnPlateau
    (mode='max'): scale lr by `factor` after `patience` non-improving steps."""

    def __init__(self, factor=0.2, patience=10, threshold=1e-4):
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = -float("inf")
        self.num_bad = 0
        self.scale = 1.0

    def step(self, metric):
        # torch is_better (mode='max', threshold_mode='rel'):
        # a > best * (1 + threshold); best starts at -inf
        if metric > self.best * (1.0 + self.threshold):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.num_bad > self.patience:
            self.scale *= self.factor
            self.num_bad = 0
        return self.scale


class GPRegressionLearned(RegressionModel):

    def __init__(self, train_x, train_t, learning_mode="both", lr=1e-3,
                 weight_decay=0.0, feature_dim=2, num_iter_fit=1000,
                 covar_module="NN", mean_module="NN", mean_nn_layers=(32, 32),
                 kernel_nn_layers=(32, 32), optimizer="Adam", normalize_data=True,
                 lr_scheduler=True, random_seed=None, mesh=None):
        """mesh: optional jax.sharding.Mesh with a 'task' axis — when the
        training set is larger than the single-chip blocked-Pallas window
        (N > BLOCKED_MAX_N), the per-step Gram factorization is distributed
        across the mesh devices via parallel/dist_chol.py (block rows
        sharded, panels exchanged over ICI). Smaller N ignores the mesh."""
        super().__init__(normalize_data=normalize_data, random_seed=random_seed)

        from meta_learning_pacoh_tpu.models.modules import KernelModule, MeanModule

        assert learning_mode in ["learn_mean", "learn_kernel", "both", "vanilla"]
        # user-supplied module instances are accepted next to the string
        # shorthands, matching the reference (GPR_mll.py:40-41 takes any
        # gpytorch mean/kernel; exercised with CosineKernel in
        # reference tests/test_GPR.py:95-144)
        assert mean_module in ["NN", "constant", "zero"] or isinstance(
            mean_module, MeanModule
        )
        assert covar_module in ["NN", "SE"] or isinstance(
            covar_module, KernelModule
        )
        assert optimizer in ["Adam", "SGD"]
        if covar_module == "NN":
            assert learning_mode in ["learn_kernel", "both"]
        if mean_module == "NN":
            assert learning_mode in ["learn_mean", "both"]

        self.lr, self.weight_decay, self.num_iter_fit = lr, weight_decay, num_iter_fit
        self.learning_mode = learning_mode
        self._use_plateau_scheduler = lr_scheduler

        train_x, train_t = handle_input_dim(train_x, train_t)
        self.input_dim, self.output_dim = train_x.shape[-1], train_t.shape[-1]
        self.n_train_samples = train_x.shape[0]
        self._set_normalization_stats(train_x, train_t)
        self.train_x, self.train_t = self._prepare_data_per_task(train_x, train_t)

        self.cfg = GPConfig(
            input_dim=self.input_dim,
            feature_dim=feature_dim,
            mean_module=mean_module,
            covar_module=covar_module,
            mean_nn_layers=tuple(mean_nn_layers),
            kernel_nn_layers=tuple(kernel_nn_layers),
            has_outputscale=True,
            # gpytorch GaussianLikelihood default noise floor (GreaterThan(1e-4))
            noise_floor=1e-4,
            init_scheme="torch_linear",
        )
        self.params = init_gp_params(self.cfg, self._next_key())
        # jit functions are memoized on their full static config so learner
        # instances with identical configs share XLA compile caches (per-task
        # baseline fits construct one learner per task)
        self._dist_linalg = None
        if mesh is not None and "task" in mesh.axis_names:
            from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
                BLOCKED_MAX_N,
            )

            if self.n_train_samples > BLOCKED_MAX_N:
                self._dist_linalg = (mesh, "task", 128, BLOCKED_MAX_N + 1)
        opt_key = (self.cfg, learning_mode, optimizer, lr, weight_decay,
                   self._dist_linalg)
        self._setup_optimizer(optimizer, lr, opt_key)
        self._plateau = ReduceLROnPlateau(factor=0.2 if lr_scheduler else 1.0)
        self._step_fn = shared(("gpr_mll.step",) + opt_key, self._build_step_fn)
        cfg = self.cfg
        self._predict_fn = shared(
            ("gpr_mll.predict", cfg),
            lambda: jax.jit(
                lambda params, xc, yc, xt: gp_predict(cfg, params, xc, yc, xt)
            ),
        )
        self._step_count = 0

    # ------------------------------------------------------------------ setup
    def _param_labels(self):
        mode = self.learning_mode
        learn_kernel = mode in ("learn_kernel", "both")
        learn_mean = mode in ("learn_mean", "both")

        def label(name):
            if name == "noise_raw":
                return "hyper"
            if name in ("lengthscale_raw", "outputscale_raw"):
                return "hyper" if learn_kernel else "freeze"
            # custom-module hyperparameters join the 'hyper' group — the
            # reference appends them with plain lr (GPR_mll.py:74-78), which
            # under torch AdamW means the 0.01 default weight decay
            if name == "custom_kernel":
                return "hyper" if learn_kernel else "freeze"
            if name == "custom_mean":
                return "hyper" if learn_mean else "freeze"
            if name == "kernel_nn":
                return "nn" if learn_kernel else "freeze"
            if name in ("mean_nn", "constant_mean"):
                if name == "constant_mean":
                    return "hyper" if learn_mean else "freeze"
                return "nn" if learn_mean else "freeze"
            return "freeze"

        return {
            name: (jax.tree.map(lambda _: label(name), leaf)
                   if isinstance(leaf, dict) else label(name))
            for name, leaf in self.params.items()
        }

    def _setup_optimizer(self, optimizer, lr, opt_key):
        def build():
            if optimizer == "Adam":
                # torch.optim.AdamW(groups): NN groups carry weight_decay, the
                # rest inherit AdamW's 0.01 default (GPR_mll.py:102-107)
                make = lambda wd: optax.inject_hyperparams(optax.adamw)(
                    learning_rate=lr, weight_decay=wd
                )
                transforms = {"nn": make(self.weight_decay), "hyper": make(0.01),
                              "freeze": optax.set_to_zero()}
            else:
                make = lambda wd: optax.inject_hyperparams(
                    lambda learning_rate: optax.chain(
                        optax.add_decayed_weights(wd), optax.sgd(learning_rate)
                    )
                )(learning_rate=lr)
                transforms = {"nn": make(self.weight_decay), "hyper": make(0.0),
                              "freeze": optax.set_to_zero()}
            return optax.multi_transform(transforms, self._param_labels())

        self._opt = shared(("gpr_mll.opt",) + opt_key, build)
        self.opt_state = self._opt.init(self.params)

    def _set_lr_scale(self, scale):
        """Functionally rewrite the injected learning_rate in every group
        (optax states are immutable NamedTuples)."""
        new_lr = jnp.asarray(self.lr * scale, dtype=jnp.float32)
        inner = dict(self.opt_state.inner_states)
        for group in ("nn", "hyper"):
            masked = inner[group]
            st = masked.inner_state
            if hasattr(st, "hyperparams"):
                st = st._replace(
                    hyperparams={**st.hyperparams, "learning_rate": new_lr}
                )
                inner[group] = masked._replace(inner_state=st)
        self.opt_state = self.opt_state._replace(inner_states=inner)

    # ------------------------------------------------------------- train loop
    def _build_step_fn(self):
        import contextlib

        from meta_learning_pacoh_tpu.ops import gp as gp_ops

        cfg = self.cfg
        opt = self._opt
        dist_linalg = self._dist_linalg

        def dist_ctx():
            if dist_linalg is None:
                return contextlib.nullcontext()
            mesh, axis, block, min_n = dist_linalg
            return gp_ops.distributed_linalg(mesh, axis, block, min_n)

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, opt_state, x, y, n_steps):
            def single_step(carry, _):
                params, opt_state = carry
                with dist_ctx():
                    loss, grads = jax.value_and_grad(
                        lambda p: -gp_prior_mll(cfg, p, x, y)
                    )(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), loss

            (params, opt_state), losses = jax.lax.scan(
                single_step, (params, opt_state), None, length=n_steps
            )
            return params, opt_state, losses

        return run_chunk

    def fit(self, valid_x=None, valid_t=None, verbose=True, log_period=500, n_iter=None):
        """Fits the GP prior parameters by maximizing the train-set MLL."""
        if n_iter is None:
            n_iter = self.num_iter_fit
        t = time.time()
        loss = float("nan")
        remaining, itr = n_iter, 0
        while remaining > 0:
            chunk = int(min(log_period, remaining))
            self.params, self.opt_state, losses = self._step_fn(
                self.params, self.opt_state, self.train_x, self.train_t, chunk
            )
            remaining -= chunk
            itr += chunk
            self._step_count += chunk
            loss = float(losses[-1])

            duration = time.time() - t
            t = time.time()
            message = "Iter %d/%d - Loss: %.3f - Time %.3f sec" % (itr, n_iter, loss, duration)
            if valid_x is not None:
                valid_ll, valid_rmse, calib = self.eval(valid_x, valid_t)
                scale = self._plateau.step(valid_ll)
                self._set_lr_scale(scale)
                message += " - Valid-LL: %.3f - Valid-RMSE: %.3f - Calib-Err %.3f" % (
                    valid_ll, valid_rmse, calib,
                )
            if verbose:
                self.logger.info(message)

        self.fitted = True
        return loss

    # ---------------------------------------------------------------- predict
    def predict(self, test_x, return_density=False, **kwargs):
        test_x = handle_input_dim(test_x)
        test_xn = jnp.asarray(self._normalize_x(test_x))
        mean, cov = self._predict_fn(self.params, self.train_x, self.train_t, test_xn)
        pred_dist = AffineTransformed(
            MultivariateNormal(mean, cov), self.y_mean[0], self.y_std[0]
        )
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
