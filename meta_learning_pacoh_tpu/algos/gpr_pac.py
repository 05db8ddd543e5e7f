"""Single-task PAC-Bayes GP: variational posterior trained on the McAllester bound.

Parity with the reference `GPRegressionLearnedPAC` (reference:
meta_learn/GPR_pac.py): a variational Gaussian q(f) at the train inputs and
GP-prior hyperparameters are jointly trained on

    loss = -sum_i E_q[log N(y_i | f_i, sigma^2)]
           + sqrt( (KL(q || prior) + log(2 sqrt(n) / delta)) / (2 n) )

(GPR_pac.py:145-152; the reference's `ll` is the summed expected log-prob).
The posterior is parameterized directly over f at the train points
(mean + Cholesky factor) — see ops/variational.py for the predictive.
"""

import functools
import math
import time

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.algos.base import RegressionModel
from meta_learning_pacoh_tpu.algos.gpr_mll import ReduceLROnPlateau
from meta_learning_pacoh_tpu.models.gp_base import (
    GPConfig,
    init_gp_params,
    gp_mean,
    gp_gram,
    gp_hypers,
)
from meta_learning_pacoh_tpu.ops.chol import cholesky
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


class GPRegressionLearnedPAC(RegressionModel):

    def __init__(self, train_x, train_t, learning_mode="both", lr=1e-3, delta=0.1,
                 weight_decay=0.0, feature_dim=2, num_iter_fit=1000,
                 covar_module="NN", mean_module="NN", mean_nn_layers=(32, 32),
                 kernel_nn_layers=(32, 32), optimizer="Adam", normalize_data=True,
                 lr_scheduler=True, random_seed=None):
        super().__init__(normalize_data=normalize_data, random_seed=random_seed)

        assert learning_mode in ["learn_mean", "learn_kernel", "both", "vanilla"]
        assert mean_module in ["NN", "constant", "zero"]
        assert covar_module in ["NN", "SE"]
        assert optimizer in ["Adam", "SGD"]

        self.lr, self.weight_decay = lr, weight_decay
        self.num_iter_fit, self.delta = num_iter_fit, delta
        self.learning_mode = learning_mode

        train_x, train_t = handle_input_dim(train_x, train_t)
        self.input_dim, self.output_dim = train_x.shape[-1], train_t.shape[-1]
        self.n_train_samples = train_x.shape[0]
        self._set_normalization_stats(train_x, train_t)
        self.train_x, self.train_t = self._prepare_data_per_task(train_x, train_t)

        self.cfg = GPConfig(
            input_dim=self.input_dim, feature_dim=feature_dim,
            mean_module=mean_module, covar_module=covar_module,
            mean_nn_layers=tuple(mean_nn_layers),
            kernel_nn_layers=tuple(kernel_nn_layers),
            has_outputscale=True, noise_floor=1e-4, init_scheme="torch_linear",
        )
        gp_params = init_gp_params(self.cfg, self._next_key())
        # variational q(f) at the train points, initialized at the prior
        n = self.n_train_samples
        prior_mean = gp_mean(self.cfg, gp_params, self.train_x)
        prior_K = gp_gram(self.cfg, gp_params, self.train_x)
        q_chol0 = cholesky(prior_K + 1e-3 * jnp.eye(n))
        self.params = {
            "gp": gp_params,
            "q_mean": prior_mean,
            "q_chol": q_chol0,
        }
        # jit functions are memoized on their full static config so learner
        # instances with identical configs share XLA compile caches; the PAC
        # loss also depends on the train-set size and delta
        opt_key = (self.cfg, learning_mode, optimizer, lr, weight_decay)
        self._setup_optimizer(optimizer, lr, opt_key)
        self._plateau = ReduceLROnPlateau(factor=0.2 if lr_scheduler else 1.0)
        self._step_fn = shared(
            ("gpr_pac.step",) + opt_key + (self.n_train_samples, delta),
            self._build_step_fn,
        )
        self._predict_fn = shared(
            ("gpr_pac.predict", self.cfg), self._build_predict_fn
        )
        self._step_count = 0

    def _param_labels(self):
        mode = self.learning_mode
        learn_kernel = mode in ("learn_kernel", "both")
        learn_mean = mode in ("learn_mean", "both")

        def gp_label(name):
            if name == "noise_raw":
                return "hyper"
            if name in ("lengthscale_raw", "outputscale_raw"):
                return "hyper" if learn_kernel else "freeze"
            if name == "kernel_nn":
                return "nn" if learn_kernel else "freeze"
            if name == "constant_mean":
                return "hyper" if learn_mean else "freeze"
            if name == "mean_nn":
                return "nn" if learn_mean else "freeze"
            return "freeze"

        gp_labels = {
            name: (jax.tree.map(lambda _: gp_label(name), leaf)
                   if isinstance(leaf, dict) else gp_label(name))
            for name, leaf in self.params["gp"].items()
        }
        return {"gp": gp_labels, "q_mean": "hyper", "q_chol": "hyper"}

    def _setup_optimizer(self, optimizer, lr, opt_key):
        def build():
            if optimizer == "Adam":
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

        self._opt = shared(("gpr_pac.opt",) + opt_key, build)
        self.opt_state = self._opt.init(self.params)

    def _set_lr_scale(self, scale):
        new_lr = jnp.asarray(self.lr * scale, dtype=jnp.float32)
        inner = dict(self.opt_state.inner_states)
        for group in ("nn", "hyper"):
            masked = inner[group]
            st = masked.inner_state
            if hasattr(st, "hyperparams"):
                st = st._replace(hyperparams={**st.hyperparams, "learning_rate": new_lr})
                inner[group] = masked._replace(inner_state=st)
        self.opt_state = self.opt_state._replace(inner_states=inner)

    # ------------------------------------------------------------- train loop
    def _pac_loss(self, params, x=None, y=None):
        cfg = self.cfg
        if x is None:
            x, y = self.train_x, self.train_t
        n = float(self.n_train_samples)
        gp_params = params["gp"]
        _, _, noise = gp_hypers(cfg, gp_params)
        q_mean, q_chol = params["q_mean"], jnp.tril(params["q_chol"])
        f_var = jnp.sum(q_chol**2, axis=-1)

        ll = jnp.sum(expected_log_prob_gaussian(y, q_mean, f_var, noise))
        prior_mean = gp_mean(cfg, gp_params, x)
        prior_K = gp_gram(cfg, gp_params, x)
        kl = gaussian_kl_chol(q_mean, q_chol, prior_mean, prior_K)
        bound = -ll + jnp.sqrt(
            (kl + math.log(2.0 * math.sqrt(n) / self.delta)) / (2.0 * n)
        )
        return bound, (ll, kl)

    def _build_step_fn(self):
        opt = self._opt

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def run_chunk(params, opt_state, x, y, n_steps):
            def single_step(carry, _):
                params, opt_state = carry
                (loss, aux), grads = jax.value_and_grad(
                    lambda p: self._pac_loss(p, x, y), has_aux=True
                )(params)
                updates, opt_state = opt.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), (loss, aux[0], aux[1])

            (params, opt_state), metrics = jax.lax.scan(
                single_step, (params, opt_state), None, length=n_steps
            )
            return params, opt_state, metrics

        return run_chunk

    def fit(self, valid_x=None, valid_t=None, verbose=True, log_period=500, n_iter=None):
        """Minimizes the McAllester PAC-Bayes bound."""
        if n_iter is None:
            n_iter = self.num_iter_fit
        t = time.time()
        loss = float("nan")
        remaining, itr = n_iter, 0
        while remaining > 0:
            chunk = int(min(log_period, remaining))
            self.params, self.opt_state, (losses, lls, kls) = self._step_fn(
                self.params, self.opt_state, self.train_x, self.train_t, chunk
            )
            remaining -= chunk
            itr += chunk
            self._step_count += chunk
            loss = float(losses[-1])

            duration = time.time() - t
            t = time.time()
            message = "Iter %d/%d - Loss: %.3f - LL: %.3f - KL: %.3f Time %.3f sec" % (
                itr, n_iter, loss, float(lls[-1]), float(kls[-1]), duration,
            )
            if valid_x is not None:
                valid_ll, valid_rmse, calib = self.eval(valid_x, valid_t)
                self._set_lr_scale(self._plateau.step(valid_ll))
                message += " - Valid-LL: %.3f - Valid-RMSE: %.3f - Calib-Err %.3f" % (
                    valid_ll, valid_rmse, calib,
                )
            if verbose:
                self.logger.info(message)

        self.fitted = True
        return loss

    # ---------------------------------------------------------------- predict
    def _build_predict_fn(self):
        cfg = self.cfg

        @jax.jit
        def predict_fn(params, xc, xt):
            gp_params = params["gp"]
            _, _, noise = gp_hypers(cfg, gp_params)
            mean_c = gp_mean(cfg, gp_params, xc)
            mean_t = gp_mean(cfg, gp_params, xt)
            K_cc = gp_gram(cfg, gp_params, xc)
            K_ct = gp_gram(cfg, gp_params, xc, xt)
            K_tt = gp_gram(cfg, gp_params, xt)
            m, c = svgp_predict(
                params["q_mean"], jnp.tril(params["q_chol"]),
                mean_c, K_cc, K_ct, mean_t, K_tt,
            )
            c = c + noise * jnp.eye(c.shape[-1])
            return m, c

        return predict_fn

    def predict(self, test_x, return_density=False, **kwargs):
        test_x = handle_input_dim(test_x)
        test_xn = jnp.asarray(self._normalize_x(test_x))
        mean, cov = self._predict_fn(self.params, self.train_x, test_xn)
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
