"""Accuracy parity vs the PyTorch reference's exact predictive math.

gpytorch is not installable in this container, so the reference's exact-GP
predictive path is mirrored here in pure float64 numpy, written from the
reference's own equations and gpytorch's documented parameter constraints:

- LearnedGPRegressionModel.forward (reference: meta_learn/models.py:505-519):
  mean = NN_mean(x).squeeze() (or ConstantMean/ZeroMean on features),
  covar = ScaleKernel(RBFKernel(ard)) on NN-projected inputs.
- gpytorch constraints: lengthscale/outputscale = softplus(raw) (Positive),
  likelihood noise = softplus(raw) + lower for GreaterThan(lower) — the MAP
  learner uses GreaterThan(1e-3) (reference: GPR_meta_mll.py:54-56), the
  single-task learner gpytorch's default GreaterThan(1e-4).
- ExactGP posterior conditioning + likelihood(gp(x)) predictive
  (reference: GPR_meta_mll.py:174-183), then AffineTransformedDistribution
  un-normalization (reference: models.py:15-43).
- RandomGP flavor (reference: random_gp.py:54-89): SEKernelLight with
  outputscale fixed to 1, noise = softplus(raw) with no floor.

Each test loads the *live* parameters of a (briefly trained) JAX learner
into the numpy mirror and asserts the learner's predict()/eval() outputs
match the mirrored reference math to 1e-3 — the north-star tolerance
(BASELINE.json). This validates every constraint/normalization convention
the reference applies at prediction time; end-to-end training parity
additionally needs a driver-side run of /root/reference/demo.py (recorded
as an open request in STATUS.md).
"""

import numpy as np
import pytest

from meta_learning_pacoh_tpu import (
    GPRegressionLearned,
    GPRegressionMetaLearned,
    GPRegressionMetaLearnedSVGD,
)


# ------------------------------------------------------------------ numpy mirror


def _softplus(x):
    return np.logaddexp(x, 0.0)


def _mlp(params, x):
    """Reference NeuralNetwork: Linear->Tanh hidden layers, linear output
    (reference: meta_learn/models.py:190-217)."""
    n_hidden = len(params) // 2 - 1
    h = x
    for i in range(n_hidden):
        h = np.tanh(h @ params[f"w_{i}"] + params[f"b_{i}"])
    return h @ params["w_out"] + params["b_out"]


def _rbf_ard(x1, x2, lengthscale, outputscale):
    """gpytorch ScaleKernel(RBFKernel(ard)): os * exp(-0.5 ||(x1-x2)/ls||^2)."""
    z1 = x1 / lengthscale
    z2 = x2 / lengthscale
    d2 = (
        np.sum(z1**2, axis=1)[:, None]
        - 2.0 * z1 @ z2.T
        + np.sum(z2**2, axis=1)[None, :]
    )
    return outputscale * np.exp(-0.5 * np.maximum(d2, 0.0))


def _reference_predict(params, xc_raw, yc_raw, xt_raw, stats, *,
                       mean_module, covar_module, noise_floor,
                       has_outputscale=True):
    """The reference's full predict() chain in float64 numpy.

    Returns (pred_mean, pred_std, joint_ll_fn) in ORIGINAL y units, where
    joint_ll_fn(y_test) gives the transformed-MVN joint log density
    (reference eval convention divides it by n, abstract.py:151-157).
    """
    x_mean, x_std, y_mean, y_std = [np.asarray(s, np.float64) for s in stats]
    p64 = {
        k: ({kk: np.asarray(vv, np.float64) for kk, vv in v.items()}
            if isinstance(v, dict) else np.asarray(v, np.float64))
        for k, v in params.items()
    }

    xc = (np.asarray(xc_raw, np.float64) - x_mean) / x_std
    xt = (np.asarray(xt_raw, np.float64) - x_mean) / x_std
    yc = ((np.asarray(yc_raw, np.float64) - y_mean) / y_std).ravel()

    # hyperparameters under gpytorch constraints
    ls = _softplus(p64["lengthscale_raw"])
    os_ = _softplus(p64["outputscale_raw"]) if has_outputscale else 1.0
    noise = _softplus(p64["noise_raw"]) + noise_floor  # variance

    # NN feature projection / mean
    phi_c = _mlp(p64["kernel_nn"], xc) if covar_module == "NN" else xc
    phi_t = _mlp(p64["kernel_nn"], xt) if covar_module == "NN" else xt
    if mean_module == "NN":
        mean_c = _mlp(p64["mean_nn"], xc)[:, 0]
        mean_t = _mlp(p64["mean_nn"], xt)[:, 0]
    elif mean_module == "constant":
        mean_c = np.full(xc.shape[0], float(p64["constant_mean"][0]))
        mean_t = np.full(xt.shape[0], float(p64["constant_mean"][0]))
    else:
        mean_c = np.zeros(xc.shape[0])
        mean_t = np.zeros(xt.shape[0])

    K_cc = _rbf_ard(phi_c, phi_c, ls, os_) + noise * np.eye(xc.shape[0])
    K_ct = _rbf_ard(phi_c, phi_t, ls, os_)
    K_tt = _rbf_ard(phi_t, phi_t, ls, os_)

    # exact posterior + observation noise (likelihood(gp(x)))
    A = np.linalg.solve(K_cc, K_ct)  # [Nc, Nt]
    post_mean = mean_t + A.T @ (yc - mean_c)
    post_cov = K_tt - K_ct.T @ A + noise * np.eye(xt.shape[0])

    # AffineTransformedDistribution un-normalization
    pred_mean = float(y_mean) + float(y_std) * post_mean
    pred_cov = float(y_std) ** 2 * post_cov
    pred_std = np.sqrt(np.diagonal(pred_cov))

    def joint_ll(y_test):
        y = np.asarray(y_test, np.float64).ravel()
        r = y - pred_mean
        L = np.linalg.cholesky(pred_cov)
        z = np.linalg.solve(L, r)
        logdet = 2.0 * np.sum(np.log(np.diagonal(L)))
        n = y.shape[0]
        return -0.5 * (z @ z + n * np.log(2.0 * np.pi) + logdet)

    return pred_mean, pred_std, joint_ll


def _np_params(tree):
    import jax

    return jax.tree.map(lambda a: np.asarray(a), tree)


@pytest.fixture(scope="module")
def task_data():
    rs = np.random.RandomState(42)
    train = []
    for _ in range(6):
        x = rs.uniform(-4, 4, (8, 1))
        y = 2.0 + np.sin(1.5 * x) + 0.8 * x + 0.05 * rs.normal(size=(8, 1))
        train.append((x, y))
    xc = rs.uniform(-4, 4, (6, 1))
    yc = 2.0 + np.sin(1.5 * xc) + 0.8 * xc
    xt = np.linspace(-4, 4, 25)[:, None]
    yt = 2.0 + np.sin(1.5 * xt) + 0.8 * xt
    return train, xc, yc, xt, yt


# ------------------------------------------------------------------------ tests


class TestMAPParity:
    @pytest.mark.parametrize("mean_module,covar_module,mode", [
        ("NN", "NN", "both"),
        ("constant", "SE", "learn_kernel"),
    ])
    def test_predict_matches_reference_math(self, task_data, mean_module,
                                            covar_module, mode):
        train, xc, yc, xt, yt = task_data
        m = GPRegressionMetaLearned(
            train, num_iter_fit=80, random_seed=3, learning_mode=mode,
            mean_module=mean_module, covar_module=covar_module,
        )
        m.meta_fit(verbose=False)

        mean, std = m.predict(xc, yc, xt)
        ref_mean, ref_std, ref_joint_ll = _reference_predict(
            _np_params(m.params), xc, yc, xt,
            (m.x_mean, m.x_std, m.y_mean[0], m.y_std[0]),
            mean_module=mean_module, covar_module=covar_module,
            noise_floor=1e-3,  # GaussianLikelihood(GreaterThan(1e-3))
        )
        np.testing.assert_allclose(mean, ref_mean, atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(std, ref_std, atol=1e-3, rtol=1e-4)

        ll, rmse, _ = m.eval(xc, yc, xt, yt)
        ref_ll = ref_joint_ll(yt) / yt.shape[0]
        ref_rmse = float(np.sqrt(np.mean((ref_mean - yt.ravel()) ** 2)))
        assert abs(ll - ref_ll) < 1e-3
        assert abs(rmse - ref_rmse) < 1e-3

    def test_confidence_intervals_match_normal_quantiles(self, task_data):
        from scipy import stats as sps

        train, xc, yc, xt, _ = task_data
        m = GPRegressionMetaLearned(train, num_iter_fit=40, random_seed=3)
        m.meta_fit(verbose=False)
        mean, std = m.predict(xc, yc, xt)
        ucb, lcb = m.confidence_intervals(xc, yc, xt, confidence=0.9)
        z = sps.norm.ppf(0.95)
        np.testing.assert_allclose(ucb, mean + z * std, atol=1e-3)
        np.testing.assert_allclose(lcb, mean - z * std, atol=1e-3)


class TestSingleTaskParity:
    def test_predict_matches_reference_math(self, task_data):
        _, xc, yc, xt, yt = task_data
        m = GPRegressionLearned(xc, yc, num_iter_fit=80, random_seed=5,
                                learning_mode="both")
        m.fit(verbose=False)

        mean, std = m.predict(xt)
        ref_mean, ref_std, ref_joint_ll = _reference_predict(
            _np_params(m.params), xc, yc, xt,
            (m.x_mean, m.x_std, m.y_mean[0], m.y_std[0]),
            mean_module="NN", covar_module="NN",
            noise_floor=1e-4,  # gpytorch default GreaterThan(1e-4)
        )
        np.testing.assert_allclose(mean, ref_mean, atol=1e-3, rtol=1e-4)
        np.testing.assert_allclose(std, ref_std, atol=1e-3, rtol=1e-4)

        ll, _, _ = m.eval(xt, yt)
        assert abs(ll - ref_joint_ll(yt) / yt.shape[0]) < 1e-3


class TestSVGDParticleParity:
    def test_single_particle_predictive_matches_randomgp_math(self, task_data):
        """Each SVGD particle is a RandomGP-flavored GP: outputscale == 1,
        noise = softplus(raw) with no floor (reference: random_gp.py:69-74)."""
        train, xc, yc, xt, _ = task_data
        m = GPRegressionMetaLearnedSVGD(train, num_iter_fit=40, random_seed=7,
                                        num_particles=3)
        m.meta_fit(verbose=False)

        means, covs = m._predict_fn(
            m.particles,
            *m._prepare_data_per_task(xc, yc),
            np.asarray(m._normalize_x(xt.astype(np.float32))),
        )
        for k in range(3):
            params_k = _np_params(m.hyper_prior.unravel(m.particles[k]))
            params_k.setdefault("outputscale_raw", np.asarray(0.0))
            ref_mean, ref_std, _ = _reference_predict(
                params_k, xc, yc, xt,
                (m.x_mean, m.x_std, m.y_mean[0], m.y_std[0]),
                mean_module="NN", covar_module="NN",
                noise_floor=0.0, has_outputscale=False,
            )
            mean_k = m.y_mean[0] + m.y_std[0] * np.asarray(means[k])
            std_k = m.y_std[0] * np.sqrt(np.diagonal(np.asarray(covs[k])))
            np.testing.assert_allclose(mean_k, ref_mean, atol=1e-3, rtol=1e-4)
            np.testing.assert_allclose(std_k, ref_std, atol=1e-3, rtol=1e-4)
