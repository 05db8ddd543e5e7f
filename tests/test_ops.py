"""Tier-1 numerics: unit tests of the GP engine primitives against closed
forms and scipy/XLA references (mirrors reference tests/test_utils.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.ops.kernels import rbf_ard, sq_dists, inv_softplus, softplus
from meta_learning_pacoh_tpu.ops.gp import gp_mll, gp_posterior, mvn_log_prob, add_noise_masked
from meta_learning_pacoh_tpu.ops.rootfind import find_root_by_bounding
from meta_learning_pacoh_tpu.ops import svgd as svgd_ops
from meta_learning_pacoh_tpu.ops.distributions import (
    Normal, MultivariateNormal, AffineTransformed, EqualWeightedMixture,
)


def _rand_psd(n, seed=0, noise=0.1):
    rs = np.random.RandomState(seed)
    A = rs.randn(n + 3, n).astype(np.float32)
    return (A.T @ A / n + noise * np.eye(n)).astype(np.float32)


class TestKernels:
    def test_sq_dists_matches_numpy(self):
        rs = np.random.RandomState(0)
        x1, x2 = rs.randn(7, 3).astype(np.float32), rs.randn(5, 3).astype(np.float32)
        d = np.asarray(sq_dists(jnp.asarray(x1), jnp.asarray(x2)))
        ref = ((x1[:, None, :] - x2[None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(d, ref, atol=1e-4)

    def test_rbf_ard_closed_form(self):
        rs = np.random.RandomState(1)
        x = rs.randn(6, 2).astype(np.float32)
        ls = np.array([0.7, 1.3], dtype=np.float32)
        K = np.asarray(rbf_ard(jnp.asarray(x), jnp.asarray(x), jnp.asarray(ls), 2.0))
        ref = 2.0 * np.exp(-0.5 * (((x[:, None, :] - x[None, :, :]) / ls) ** 2).sum(-1))
        np.testing.assert_allclose(K, ref, rtol=1e-5, atol=1e-6)

    def test_inv_softplus_roundtrip(self):
        vals = jnp.asarray([0.01, 0.5, 1.0, 5.0, 30.0])
        np.testing.assert_allclose(np.asarray(softplus(inv_softplus(vals))), np.asarray(vals), rtol=5e-4)


class TestMLL:
    def test_matches_scipy_mvn(self):
        from scipy.stats import multivariate_normal

        n = 9
        K = _rand_psd(n, seed=2, noise=0.0)
        rs = np.random.RandomState(3)
        mean = rs.randn(n).astype(np.float32)
        y = rs.randn(n).astype(np.float32)
        noise = 0.3
        ll = float(gp_mll(jnp.asarray(mean), jnp.asarray(K), jnp.asarray(y), noise, jitter=0.0))
        ref = multivariate_normal.logpdf(y, mean=mean, cov=K + noise * np.eye(n)) / n
        assert abs(ll - ref) < 1e-4

    def test_masked_equals_unpadded(self):
        n, pad = 6, 4
        rs = np.random.RandomState(4)
        x = rs.randn(n, 2).astype(np.float32)
        y = rs.randn(n).astype(np.float32)
        mean = rs.randn(n).astype(np.float32)
        K = np.asarray(rbf_ard(jnp.asarray(x), jnp.asarray(x), 1.0))
        ll_ref = float(gp_mll(jnp.asarray(mean), jnp.asarray(K), jnp.asarray(y), 0.2))

        xp = np.concatenate([x, np.zeros((pad, 2), np.float32)])
        Kp = np.asarray(rbf_ard(jnp.asarray(xp), jnp.asarray(xp), 1.0))
        yp = np.concatenate([y, np.zeros(pad, np.float32)])
        meanp = np.concatenate([mean, 7.7 * np.ones(pad, np.float32)])  # garbage in pad
        mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
        ll_pad = float(gp_mll(jnp.asarray(meanp), jnp.asarray(Kp), jnp.asarray(yp), 0.2,
                              mask=jnp.asarray(mask)))
        assert abs(ll_ref - ll_pad) < 1e-5

    def test_grad_finite_and_masked_grad_matches(self):
        n, pad = 5, 3
        rs = np.random.RandomState(5)
        x = rs.randn(n, 2).astype(np.float32)
        y = rs.randn(n).astype(np.float32)

        def ll_of_ls(raw_ls, xv, yv, mask):
            K = rbf_ard(xv, xv, softplus(raw_ls))
            mean = jnp.zeros(xv.shape[0])
            return gp_mll(mean, K, yv, 0.1, mask=mask)

        g_ref = jax.grad(ll_of_ls)(jnp.asarray(0.3), jnp.asarray(x), jnp.asarray(y), None)
        xp = np.concatenate([x, np.zeros((pad, 2), np.float32)])
        yp = np.concatenate([y, np.zeros(pad, np.float32)])
        mask = np.concatenate([np.ones(n, np.float32), np.zeros(pad, np.float32)])
        g_pad = jax.grad(ll_of_ls)(jnp.asarray(0.3), jnp.asarray(xp), jnp.asarray(yp),
                                   jnp.asarray(mask))
        assert np.isfinite(float(g_ref)) and abs(float(g_ref) - float(g_pad)) < 1e-4

    def test_posterior_matches_direct_conditioning(self):
        rs = np.random.RandomState(6)
        xc = rs.randn(8, 1).astype(np.float32)
        xt = rs.randn(4, 1).astype(np.float32)
        yc = rs.randn(8).astype(np.float32)
        noise = 0.25
        Kcc = np.asarray(rbf_ard(jnp.asarray(xc), jnp.asarray(xc), 1.0))
        Kct = np.asarray(rbf_ard(jnp.asarray(xc), jnp.asarray(xt), 1.0))
        Ktt = np.asarray(rbf_ard(jnp.asarray(xt), jnp.asarray(xt), 1.0))
        m, c = gp_posterior(jnp.zeros(8), jnp.asarray(Kcc), jnp.asarray(Kct),
                            jnp.zeros(4), jnp.asarray(Ktt), jnp.asarray(yc), noise,
                            jitter=0.0)
        Kn = Kcc + noise * np.eye(8)
        ref_m = Kct.T @ np.linalg.solve(Kn, yc)
        ref_c = Ktt - Kct.T @ np.linalg.solve(Kn, Kct)
        np.testing.assert_allclose(np.asarray(m), ref_m, atol=1e-4)
        np.testing.assert_allclose(np.asarray(c), ref_c, atol=1e-4)


class TestDistributions:
    def test_normal_icdf_cdf_roundtrip(self):
        d = Normal(jnp.asarray([1.0, -2.0]), jnp.asarray([0.5, 2.0]))
        q = jnp.asarray([0.1, 0.75])
        np.testing.assert_allclose(np.asarray(d.cdf(d.icdf(q))), np.asarray(q), atol=1e-5)

    def test_mixture_moments_closed_form(self):
        locs = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])  # K=2, N=2
        scales = jnp.asarray([[1.0, 0.5], [0.3, 1.5]])
        mix = EqualWeightedMixture(Normal(locs, scales))
        np.testing.assert_allclose(np.asarray(mix.mean), [1.0, 2.0], atol=1e-6)
        var_ref = np.mean(np.asarray(scales) ** 2, 0) + np.var(np.asarray(locs), 0)
        np.testing.assert_allclose(np.asarray(mix.variance), var_ref, atol=1e-6)

    def test_mixture_log_prob_two_components(self):
        from scipy.stats import norm

        mix = EqualWeightedMixture(Normal(jnp.asarray([[0.0], [2.0]]), jnp.asarray([[1.0], [1.0]])))
        val = jnp.asarray([0.7])
        lp = float(mix.log_prob(val)[0])
        ref = np.log(0.5 * norm.pdf(0.7, 0, 1) + 0.5 * norm.pdf(0.7, 2, 1))
        assert abs(lp - ref) < 1e-4

    def test_mixture_icdf_bisection_recovers_normal_quantiles(self):
        # degenerate mixture (same component twice) == plain Normal
        mix = EqualWeightedMixture(Normal(jnp.zeros((2, 3)), jnp.ones((2, 3))))
        q = jnp.asarray([0.05, 0.5, 0.9])
        ref = Normal(jnp.zeros(3), jnp.ones(3)).icdf(q)
        np.testing.assert_allclose(np.asarray(mix.icdf(q)), np.asarray(ref), atol=1e-4)

    def test_affine_transform_log_prob(self):
        from scipy.stats import norm

        base = Normal(jnp.asarray([0.0]), jnp.asarray([1.0]))
        d = AffineTransformed(base, 5.0, 2.0)
        lp = float(d.log_prob(jnp.asarray([6.0]))[0])
        assert abs(lp - norm.logpdf(6.0, 5.0, 2.0)) < 1e-5

    def test_affine_mvn_joint_log_prob(self):
        from scipy.stats import multivariate_normal

        K = _rand_psd(4, seed=8)
        mean = np.array([0.1, -0.2, 0.3, 0.0], np.float32)
        d = AffineTransformed(MultivariateNormal(jnp.asarray(mean), jnp.asarray(K)), 2.0, 3.0)
        y = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
        ref = multivariate_normal.logpdf(y, mean=2.0 + 3.0 * mean, cov=9.0 * K)
        assert abs(float(d.log_prob(jnp.asarray(y))) - ref) < 1e-3


class TestRootFind:
    def test_recovers_normal_quantiles(self):
        from scipy.stats import norm

        d = Normal(jnp.asarray([0.0, 1.0, -2.0]), jnp.asarray([1.0, 2.0, 0.5]))
        q = jnp.asarray([0.3, 0.9, 0.05])
        left = jnp.full((3,), -1e8)
        right = jnp.full((3,), 1e8)
        root = find_root_by_bounding(lambda x: d.cdf(x) - q, left, right, eps=1e-5)
        ref = norm.ppf(np.asarray(q), loc=[0, 1, -2], scale=[1, 2, 0.5])
        np.testing.assert_allclose(np.asarray(root), ref, atol=1e-3)


class TestSVGD:
    def test_rbf_phi_matches_autodiff_reference(self):
        """phi from analytic kernel-grad == reference formula via jax autodiff."""
        rs = np.random.RandomState(9)
        X = jnp.asarray(rs.randn(6, 4).astype(np.float32))
        score = jnp.asarray(rs.randn(6, 4).astype(np.float32))

        phi = svgd_ops.rbf_phi(X, score)

        # reference-style: K(X, stop_grad(X)), grad_K = -grad(sum K)
        d2 = sq_dists(X, jax.lax.stop_gradient(X))
        gamma = svgd_ops.rbf_median_gamma(d2)

        def ksum(Xv):
            return jnp.sum(jnp.exp(-gamma * sq_dists(Xv, jax.lax.stop_gradient(X))))

        K_xx = jnp.exp(-gamma * d2)
        grad_K = -jax.grad(ksum)(X)
        phi_ref = (K_xx @ score + grad_K) / X.shape[0]
        np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref), atol=1e-5)

    def test_imq_phi_matches_autodiff_reference(self):
        rs = np.random.RandomState(10)
        X = jnp.asarray(rs.randn(5, 3).astype(np.float32))
        score = jnp.asarray(rs.randn(5, 3).astype(np.float32))
        phi = svgd_ops.imq_phi(X, score, bandwidth=0.8)

        def kmat(Xv):
            norm_sq = (Xv[:, None, :] - jax.lax.stop_gradient(X)[None, :, :]) ** 2
            base = 0.5 + jnp.sum(norm_sq / 0.8, -1)
            return base**-0.5

        K_xx = kmat(X)
        grad_K = -jax.grad(lambda Xv: jnp.sum(kmat(Xv)))(X)
        phi_ref = (K_xx @ score + grad_K) / X.shape[0]
        np.testing.assert_allclose(np.asarray(phi), np.asarray(phi_ref), atol=1e-5)

    def test_svgd_converges_to_gaussian(self):
        """Particles transported toward N(3, 0.5^2): mean within tolerance."""
        import optax

        key = jax.random.PRNGKey(0)
        particles = jax.random.normal(key, (20, 1))

        def logp(x):
            return jnp.sum(-0.5 * ((x - 3.0) / 0.5) ** 2)

        opt = optax.adam(0.1)
        state = opt.init(particles)

        @jax.jit
        def step(p, s):
            score = jax.grad(logp)(p)
            phi = svgd_ops.rbf_phi(p, score)
            updates, s = opt.update(-phi, s, p)
            return optax.apply_updates(p, updates), s

        for _ in range(300):
            particles, state = step(particles, state)
        assert abs(float(jnp.mean(particles)) - 3.0) < 0.2
        assert abs(float(jnp.std(particles)) - 0.5) < 0.3


class TestGaussianKLCustomVJP:
    """The closed-form VJP of gaussian_kl_chol must match autodiff through
    the plain factorization core on both dispatch paths (unrolled N<=8,
    solve_triangular N>8). Reference semantics: GPR_meta_mlap.py:318-355."""

    @pytest.mark.parametrize("n", [5, 20])
    def test_value_and_grads_match_autodiff(self, n):
        from meta_learning_pacoh_tpu.ops.variational import (
            gaussian_kl_chol, _kl_factorize,
        )

        rs = np.random.RandomState(42 + n)
        m0 = jnp.asarray(rs.randn(n).astype(np.float32))
        m1 = jnp.asarray(rs.randn(n).astype(np.float32))
        L0 = jnp.asarray(np.tril(rs.randn(n, n)).astype(np.float32))
        L0 = L0.at[jnp.arange(n), jnp.arange(n)].set(
            jnp.abs(jnp.diagonal(L0)) + 0.5)
        K1 = jnp.asarray(_rand_psd(n, seed=7 + n))

        def plain(m0, L0, m1, K1):
            return _kl_factorize(m0, L0, m1, K1, 1e-6)[0]

        v_custom = gaussian_kl_chol(m0, L0, m1, K1)
        v_plain = plain(m0, L0, m1, K1)
        np.testing.assert_allclose(
            float(v_custom), float(v_plain), rtol=1e-6)

        g_custom = jax.grad(gaussian_kl_chol, argnums=(0, 1, 2, 3))(
            m0, L0, m1, K1)
        g_plain = jax.grad(plain, argnums=(0, 1, 2, 3))(m0, L0, m1, K1)
        # K1's entrywise gradient is representation-dependent: the unrolled
        # forward reads only K1's lower triangle so AD concentrates the
        # gradient there, while the custom VJP returns the symmetric form.
        # Both give identical chain-rule results for the symmetric gram
        # matrices every caller constructs — compare after symmetrizing.
        sym = lambda A: 0.5 * (np.asarray(A) + np.asarray(A).T)
        for gc, gp, name in zip(g_custom[:3], g_plain[:3], ["m0", "L0", "m1"]):
            np.testing.assert_allclose(
                np.asarray(gc), np.asarray(gp), rtol=2e-4, atol=2e-5,
                err_msg=f"grad mismatch on {name} (n={n})")
        np.testing.assert_allclose(
            sym(g_custom[3]), sym(g_plain[3]), rtol=2e-4, atol=2e-5,
            err_msg=f"grad mismatch on K1 (n={n})")

    def test_grad_under_vmap(self):
        """MLAP vmaps the KL over theta samples and tasks — the custom VJP
        must batch correctly."""
        from meta_learning_pacoh_tpu.ops.variational import (
            gaussian_kl_chol, _kl_factorize,
        )

        n, b = 5, 7
        rs = np.random.RandomState(3)
        m0 = jnp.asarray(rs.randn(b, n).astype(np.float32))
        m1 = jnp.asarray(rs.randn(b, n).astype(np.float32))
        L0 = jnp.asarray(
            np.tril(rs.randn(b, n, n)).astype(np.float32))
        idx = jnp.arange(n)
        L0 = L0.at[:, idx, idx].set(jnp.abs(L0[:, idx, idx]) + 0.5)
        K1 = jnp.stack(
            [jnp.asarray(_rand_psd(n, seed=s)) for s in range(b)])

        def tot_custom(m0, L0, m1, K1):
            return jnp.sum(jax.vmap(gaussian_kl_chol)(m0, L0, m1, K1))

        def tot_plain(m0, L0, m1, K1):
            return jnp.sum(jax.vmap(
                lambda a, b_, c, d: _kl_factorize(a, b_, c, d, 1e-6)[0]
            )(m0, L0, m1, K1))

        gc = jax.grad(tot_custom, argnums=(0, 1, 2, 3))(m0, L0, m1, K1)
        gp = jax.grad(tot_plain, argnums=(0, 1, 2, 3))(m0, L0, m1, K1)
        sym = lambda A: 0.5 * (np.asarray(A) + np.swapaxes(np.asarray(A), -1, -2))
        for a, b_ in zip(gc[:3], gp[:3]):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(sym(gc[3]), sym(gp[3]), rtol=2e-4, atol=2e-5)
