"""Ablation profile of the PACOH-MLAP training step (VERDICT r2 next #7).

Times scan-fused 2000-iter chunks of progressively larger pieces of the
MLAP step on the flagship bench config (sin_20, NN/NN, S=5), so the
per-iteration cost decomposes into:

    rsample            posterior_rsample of S theta samples  [S, P]
    rsample+kl_outer   + closed-form hyper KL
    loss_fwd           + full PAC-bound loss (inner KLs, E[ll], complexity)
    loss_grad          value_and_grad of the loss
    full_step          + optax multi_transform update        (the real step)

Run on the real TPU chip (no JAX_PLATFORMS override); readback-fenced per
the axon-tunnel timing rules. Optionally pass --trace to dump a
jax.profiler trace of the full step for op-level attribution.
"""

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC
from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu.models.random_gp import (
    posterior_kl_to_prior,
    posterior_rsample,
)


def build_model(svi=5, n_tasks=20):
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=5)
    return GPRegressionMetaLearnedPAC(
        train, num_iter_fit=2000, random_seed=1, covar_module="NN",
        mean_module="NN", meta_kl_weight=1e-3, svi_batch_size=svi,
    )


def timed_chunk(fn, state, iters, reps=3):
    """fn: (state, keys) -> state scanned over `iters` keys, jitted."""
    keys = jax.random.split(jax.random.PRNGKey(0), iters)
    out = fn(state, keys)
    float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])  # warm + fence
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        out = fn(state, keys)
        float(jnp.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        best = min(best, (time.time() - t0) / iters)
    return best * 1e6  # us/iter


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--trace", default=None, help="profiler trace dir")
    ap.add_argument("--plain_kl", action="store_true",
                    help="A/B: bypass the custom KL VJP (AD through the "
                         "unrolled Cholesky) to measure its contribution")
    args = ap.parse_args()

    if args.plain_kl:
        import meta_learning_pacoh_tpu.algos.pacoh_mlap as _mlap
        from meta_learning_pacoh_tpu.ops.variational import _kl_factorize
        _mlap.gaussian_kl_chol = (
            lambda m0, L0, m1, K1, jitter=1e-6:
            _kl_factorize(m0, L0, m1, K1, jitter)[0])

    m = build_model()
    X, Y, M = jnp.asarray(m.X), jnp.asarray(m.Y), jnp.asarray(m.mask)
    params, opt_state = m.params, m.opt_state
    hyper_prior, svi = m.hyper_prior, m.svi_batch_size
    n_tasks = m.n_tasks

    # ---- the same loss the learner's step uses, reconstructed piecewise
    def loss_fn(params, key):
        theta = posterior_rsample(params["hyper_post"], key, svi)
        kl_outer = m.meta_kl_weight * posterior_kl_to_prior(
            params["hyper_post"], hyper_prior)
        noise_var = m._noise_var(params["raw_noise"])

        def per_task(i):
            b, _, _ = m._task_bound(
                params["q_means"][i], params["q_trils"][i], X[i], Y[i],
                theta, noise_var, kl_outer, float(n_tasks), mask=M[i])
            return b

        bounds = jax.vmap(per_task)(jnp.arange(n_tasks))
        meta_c = jnp.sqrt((kl_outer + math.log(2.0) + math.log(float(n_tasks))
                           - math.log(m.delta)) / (2.0 * (n_tasks - 1.0)))
        return jnp.mean(bounds) + meta_c

    def scan_over(body):
        @jax.jit
        def run(state, keys):
            return jax.lax.scan(body, state, keys)[0]
        return run

    # 1. rsample only (carry a running sum so nothing is DCE'd)
    def b_rsample(acc, key):
        theta = posterior_rsample(params["hyper_post"], key, svi)
        return acc + jnp.sum(theta), None

    # 2. + kl_outer
    def b_klout(acc, key):
        theta = posterior_rsample(params["hyper_post"], key, svi)
        klo = posterior_kl_to_prior(params["hyper_post"], hyper_prior)
        return acc + jnp.sum(theta) + klo, None

    # 3. full loss forward. Params must FLOW through the carry (tiny
    # perturbation) or XLA hoists every loop-invariant piece out of the
    # scan and the number measures nothing.
    def b_fwd(carry, key):
        p, acc = carry
        loss = loss_fn(p, key)
        p = jax.tree.map(lambda a: a + 1e-30 * loss, p)
        return (p, acc + loss), None

    # 4. value_and_grad + trivial SGD flow (isolates optax overhead when
    # compared with full_step)
    def b_grad(carry, key):
        p, acc = carry
        loss, grads = jax.value_and_grad(loss_fn)(p, key)
        p = jax.tree.map(lambda a, g: a - 1e-30 * g, p, grads)
        return (p, acc + loss), None

    # 5. full step (the learner's own compiled chunk)
    def full_step_time(iters):
        st = m.params
        m._step_fn(st, opt_state, X, Y, M, jax.random.PRNGKey(0), 0, iters)
        float(jnp.asarray(m.params["raw_noise"]))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            p2, *_ = m._step_fn(m.params, opt_state, X, Y, M,
                                jax.random.PRNGKey(0), 0, iters)
            float(jnp.asarray(p2["raw_noise"]))
            best = min(best, (time.time() - t0) / iters)
        return best * 1e6

    rows = {}
    rows["rsample"] = timed_chunk(scan_over(b_rsample), jnp.float32(0),
                                  args.iters)
    rows["rsample+kl_outer"] = timed_chunk(scan_over(b_klout),
                                           jnp.float32(0), args.iters)
    rows["loss_fwd"] = timed_chunk(scan_over(b_fwd),
                                   (params, jnp.float32(0)), args.iters)
    rows["loss_grad"] = timed_chunk(scan_over(b_grad),
                                    (params, jnp.float32(0)), args.iters)
    rows["full_step"] = full_step_time(args.iters)

    # scaling probes: S=1 and T=5 variants of the full step
    m_s1 = build_model(svi=1)
    rows["full_step_svi1"] = None
    st = m_s1._step_fn(m_s1.params, m_s1.opt_state, m_s1.X, m_s1.Y, m_s1.mask,
                       jax.random.PRNGKey(0), 0, args.iters)
    float(jnp.asarray(st[0]["raw_noise"]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        st = m_s1._step_fn(m_s1.params, m_s1.opt_state, m_s1.X, m_s1.Y,
                           m_s1.mask, jax.random.PRNGKey(0), 0, args.iters)
        float(jnp.asarray(st[0]["raw_noise"]))
        best = min(best, (time.time() - t0) / args.iters)
    rows["full_step_svi1"] = best * 1e6

    m_t5 = build_model(n_tasks=5)
    st = m_t5._step_fn(m_t5.params, m_t5.opt_state, m_t5.X, m_t5.Y, m_t5.mask,
                       jax.random.PRNGKey(0), 0, args.iters)
    float(jnp.asarray(st[0]["raw_noise"]))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        st = m_t5._step_fn(m_t5.params, m_t5.opt_state, m_t5.X, m_t5.Y,
                           m_t5.mask, jax.random.PRNGKey(0), 0, args.iters)
        float(jnp.asarray(st[0]["raw_noise"]))
        best = min(best, (time.time() - t0) / args.iters)
    rows["full_step_t5"] = best * 1e6

    print(f"{'stage':24s} us/iter")
    for k, v in rows.items():
        print(f"{k:24s} {v:8.1f}")

    if args.trace:
        with jax.profiler.trace(args.trace):
            m._step_fn(m.params, opt_state, X, Y, M,
                       jax.random.PRNGKey(0), 0, 200)
            float(jnp.asarray(m.params["raw_noise"]))
        print("trace written to", args.trace)


if __name__ == "__main__":
    main()
