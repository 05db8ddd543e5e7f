"""Driver benchmark: PACOH-SVGD meta-training throughput on 20-task Sinusoid.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json / BASELINE.md north star): PACOH-SVGD meta-training,
20-task Sinusoid, 10 particles, < 60 s wall-clock on one TPU v5e chip for the
default 10000-iteration fit => 166.7 steps/sec baseline. vs_baseline is the
speedup over that target.
"""

import json
import time

import numpy as np


def main():
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset
    from meta_learning_pacoh_tpu import GPRegressionMetaLearnedSVGD

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    meta_train = env.generate_meta_train_data(n_tasks=20, n_samples=5)
    meta_test = env.generate_meta_test_data(n_tasks=20, n_samples_context=5,
                                            n_samples_test=50)

    m = GPRegressionMetaLearnedSVGD(
        meta_train, num_iter_fit=10000, num_particles=10, random_seed=30,
        prior_factor=0.01, task_batch_size=-1,
    )
    # warm-up with the SAME chunk length so the timed run recompiles nothing
    # (the tunneled remote-compile service can stall for minutes)
    n_iter = 10000
    m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
    float(m.particles[0, 0])  # readback fence (block_until_ready is
    # unreliable through the tunneled runtime)

    t0 = time.time()
    m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
    float(m.particles[0, 0])
    elapsed = time.time() - t0
    steps_per_sec = n_iter / elapsed

    ll, rmse, calib = m.eval_datasets(meta_test)

    # driver micro-metric (BASELINE.json): batched Cholesky+LML gradient, us
    import jax
    import jax.numpy as jnp

    from meta_learning_pacoh_tpu.ops.gp import gp_mll_batch

    B, N = 200, 20
    rs = np.random.RandomState(0)
    A = rs.randn(B, N + 3, N).astype(np.float32)
    K = jnp.asarray(np.einsum("bin,bim->bnm", A, A) / N)
    mean = jnp.zeros((B, N))
    yv = jnp.asarray(rs.randn(B, N).astype(np.float32))
    grad_fn = jax.jit(jax.grad(lambda k: jnp.sum(gp_mll_batch(mean, k, yv, 0.3))))
    g = grad_fn(K)
    float(g[0, 0, 0])  # compile + fence
    t0 = time.time()
    for _ in range(50):
        g = grad_fn(K)
    float(g[0, 0, 0])
    mll_grad_us = (time.time() - t0) / 50 * 1e6

    baseline_steps_per_sec = 10000 / 60.0  # north-star: 10k-iter fit in <60 s
    print(json.dumps({
        "metric": "pacoh_svgd_meta_train_steps_per_sec_sin20",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 3),
        "extra": {
            "elapsed_sec_10k_iters": round(elapsed, 3),
            "test_ll": round(ll, 4),
            "test_rmse": round(rmse, 4),
            "calib_err": round(calib, 4),
            "batched_chol_lml_grad_us_B200_N20": round(mll_grad_us, 1),
        },
    }))


if __name__ == "__main__":
    main()
