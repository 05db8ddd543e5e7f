"""Verify drive for the big-N fused VI path on the real TPU.

Trains the Swissfel-shaped config (T=5 tasks x N=200 points, S=10 svi
samples) through the fused big-N VI mega-kernel, checks learning +
predict/CI outputs, and times the warm per-iteration cost against the
same-config path with fused kernels disabled (blocked Pallas linalg tiers
still on — the real competitor).
"""
import os
import time

import numpy as np
import jax

from meta_learning_pacoh_tpu import GPRegressionMetaLearnedVI
from meta_learning_pacoh_tpu.datasets import SinusoidDataset


def build(n_tasks=5, n_samples=200, n_iter=500, **kw):
    env = SinusoidDataset(random_state=np.random.RandomState(5))
    train = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=n_samples)
    return GPRegressionMetaLearnedVI(
        train, num_iter_fit=n_iter, random_seed=1, task_batch_size=-1,
        **kw), env


def time_fit(m, n_iter=500):
    m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)  # warm
    samples = []
    for _ in range(3):
        t0 = time.time()
        m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
        float(np.asarray(jax.tree.leaves(m.posterior)[0]).ravel()[0])
        samples.append((time.time() - t0) / n_iter * 1e6)
    return float(np.min(samples))


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)

    m, env = build()
    print("fused_path_ok (T=5, N=200):", m._fused_path_ok(), flush=True)
    assert m._fused_path_ok()
    t0 = time.time()
    us = time_fit(m)
    print(f"fused big-N VI: {us:.1f} us/iter  (total incl. compile "
          f"{time.time() - t0:.0f}s)", flush=True)

    test = env.generate_meta_test_data(
        n_tasks=5, n_samples_context=200, n_samples_test=50)
    ll, rmse, calib = m.eval_datasets(test)
    print(f"eval: LL {ll:.3f} RMSE {rmse:.3f} calib {calib:.3f}", flush=True)
    assert np.isfinite(ll) and rmse < 1.0, "training must actually learn"
    xs = np.linspace(-5, 5, 150)
    mean, std = m.predict(test[0][0], test[0][1], xs)
    ucb, lcb = m.confidence_intervals(test[0][0], test[0][1], xs)
    assert np.all(np.isfinite(mean)) and np.all(std > 0)
    assert np.all(ucb >= lcb)
    print("predict/CI: finite, ordered", flush=True)

    # the real competitor: fused kernels off, Pallas linalg tiers still on
    os.environ["PACOH_TPU_DISABLE_FUSED"] = "1"
    m_x, _ = build()
    assert not m_x._fused_path_ok()
    us_x = time_fit(m_x)
    print(f"XLA+blocked: {us_x:.1f} us/iter   fused speedup {us_x/us:.2f}x",
          flush=True)
    del os.environ["PACOH_TPU_DISABLE_FUSED"]
