"""Same-process faceoff at the Swissfel shape (T=5 tasks x N=200 points):
fused big-N mega-kernels vs the honest competitor (fused kernels disabled,
blocked Pallas linalg tiers still on) for MAP / SVGD / VI.

One process, interleaved measurement, min-of-3 chunks — the axon tunnel
noise between separately-launched processes is +-600 us, so only
in-process comparisons decide dispatch policy.
"""
import os
import time

import numpy as np
import jax


def build(algo, n_iter=500, n_samples=200):
    from meta_learning_pacoh_tpu import (
        GPRegressionMetaLearned,
        GPRegressionMetaLearnedSVGD,
        GPRegressionMetaLearnedVI,
    )
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset

    env = SinusoidDataset(random_state=np.random.RandomState(5))
    train = env.generate_meta_train_data(n_tasks=5, n_samples=n_samples)
    cls = {"map": GPRegressionMetaLearned,
           "svgd": GPRegressionMetaLearnedSVGD,
           "vi": GPRegressionMetaLearnedVI}[algo]
    kw = {"num_particles": 10, "prior_factor": 0.01} if algo == "svgd" else {}
    return cls(train, num_iter_fit=n_iter, random_seed=1,
               task_batch_size=-1, **kw)


def state_leaf(m, algo):
    if algo == "svgd":
        return m.particles
    return m.params if algo == "map" else m.posterior


def time_fit(m, algo, n_iter=500):
    m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)  # warm
    out = []
    for _ in range(3):
        t0 = time.time()
        m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
        float(np.asarray(jax.tree.leaves(state_leaf(m, algo))[0]).ravel()[0])
        out.append((time.time() - t0) / n_iter * 1e6)
    return float(np.min(out))


if __name__ == "__main__":
    import sys

    args = sys.argv[1:]
    ns = [int(a.split("=")[1]) for a in args if a.startswith("n=")] or [200]
    algos = [a for a in args if not a.startswith("n=")] or [
        "map", "svgd", "vi"]
    print("devices:", jax.devices(), flush=True)
    for n_samples in ns:
        for algo in algos:
            m = build(algo, n_samples=n_samples)
            assert m._fused_path_ok(), (algo, n_samples)
            us_f = time_fit(m, algo)
            os.environ["PACOH_TPU_DISABLE_FUSED"] = "1"
            mx = build(algo, n_samples=n_samples)
            assert not mx._fused_path_ok()
            us_x = time_fit(mx, algo)
            del os.environ["PACOH_TPU_DISABLE_FUSED"]
            print(f"{algo:5s} N={n_samples:4d}  fused {us_f:8.1f} us/iter   "
                  f"xla+blocked {us_x:8.1f} us/iter   "
                  f"ratio {us_x / us_f:.2f}x", flush=True)
