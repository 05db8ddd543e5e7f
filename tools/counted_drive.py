"""TPU verify drive for the counted (sampled-task-batch) fused SVGD/VI paths.

Runs each learner at task_batch_size < n_tasks twice on the real chip —
fused (default) and XLA (PACOH_TPU_DISABLE_PALLAS=1) — on the same seed and
compares the trained state; then times the fused counted path.
"""
import os
import time

import numpy as np
import jax

from meta_learning_pacoh_tpu import (
    GPRegressionMetaLearnedSVGD,
    GPRegressionMetaLearnedVI,
)
from meta_learning_pacoh_tpu.datasets import SinusoidDataset


def tasks():
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    return env.generate_meta_train_data(n_tasks=20, n_samples=5)


def build(kind, mt):
    if kind == "svgd":
        return GPRegressionMetaLearnedSVGD(
            mt, num_iter_fit=2000, random_seed=30, task_batch_size=5,
            num_particles=10)
    return GPRegressionMetaLearnedVI(
        mt, num_iter_fit=2000, random_seed=30, task_batch_size=5,
        svi_batch_size=10)


def state_of(kind, m):
    if kind == "svgd":
        return {"particles": np.asarray(m.particles)}
    return {k: np.asarray(v) for k, v in m.posterior.items()}


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    mt = tasks()
    for kind in ("svgd", "vi"):
        m_f = build(kind, mt)
        assert m_f._fused_path_ok(), f"{kind}: counted fused gate must open"
        assert m_f._weight_by_counts()
        t0 = time.time()
        m_f.meta_fit(verbose=False, log_period=2000, n_iter=2000)
        s_f = state_of(kind, m_f)
        compile_s = time.time() - t0
        t0 = time.time()
        m_f.meta_fit(verbose=False, log_period=2000, n_iter=2000)
        state_of(kind, m_f)
        warm_us = (time.time() - t0) / 2000 * 1e6

        os.environ["PACOH_TPU_DISABLE_PALLAS"] = "1"
        m_x = build(kind, mt)
        assert not m_x._fused_path_ok()
        m_x.meta_fit(verbose=False, log_period=2000, n_iter=2000)
        m_x.meta_fit(verbose=False, log_period=2000, n_iter=2000)
        t0 = time.time()
        m_x.meta_fit(verbose=False, log_period=2000, n_iter=2000)
        s_x3 = state_of(kind, m_x)
        warm_x_us = (time.time() - t0) / 2000 * 1e6
        del os.environ["PACOH_TPU_DISABLE_PALLAS"]

        # trajectory agreement after the FIRST 2000 steps (fresh XLA build)
        os.environ["PACOH_TPU_DISABLE_PALLAS"] = "1"
        m_x1 = build(kind, mt)
        m_x1.meta_fit(verbose=False, log_period=2000, n_iter=2000)
        s_x = state_of(kind, m_x1)
        del os.environ["PACOH_TPU_DISABLE_PALLAS"]
        dmax = max(float(np.max(np.abs(s_f[k] - s_x[k]))) for k in s_f)
        print(f"{kind}: fused {warm_us:.1f} us/iter vs XLA {warm_x_us:.1f} "
              f"us/iter ({warm_x_us / warm_us:.2f}x); max |dstate| after "
              f"2000 steps {dmax:.3e} (compile {compile_s:.0f}s)", flush=True)
