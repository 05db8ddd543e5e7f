"""TPU sweep: fused big-N chunk width _GC (8 batch-major vs 16/32
lane-major leaf regimes) at the Swissfel shape T=5/N=200.

Usage: python tools/bign_gc_sweep.py [--algo svgd|vi] [GC ...]

Only SVGD and VI consume the shared `fused_svgd_bign_kernel._GC` knob;
the MAP big-N kernel has no GC chunking (its G equals the task count),
so sweeping it for MAP would re-run identical kernels.

In-process comparison (same tunnel state); each config re-traces.
"""
import argparse
import time

import numpy as np
import jax

from meta_learning_pacoh_tpu.ops.pallas import fused_svgd_bign_kernel as bk
from meta_learning_pacoh_tpu import (
    GPRegressionMetaLearnedSVGD,
    GPRegressionMetaLearnedVI,
)
from meta_learning_pacoh_tpu.datasets import SinusoidDataset

ALGOS = {"svgd": GPRegressionMetaLearnedSVGD, "vi": GPRegressionMetaLearnedVI}


def build(algo, n_iter=500):
    env = SinusoidDataset(random_state=np.random.RandomState(5))
    train = env.generate_meta_train_data(n_tasks=5, n_samples=200)
    return ALGOS[algo](train, num_iter_fit=n_iter, random_seed=1,
                       task_batch_size=-1)


def readback(m):
    f = m._fused
    src = f.packed["nz"] if hasattr(f, "packed") else f.last_loss
    return float(np.asarray(src).reshape(-1)[0])


def time_fit(m, n_iter=500):
    m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)  # warm
    out = []
    for _ in range(3):
        t0 = time.time()
        m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
        readback(m)
        out.append((time.time() - t0) / n_iter * 1e6)
    return float(np.min(out))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--algo", choices=sorted(ALGOS), default="svgd",
                   help="learner whose fused big-N kernel reads _GC "
                        "(MAP's does not — excluded)")
    p.add_argument("gcs", nargs="*", type=int, default=[8, 16, 32],
                   metavar="GC", help="chunk widths to sweep")
    a = p.parse_args()
    print("devices:", jax.devices(), "algo:", a.algo, flush=True)
    for gc in a.gcs:
        bk._GC = gc
        jax.clear_caches()
        try:
            m = build(a.algo)
            assert m._fused_path_ok()
            us = time_fit(m)
            ev = readback(m)
            print(f"GC={gc:3d}  {us:8.1f} us/iter  (readback {ev:.4f})",
                  flush=True)
        except Exception as e:  # noqa: BLE001 — sweep survives bad configs
            print(f"GC={gc:3d}  FAILED: {type(e).__name__}: {str(e)[:140]}",
                  flush=True)
