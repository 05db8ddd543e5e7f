"""Meta-overfitting study: sweep n_train_tasks x weight_decay x seeds for
PACOH-MAP (and optionally MAML / NP), the paper experiment driven by the
reference's meta_overfitting_v2 launchers (reference:
experiments/meta_overfitting_v2/meta-overfitting-pacoh-map.py:35-76).

Runs in-process (the learners are fast on TPU); results accumulate in a CSV.
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import pandas as pd
from absl import app, flags

from meta_learning_pacoh_tpu.datasets import provide_data

FLAGS = flags.FLAGS
flags.DEFINE_string("dataset", "sin", "dataset family (sin | cauchy | ...)")
flags.DEFINE_string("algo", "pacoh_map", "pacoh_map | maml | np")
flags.DEFINE_string("n_tasks_grid", "2,4,8,16,32,64,128,256,512", "task counts")
flags.DEFINE_string("weight_decay_grid", "0.0,0.1,0.2,0.5,1.0", "weight decays")
flags.DEFINE_string("seeds", "22,23,24,25,26", "seeds")
flags.DEFINE_integer("n_iter_fit", 10000, "meta-train iterations")
flags.DEFINE_integer("n_test_tasks", 50, "test tasks")
flags.DEFINE_string("output_csv", "./meta_overfitting.csv", "output CSV")


def run_one(algo, dataset, n_tasks, weight_decay, seed, n_iter, n_test):
    from meta_learning_pacoh_tpu import (
        GPRegressionMetaLearned, MAMLRegression, NPRegressionMetaLearned,
    )

    train, _, test = provide_data(f"{dataset}_{n_tasks}", seed=seed)
    test = test[:n_test]
    if algo == "pacoh_map":
        m = GPRegressionMetaLearned(train, weight_decay=weight_decay,
                                    num_iter_fit=n_iter, random_seed=seed)
        m.meta_fit(verbose=False, log_period=n_iter)
        ll, rmse, calib = m.eval_datasets(test)
    elif algo == "np":
        m = NPRegressionMetaLearned(train, weight_decay=weight_decay,
                                    num_iter_fit=n_iter, random_seed=seed)
        m.meta_fit(verbose=False, log_period=n_iter)
        ll, rmse, calib = m.eval_datasets(test)
    elif algo == "maml":
        m = MAMLRegression(train, num_iter_fit=n_iter, random_seed=seed)
        m.meta_fit(verbose=False, log_period=n_iter)
        ll, calib = np.nan, np.nan
        rmse = m.eval_datasets(test)
    else:
        raise ValueError(algo)
    return ll, rmse, calib


def main(argv):
    rows = []
    for n_tasks in (int(s) for s in FLAGS.n_tasks_grid.split(",")):
        for wd in (float(s) for s in FLAGS.weight_decay_grid.split(",")):
            for seed in (int(s) for s in FLAGS.seeds.split(",")):
                t0 = time.time()
                try:
                    ll, rmse, calib = run_one(
                        FLAGS.algo, FLAGS.dataset, n_tasks, wd, seed,
                        FLAGS.n_iter_fit, FLAGS.n_test_tasks,
                    )
                except Exception as e:
                    print(f"FAILED n_tasks={n_tasks} wd={wd} seed={seed}: {e!r}")
                    ll = rmse = calib = np.nan
                rows.append({
                    "algo": FLAGS.algo, "dataset": FLAGS.dataset,
                    "n_tasks": n_tasks, "weight_decay": wd, "seed": seed,
                    "test_ll": ll, "test_rmse": rmse, "calib_err": calib,
                    "duration": time.time() - t0,
                })
                print(rows[-1])
                pd.DataFrame(rows).to_csv(FLAGS.output_csv, index=False)


if __name__ == "__main__":
    app.run(main)
