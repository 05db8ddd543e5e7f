"""Cross-algorithm baseline comparison: datasets x algorithms x seeds -> CSV.

Parity with the reference sweep (reference:
experiments/baselines/baseline_comparison.py): each (algo, dataset, seed)
cell trains a learner and records test LL/RMSE/calibration; failures are
recorded as NaN rows so the sweep keeps going (:120-123). The Ray fan-out is
replaced by a sequential loop (one TPU) or AsyncExecutor subprocess fan-out.
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
flags.DEFINE_string("datasets", "sin_20,cauchy_20", "comma-separated dataset keys")
flags.DEFINE_string("algos", "pacoh_map,pacoh_svgd,pacoh_vi,maml,np", "algorithms")
flags.DEFINE_string("seeds", "22,23,24,25,26", "comma-separated seeds")
flags.DEFINE_integer("n_iter_fit", 10000, "meta-train iterations")
flags.DEFINE_integer("n_test_tasks", 50, "test tasks to evaluate")
flags.DEFINE_string("output_csv", "./baseline_comparison.csv", "output CSV")


def run_cell(algo, dataset, seed, n_iter_fit, n_test_tasks):
    from meta_learning_pacoh_tpu import (
        GPRegressionMetaLearned,
        GPRegressionMetaLearnedSVGD,
        GPRegressionMetaLearnedVI,
        MAMLRegression,
        NPRegressionMetaLearned,
    )

    train, _, test = provide_data(dataset, seed=seed)
    test = test[:n_test_tasks]
    common = dict(num_iter_fit=n_iter_fit, random_seed=seed)
    if algo == "pacoh_map":
        model = GPRegressionMetaLearned(train, weight_decay=0.2, **common)
    elif algo == "pacoh_svgd":
        model = GPRegressionMetaLearnedSVGD(train, **common)
    elif algo == "pacoh_vi":
        model = GPRegressionMetaLearnedVI(train, **common)
    elif algo == "maml":
        model = MAMLRegression(train, **common)
    elif algo == "np":
        model = NPRegressionMetaLearned(train, **common)
    else:
        raise ValueError(algo)

    t0 = time.time()
    model.meta_fit(verbose=False, log_period=n_iter_fit)
    fit_time = time.time() - t0

    if algo == "maml":
        rmse = model.eval_datasets(test)
        return {"test_ll": np.nan, "test_rmse": rmse, "calib_err": np.nan,
                "fit_time": fit_time}
    ll, rmse, calib = model.eval_datasets(test)
    return {"test_ll": ll, "test_rmse": rmse, "calib_err": calib,
            "fit_time": fit_time}


def main(argv):
    rows = []
    for dataset in FLAGS.datasets.split(","):
        for algo in FLAGS.algos.split(","):
            for seed in (int(s) for s in FLAGS.seeds.split(",")):
                base = {"algo": algo, "dataset": dataset, "seed": seed}
                try:
                    metrics = run_cell(algo, dataset, seed, FLAGS.n_iter_fit,
                                       FLAGS.n_test_tasks)
                except Exception as e:
                    print(f"FAILED {base}: {e!r}")
                    metrics = {"test_ll": np.nan, "test_rmse": np.nan,
                               "calib_err": np.nan, "fit_time": np.nan}
                rows.append({**base, **metrics})
                print(rows[-1])
                pd.DataFrame(rows).to_csv(FLAGS.output_csv, index=False)
    print(f"wrote {len(rows)} rows to {FLAGS.output_csv}")


if __name__ == "__main__":
    app.run(main)
