"""Baseline comparison swept over the number of meta-train tasks.

Parity with the reference sweep (reference:
experiments/baselines/baseline_comparison_n_tasks.py): datasets =
{sin, cauchy} x n_tasks in {5, 10, 20, 40, 80, 160, 320}, data seed 28,
model seeds 22-26, all meta-learners; one CSV row per cell. The Ray fan-out
is replaced by a sequential loop (one TPU).
"""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import pandas as pd
from absl import app, flags

from experiments.baselines.baseline_comparison import run_cell

# algos / seeds / n_iter_fit / n_test_tasks / output_csv flags are shared
# with (and defined by) the imported baseline_comparison module
FLAGS = flags.FLAGS
flags.DEFINE_string("base_datasets", "sin,cauchy", "dataset families to sweep")
flags.DEFINE_string("n_tasks_grid", "5,10,20,40,80,160,320",
                    "comma-separated n_train_tasks values")
FLAGS.set_default("output_csv", "./baseline_comparison_n_tasks.csv")


def main(argv):
    datasets = [
        f"{family}_{n}"
        for n in (int(v) for v in FLAGS.n_tasks_grid.split(","))
        for family in FLAGS.base_datasets.split(",")
    ]
    rows = []
    for dataset in datasets:
        for algo in FLAGS.algos.split(","):
            for seed in (int(s) for s in FLAGS.seeds.split(",")):
                n_tasks = int(dataset.split("_")[-1])
                base = {"algo": algo, "dataset": dataset,
                        "n_train_tasks": n_tasks, "seed": seed}
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
