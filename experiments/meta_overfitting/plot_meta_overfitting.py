"""Paper-style meta-overfitting plot: meta-train vs meta-test RMSE over the
number of meta-train tasks (reference:
experiments/meta_overfitting_v2/plots_meta_overfitting_v2_map_vs_mll_paper.py).

Reads the CSVs written by run_overfitting_sweep.py (one per dataset family),
aggregates mean/std over seeds, picks the best weight_decay per n_tasks for
PACOH-MAP (the reference's model selection, plots:29-41), and renders one
panel per CSV with 95% CI bands on a log task axis.
"""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import pandas as pd
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("csvs", "./meta_overfitting.csv",
                    "comma-separated sweep CSVs (one panel each)")
flags.DEFINE_string("output", "./meta_overfitting.png", "output figure path")
flags.DEFINE_bool("select_best_wd", True,
                  "pick the weight_decay minimizing mean meta-test RMSE per "
                  "n_tasks (the reference's PACOH-MAP aggregation)")
flags.DEFINE_integer("min_n_tasks", 4, "drop rows below this task count")


def aggregate(df, select_best_wd):
    df = df[df["n_tasks"] >= FLAGS.min_n_tasks]
    metrics = {"test_rmse_meta_train": [np.mean, np.std],
               "test_rmse_meta_test": [np.mean, np.std]}
    if select_best_wd and df["weight_decay"].nunique() > 1:
        rows, idx = [], []
        grouped = df.groupby(["n_tasks", "weight_decay"]).aggregate(metrics)
        for n_tasks in sorted(df["n_tasks"].unique()):
            sub = grouped.loc[n_tasks]
            rows.append(sub.loc[sub[("test_rmse_meta_test", "mean")].idxmin()])
            idx.append(n_tasks)
        return pd.concat(rows, axis=1, keys=idx).T
    return df.groupby(["n_tasks"]).aggregate(metrics)


def main(argv):
    from matplotlib import pyplot as plt

    csvs = FLAGS.csvs.split(",")
    fig, axes = plt.subplots(1, len(csvs), figsize=(4.5 * len(csvs), 3),
                             squeeze=False)
    for ax, csv_path in zip(axes[0], csvs):
        df = pd.read_csv(csv_path)
        n_seeds = max(df["seed"].nunique(), 1)
        agg = aggregate(df, FLAGS.select_best_wd)
        print(f"----- {csv_path} -----")
        print(agg.to_string(), "\n")
        x = np.asarray(agg.index, dtype=float)
        for metric, label in [("test_rmse_meta_train", "meta-train tasks"),
                              ("test_rmse_meta_test", "meta-test tasks")]:
            y = np.asarray(agg[(metric, "mean")], dtype=float)
            s = np.asarray(agg[(metric, "std")], dtype=float)
            ci = 1.96 * s / np.sqrt(n_seeds)
            ax.plot(x, y, label=label)
            ax.fill_between(x, y - ci, y + ci, alpha=0.2)
        dataset = str(df["dataset"].iloc[0]) if len(df) else csv_path
        ax.set_title(dataset)
        ax.set_xscale("log")
        ax.set_xlabel("number of tasks")
        ax.set_ylabel("test RMSE")
        ax.legend()
    fig.tight_layout()
    fig.savefig(FLAGS.output, dpi=150)
    print(f"wrote {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
