"""Plot test metric vs. number of meta-train tasks per learner.

Parity with the reference plot script (reference:
experiments/comparison_n_tasks/plot_comparison_n_tasks.py:1-160): read the
n-tasks sweep CSV(s) (experiments/baselines/baseline_comparison_n_tasks.py
rows: algo, dataset=<family>_<n>, n_train_tasks, seed, test_ll, test_rmse,
calib_err), aggregate mean/std over seeds per (family, learner, n_tasks),
and draw one panel per dataset family — mean curve + 95% CI band
(1.96 * std / sqrt(n_seeds)), log-scaled task axis, reference label names.

Usage:
    python plot_comparison_n_tasks.py --csv path1.csv[,path2.csv]
        [--metric test_rmse|test_ll] [--output plot.png]
"""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from collections import OrderedDict

import numpy as np
import pandas as pd
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("csv", "./baseline_comparison_n_tasks.csv",
                    "comma-separated sweep CSV paths")
flags.DEFINE_string("metric", "test_rmse", "test_rmse | test_ll")
flags.DEFINE_string("output", "./comparison_n_tasks.png", "output image")

# reference label mapping (plot_comparison_n_tasks.py:12-20)
LABELS = OrderedDict([
    ("pacoh_map", "PACOH-MAP"),
    ("pacoh_vi", "PACOH-VI"),
    ("pacoh_svgd", "PACOH-SVGD"),
    ("gpr_meta_mll", "MLL"),
    ("neural_process", "NP"),
    ("maml", "MAML"),
])


def aggregate(df, metric):
    """{family: {algo: [(n_tasks, mean, ci95), ...]}} over seeds."""
    df = df.dropna(subset=[metric])
    if "n_train_tasks" not in df.columns:
        df = df.assign(
            n_train_tasks=[int(d.split("_")[-1]) for d in df["dataset"]])
    df = df.assign(family=[d.split("_")[0] for d in df["dataset"]])
    out = {}
    for (family, algo, n), grp in df.groupby(
            ["family", "algo", "n_train_tasks"]):
        vals = np.asarray(grp[metric], dtype=float)
        ci = 1.96 * np.std(vals) / max(1.0, np.sqrt(len(vals)))
        out.setdefault(family, {}).setdefault(algo, []).append(
            (int(n), float(np.mean(vals)), float(ci)))
    for family in out.values():
        for algo in family:
            family[algo].sort()
    return out


def main(argv):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt
    from matplotlib.ticker import ScalarFormatter

    frames = [pd.read_csv(p) for p in FLAGS.csv.split(",")]
    result = aggregate(pd.concat(frames, ignore_index=True), FLAGS.metric)
    if not result:
        print("no rows to plot")
        return

    families = sorted(result)
    fig, axes = plt.subplots(1, len(families), figsize=(4 * len(families), 4),
                             squeeze=False)
    ylabel = {"test_rmse": "test RMSE", "test_ll": "test LL"}[FLAGS.metric]
    for ax, family in zip(axes[0], families):
        for algo, rows in sorted(result[family].items()):
            x, y, ci = map(np.array, zip(*rows))
            ax.plot(x, y, label=LABELS.get(algo, algo))
            ax.fill_between(x, y - ci, y + ci, alpha=0.2)
        ax.set_title(family)
        ax.set_xscale("log")
        ax.set_xlabel("number of tasks")
        ax.set_ylabel(ylabel)
        ax.set_xticks(sorted({r[0] for rs in result[family].values()
                              for r in rs}))
        ax.xaxis.set_major_formatter(ScalarFormatter())
    axes[0][0].legend()
    fig.tight_layout()
    fig.savefig(FLAGS.output, dpi=150)
    print(f"wrote {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
