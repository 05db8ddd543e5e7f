"""Aggregate baseline_comparison CSV -> mean/std table per (algo, dataset)
(reference: experiments/baselines/summarize_baselines.py:30-40)."""

import sys

import pandas as pd
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("csv", "./baseline_comparison.csv", "input CSV")


def main(argv):
    df = pd.read_csv(FLAGS.csv)
    summary = df.groupby(["dataset", "algo"]).agg(
        test_ll_mean=("test_ll", "mean"), test_ll_std=("test_ll", "std"),
        rmse_mean=("test_rmse", "mean"), rmse_std=("test_rmse", "std"),
        calib_mean=("calib_err", "mean"), calib_std=("calib_err", "std"),
        n_seeds=("seed", "count"),
    )
    pd.set_option("display.width", 160)
    print(summary)
    return summary


if __name__ == "__main__":
    app.run(main)
