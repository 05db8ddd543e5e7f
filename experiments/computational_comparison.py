"""Timing benchmark across the four PACOH variants (the reference repo's only
performance benchmark — experiments/compuational_comparison.py:46-99): time
per meta-train iteration and per-task meta-test inference on sin_20.

Reports both cold (first call, includes XLA compile) and warm timings; the
warm numbers are the steady-state per-iteration cost.
"""

import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from absl import app, flags

from meta_learning_pacoh_tpu import (
    GPRegressionMetaLearned,
    GPRegressionMetaLearnedPAC,
    GPRegressionMetaLearnedSVGD,
    GPRegressionMetaLearnedVI,
)
from meta_learning_pacoh_tpu.datasets import provide_data

FLAGS = flags.FLAGS
flags.DEFINE_integer("n_iter", 1000, "meta-train iterations to time")
flags.DEFINE_integer("n_repeats", 5, "timing repetitions")
flags.DEFINE_integer("n_test_tasks", 5, "tasks for meta-test timing")
flags.DEFINE_string("output", "", "optional JSON output path")


def build_models(meta_train):
    return {
        "PACOH-MAP": lambda: GPRegressionMetaLearned(
            meta_train, num_iter_fit=FLAGS.n_iter, random_seed=1),
        "PACOH-SVGD": lambda: GPRegressionMetaLearnedSVGD(
            meta_train, num_iter_fit=FLAGS.n_iter, random_seed=1),
        "PACOH-VI": lambda: GPRegressionMetaLearnedVI(
            meta_train, num_iter_fit=FLAGS.n_iter, random_seed=1),
        "PACOH-MLAP": lambda: GPRegressionMetaLearnedPAC(
            meta_train, num_iter_fit=FLAGS.n_iter, random_seed=1,
            covar_module="NN", mean_module="NN", meta_kl_weight=1e-3),
    }


def main(argv):
    meta_train, _, meta_test = provide_data("sin_20")
    meta_test = meta_test[: FLAGS.n_test_tasks]

    results = {}
    for name, builder in build_models(meta_train).items():
        model = builder()
        # cold: includes compile
        t0 = time.time()
        model.meta_fit(verbose=False, log_period=FLAGS.n_iter, n_iter=FLAGS.n_iter)
        cold = time.time() - t0
        # warm repeats
        warm = []
        for _ in range(FLAGS.n_repeats):
            t0 = time.time()
            model.meta_fit(verbose=False, log_period=FLAGS.n_iter, n_iter=FLAGS.n_iter)
            warm.append(time.time() - t0)
        per_iter_ms = 1000.0 * np.mean(warm) / FLAGS.n_iter

        # meta-test inference timing
        kwargs = {"n_iter_meta_test": 1000} if name == "PACOH-MLAP" else {}
        t0 = time.time()
        model.eval_datasets(meta_test, **kwargs)
        test_cold = time.time() - t0
        t0 = time.time()
        model.eval_datasets(meta_test, **kwargs)
        test_warm = time.time() - t0

        results[name] = {
            "train_iter_ms_warm": per_iter_ms,
            "train_cold_total_s": cold,
            "meta_test_per_task_s_warm": test_warm / len(meta_test),
            "meta_test_cold_total_s": test_cold,
        }
        print(f"{name}: {per_iter_ms:.3f} ms/iter (warm), "
              f"{results[name]['meta_test_per_task_s_warm']:.3f} s/task meta-test")

    if FLAGS.output:
        with open(FLAGS.output, "w") as f:
            json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    app.run(main)
