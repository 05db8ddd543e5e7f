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
flags.DEFINE_boolean(
    "seed_parallel", False,
    "vmap the seed axis: all seeds of one (n_tasks, wd) cell train inside "
    "one compiled program (parallel/seed_parallel.py) — the TPU-native "
    "replacement of the reference's one-Ray-worker-per-seed fan-out")

_NAN_METRICS = {k: np.nan for k in (
    "test_rmse_meta_train", "test_rmse_meta_test",
    "test_ll_meta_train", "test_ll_meta_test", "calib_err")}


def build_one(algo, dataset, n_tasks, weight_decay, seed, n_iter, n_test):
    """Reference protocol (meta_GPR_overfitting_base.py:75-110): the
    meta-train tasks come as (context, test) 4-tuples; training sees only the
    contexts, and BOTH the held-out points of the training tasks
    (*_meta_train, the overfitting probe) and fresh tasks (*_meta_test) are
    evaluated."""
    from meta_learning_pacoh_tpu import (
        GPRegressionMetaLearned, MAMLRegression, NPRegressionMetaLearned,
    )

    _, valid, test = provide_data(f"{dataset}_{n_tasks}", seed=seed)
    meta_train_tuples = valid[:n_tasks]  # 4-tuples; contexts train the prior
    train = [(cx, cy) for cx, cy, _, _ in meta_train_tuples]
    test = test[:n_test]
    if algo == "pacoh_map":
        m = GPRegressionMetaLearned(train, weight_decay=weight_decay,
                                    num_iter_fit=n_iter, random_seed=seed)
    elif algo == "np":
        m = NPRegressionMetaLearned(train, weight_decay=weight_decay,
                                    num_iter_fit=n_iter, random_seed=seed)
    elif algo == "maml":
        m = MAMLRegression(train, num_iter_fit=n_iter, random_seed=seed)
    else:
        raise ValueError(algo)
    return m, meta_train_tuples, test


def eval_one(algo, m, meta_train_tuples, test):
    if algo == "maml":
        return {"test_rmse_meta_train": m.eval_datasets(meta_train_tuples),
                "test_rmse_meta_test": m.eval_datasets(test),
                "test_ll_meta_train": np.nan, "test_ll_meta_test": np.nan,
                "calib_err": np.nan}
    ll_tr, rmse_tr, _ = m.eval_datasets(meta_train_tuples)
    ll_te, rmse_te, calib = m.eval_datasets(test)
    return {"test_rmse_meta_train": rmse_tr, "test_rmse_meta_test": rmse_te,
            "test_ll_meta_train": ll_tr, "test_ll_meta_test": ll_te,
            "calib_err": calib}


def run_one(algo, dataset, n_tasks, weight_decay, seed, n_iter, n_test):
    m, meta_train_tuples, test = build_one(
        algo, dataset, n_tasks, weight_decay, seed, n_iter, n_test)
    m.meta_fit(verbose=False, log_period=n_iter)
    return eval_one(algo, m, meta_train_tuples, test)


def run_seed_group(algo, dataset, n_tasks, weight_decay, seeds, n_iter,
                   n_test):
    """All seeds of one grid cell in a single vmapped training program."""
    from meta_learning_pacoh_tpu.parallel import fit_models_parallel

    built = [build_one(algo, dataset, n_tasks, weight_decay, s, n_iter,
                       n_test) for s in seeds]
    fit_models_parallel([m for m, _, _ in built], n_iter=n_iter)
    return [eval_one(algo, m, tr, te) for m, tr, te in built]


def main(argv):
    rows = []
    seeds = [int(s) for s in FLAGS.seeds.split(",")]
    for n_tasks in (int(s) for s in FLAGS.n_tasks_grid.split(",")):
        for wd in (float(s) for s in FLAGS.weight_decay_grid.split(",")):
            t0 = time.time()
            per_seed = None
            if FLAGS.seed_parallel:
                try:
                    per_seed = run_seed_group(
                        FLAGS.algo, FLAGS.dataset, n_tasks, wd, seeds,
                        FLAGS.n_iter_fit, FLAGS.n_test_tasks)
                except Exception as e:  # quarantine -> sequential fallback
                    print(f"seed-parallel FAILED n_tasks={n_tasks} wd={wd}: "
                          f"{e!r}; falling back to sequential")
            # In seed-parallel mode the whole group trains in one program, so
            # per-row duration is the group's wall-clock amortized over the
            # seeds (t0 is NOT reset inside the loop there — resetting it
            # would attribute all the training time to the first seed's row).
            group_duration = (
                (time.time() - t0) / len(seeds) if per_seed is not None
                else None)
            for i, seed in enumerate(seeds):
                if per_seed is not None:
                    metrics = per_seed[i]
                else:
                    try:
                        metrics = run_one(
                            FLAGS.algo, FLAGS.dataset, n_tasks, wd, seed,
                            FLAGS.n_iter_fit, FLAGS.n_test_tasks,
                        )
                    except Exception as e:
                        print(f"FAILED n_tasks={n_tasks} wd={wd} "
                              f"seed={seed}: {e!r}")
                        metrics = dict(_NAN_METRICS)
                rows.append({
                    "algo": FLAGS.algo, "dataset": FLAGS.dataset,
                    "n_tasks": n_tasks, "weight_decay": wd, "seed": seed,
                    **metrics,
                    "duration": (group_duration if group_duration is not None
                                 else time.time() - t0),
                })
                if group_duration is None:
                    t0 = time.time()
                print(rows[-1])
                pd.DataFrame(rows).to_csv(FLAGS.output_csv, index=False)


if __name__ == "__main__":
    app.run(main)
