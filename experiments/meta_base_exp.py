"""Shared absl-flags CLI for meta-learning experiments.

One generic runner behind the per-algorithm entry points (reference:
experiments/meta_GPR_{mll,vi,SVGD}_base_exp.py): build the dataset from the
registry, construct the learner, meta_fit, eval on the test split, and write
config.json + results.json into an md5-hashed run directory.
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import flags

from meta_learning_pacoh_tpu.datasets import provide_data
from meta_learning_pacoh_tpu.utils.experiment import save_results, setup_exp_doc

FLAGS = flags.FLAGS

flags.DEFINE_string("dataset", "sin_20", "dataset registry string")
flags.DEFINE_integer("seed", 28, "random seed")
flags.DEFINE_integer("n_iter_fit", 10000, "number of meta-training iterations")
flags.DEFINE_integer("n_train_tasks", -1, "override number of train tasks (-1 = default)")
flags.DEFINE_integer("n_train_samples", -1, "override samples per task (-1 = default)")
flags.DEFINE_string("mean_module", "NN", "mean module: NN | constant | zero")
flags.DEFINE_string("covar_module", "NN", "covar module: NN | SE")
flags.DEFINE_integer("feature_dim", 2, "kernel NN feature dim")
flags.DEFINE_string("nn_layers", "32,32", "hidden layer sizes, comma-separated")
flags.DEFINE_float("lr", 1e-3, "learning rate")
flags.DEFINE_float("lr_decay", 1.0, "multiplicative lr decay per 1000 steps")
flags.DEFINE_integer("task_batch_size", 5, "tasks per meta-gradient step")
flags.DEFINE_integer("log_period", 1000, "steps between log lines")
flags.DEFINE_string("data_dir", "./exp_results", "output directory")
flags.DEFINE_boolean("normalize_data", True, "z-score normalization")


def nn_layers():
    return tuple(int(s) for s in FLAGS.nn_layers.split(","))


def load_data():
    n_tasks = None if FLAGS.n_train_tasks < 0 else FLAGS.n_train_tasks
    n_samples = None if FLAGS.n_train_samples < 0 else FLAGS.n_train_samples
    return provide_data(FLAGS.dataset, seed=FLAGS.seed, n_train_tasks=n_tasks,
                        n_samples=n_samples)


def run_experiment(exp_name, build_model, extra_flags=()):
    """build_model(meta_train_data) -> learner with meta_fit/eval_datasets."""
    flag_names = [
        "dataset", "seed", "n_iter_fit", "n_train_tasks", "n_train_samples",
        "mean_module", "covar_module", "feature_dim", "nn_layers", "lr",
        "lr_decay", "task_batch_size", "normalize_data", *extra_flags,
    ]
    flags_dict = {name: getattr(FLAGS, name) for name in flag_names}
    run_dir = setup_exp_doc(exp_name, flags_dict, FLAGS.data_dir)

    data_train, data_valid, data_test = load_data()
    model = build_model(data_train)

    t0 = time.time()
    model.meta_fit(valid_tuples=data_valid[:10], log_period=FLAGS.log_period,
                   n_iter=FLAGS.n_iter_fit)
    fit_time = time.time() - t0

    t0 = time.time()
    test_ll, test_rmse, calib_err = model.eval_datasets(data_test)
    eval_time = time.time() - t0

    results = {
        "test_ll": test_ll,
        "test_rmse": test_rmse,
        "calib_err": calib_err,
        "fit_time_sec": fit_time,
        "eval_time_sec": eval_time,
    }
    save_results(results, run_dir)
    print(f"{exp_name}: LL={test_ll:.4f} RMSE={test_rmse:.4f} calib={calib_err:.4f}")
    return results
