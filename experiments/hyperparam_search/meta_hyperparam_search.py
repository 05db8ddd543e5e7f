"""TPE hyperparameter search per algorithm + top-config seeded re-evaluation.

Parity with the reference search pipeline (reference:
experiments/hyperparam_search/meta_mll_hyperparm.py:31-157): a TPE-suggested
search over the algorithm's hyperparameters reporting test_ll/test_rmse/
calib_err, then the top-N configs re-run over multiple test seeds. The
ray-tune + hyperopt machinery is replaced by meta_learning_pacoh_tpu.utils.tuning
(same interface: search space -> trials -> select_best_configs -> re-eval).
"""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
import pandas as pd
from absl import app, flags

from meta_learning_pacoh_tpu.datasets import provide_data
from meta_learning_pacoh_tpu.utils.tuning import (
    Choice, LogUniform, Uniform, select_best_configs, tune_run,
)

FLAGS = flags.FLAGS
flags.DEFINE_string(
    "algo", "pacoh_map",
    "pacoh_map | pacoh_svgd | pacoh_vi | pacoh_mlap")
flags.DEFINE_string("dataset", "sin_20", "dataset key")
flags.DEFINE_integer("num_samples", 40, "number of TPE trials")
flags.DEFINE_integer("n_iter_fit", 10000, "meta-train iterations per trial")
flags.DEFINE_integer("n_eval_tasks", 40, "validation tasks per trial")
flags.DEFINE_integer("n_test_seeds", 5, "seeds for final re-evaluation")
flags.DEFINE_integer("top_n", 5, "top configs to re-evaluate")
flags.DEFINE_string("local_dir", "./tune_out", "tuning state directory")
flags.DEFINE_boolean("resume", False, "resume from experiment state")
flags.DEFINE_boolean(
    "seed_parallel", False,
    "vmap the re-evaluation seeds of each top config into one compiled "
    "program (parallel/seed_parallel.py) instead of looping them")
flags.DEFINE_integer(
    "trial_batch_size", 1,
    "run TPE trials in batches of this size: same-shape configs are "
    "vmapped into one compiled program over their continuous "
    "hyperparameters — lr/weight_decay (pacoh_map), lr/prior_factor/"
    "bandwidth (pacoh_svgd), lr/prior_factor (pacoh_vi) "
    "(utils/tuning_parallel.py; other algos run each batch sequentially)")

# config keys that change tensor shapes / compiled-step structure — trials
# are only vmapped together within a group that agrees on all of them
BATCH_STATIC_KEYS = {
    "pacoh_map": ("feature_dim", "task_batch_size"),
    "pacoh_svgd": ("num_particles",),
    "pacoh_vi": ("svi_batch_size",),
}


def search_space(algo):
    if algo == "pacoh_map":
        return {
            "lr": LogUniform(5e-4, 5e-3),
            "weight_decay": LogUniform(1e-3, 1.0),
            "feature_dim": Choice([2, 4, 8]),
            "task_batch_size": Choice([4, 10, 20]),
        }
    if algo == "pacoh_svgd":
        return {
            "lr": LogUniform(5e-4, 5e-3),
            "prior_factor": LogUniform(1e-4, 1e-1),
            "bandwidth": Uniform(0.1, 10.0),
            "num_particles": Choice([5, 10]),
        }
    if algo == "pacoh_vi":
        return {
            "lr": LogUniform(5e-4, 5e-3),
            "prior_factor": LogUniform(1e-4, 1e-1),
            "svi_batch_size": Choice([5, 10]),
        }
    if algo == "pacoh_mlap":
        # dimensions ported from the reference MLAP TPE search
        # (reference: experiments/hyperparam_search/meta_mlap_hyperparam.py:104-112)
        return {
            "task_kl_weight": LogUniform(5e-2, 1.0),
            "meta_kl_weight": LogUniform(1e-7, 1.0),
            "lr": LogUniform(1e-4, 1e-3),
            "lr_decay": LogUniform(0.92, 0.97),
            "posterior_lr_multiplier": LogUniform(1.0, 10.0),
            "svi_batch_size": Choice([5, 10]),
            "task_batch_size": Choice([5, 20]),
        }
    raise ValueError(algo)


def build_model(algo, config, dataset, seed, n_iter):
    from meta_learning_pacoh_tpu import (
        GPRegressionMetaLearned,
        GPRegressionMetaLearnedSVGD,
        GPRegressionMetaLearnedVI,
    )

    train, valid, test = provide_data(dataset, seed=seed)
    if algo == "pacoh_map":
        model = GPRegressionMetaLearned(
            train, lr_params=config["lr"], weight_decay=config["weight_decay"],
            feature_dim=int(config["feature_dim"]),
            task_batch_size=int(config["task_batch_size"]),
            num_iter_fit=n_iter, random_seed=seed,
        )
    elif algo == "pacoh_svgd":
        model = GPRegressionMetaLearnedSVGD(
            train, lr=config["lr"], prior_factor=config["prior_factor"],
            bandwidth=config["bandwidth"], num_particles=int(config["num_particles"]),
            num_iter_fit=n_iter, random_seed=seed,
        )
    elif algo == "pacoh_vi":
        model = GPRegressionMetaLearnedVI(
            train, lr=config["lr"], prior_factor=config["prior_factor"],
            svi_batch_size=int(config["svi_batch_size"]),
            num_iter_fit=n_iter, random_seed=seed,
        )
    elif algo == "pacoh_mlap":
        from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC

        model = GPRegressionMetaLearnedPAC(
            train, lr=config["lr"], lr_decay=config["lr_decay"],
            task_kl_weight=config["task_kl_weight"],
            meta_kl_weight=config["meta_kl_weight"],
            posterior_lr_multiplier=config["posterior_lr_multiplier"],
            svi_batch_size=int(config["svi_batch_size"]),
            task_batch_size=int(config["task_batch_size"]),
            mean_module="NN", covar_module="NN",
            num_iter_fit=n_iter, random_seed=seed,
        )
    else:
        raise ValueError(algo)
    return model, test


def build_and_eval(algo, config, dataset, seed, n_iter, n_eval_tasks):
    model, test = build_model(algo, config, dataset, seed, n_iter)
    model.meta_fit(verbose=False, log_period=n_iter)
    ll, rmse, calib = model.eval_datasets(test[:n_eval_tasks])
    return {"test_ll": ll, "test_rmse": rmse, "calib_err": calib}


def eval_config_over_seeds_parallel(algo, config, dataset, seeds, n_iter,
                                    n_eval_tasks):
    """One vmapped training program for all re-evaluation seeds of a config
    (the reference fans these to Ray workers, meta_mll_hyperparm.py:150)."""
    from meta_learning_pacoh_tpu.parallel import fit_models_parallel

    built = [build_model(algo, config, dataset, s, n_iter) for s in seeds]
    fit_models_parallel([m for m, _ in built], n_iter=n_iter)
    out = []
    for model, test in built:
        ll, rmse, calib = model.eval_datasets(test[:n_eval_tasks])
        out.append({"test_ll": ll, "test_rmse": rmse, "calib_err": calib})
    return out


def main(argv):
    algo, dataset = FLAGS.algo, FLAGS.dataset

    def trial(config):
        return build_and_eval(algo, config, dataset, seed=28,
                              n_iter=FLAGS.n_iter_fit,
                              n_eval_tasks=FLAGS.n_eval_tasks)

    batch_trial = None
    if FLAGS.trial_batch_size > 1 and algo in BATCH_STATIC_KEYS:
        from meta_learning_pacoh_tpu.utils.tuning_parallel import (
            run_trial_batch,
        )

        def batch_trial(configs):
            tests = {}

            def build(config):
                model, test = build_model(algo, config, dataset, seed=28,
                                          n_iter=FLAGS.n_iter_fit)
                tests[id(model)] = test
                return model

            def evaluate(model):
                ll, rmse, calib = model.eval_datasets(
                    tests[id(model)][:FLAGS.n_eval_tasks])
                return {"test_ll": ll, "test_rmse": rmse, "calib_err": calib}

            return run_trial_batch(configs, build, evaluate,
                                   n_iter=FLAGS.n_iter_fit,
                                   static_keys=BATCH_STATIC_KEYS[algo])

    analysis = tune_run(
        trial, search_space(algo), num_samples=FLAGS.num_samples,
        metric="test_ll", mode="max", local_dir=FLAGS.local_dir,
        name=f"{algo}_{dataset}", resume=FLAGS.resume,
        batch_size=FLAGS.trial_batch_size, batch_trial_fn=batch_trial,
    )

    best = select_best_configs(analysis, metric="test_ll", N=FLAGS.top_n)
    print("top configs:", best)

    # seeded re-evaluation of the best configs (ref :132-157)
    rows = []
    seeds = list(range(31, 31 + FLAGS.n_test_seeds))
    for rank, config in enumerate(best):
        if FLAGS.seed_parallel:
            per_seed = eval_config_over_seeds_parallel(
                algo, config, dataset, seeds, n_iter=FLAGS.n_iter_fit,
                n_eval_tasks=FLAGS.n_eval_tasks)
        else:
            per_seed = [build_and_eval(algo, config, dataset, seed=s,
                                       n_iter=FLAGS.n_iter_fit,
                                       n_eval_tasks=FLAGS.n_eval_tasks)
                        for s in seeds]
        for seed, metrics in zip(seeds, per_seed):
            rows.append({"rank": rank, "seed": seed, **config, **metrics})
            print(rows[-1])
    df = pd.DataFrame(rows)
    out = os.path.join(FLAGS.local_dir, f"best_configs_{algo}_{dataset}.csv")
    df.to_csv(out, index=False)
    print(df.groupby("rank")[["test_ll", "test_rmse", "calib_err"]].agg(["mean", "std"]))


if __name__ == "__main__":
    app.run(main)
