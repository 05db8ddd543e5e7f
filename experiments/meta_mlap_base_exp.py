"""PACOH-MLAP experiment CLI (reference: GPR_meta_mlap __main__ block)."""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags

from experiments.meta_base_exp import FLAGS, nn_layers, run_experiment
from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC

flags.DEFINE_float("task_kl_weight", 1.0, "inner-KL weight")
flags.DEFINE_float("meta_kl_weight", 1e-5, "outer-KL weight")
flags.DEFINE_float("posterior_lr_multiplier", 5.0, "task-posterior lr multiplier")
flags.DEFINE_integer("svi_batch_size", 5, "hyper-posterior samples per step")
flags.DEFINE_string("cov_type", "diag", "hyper-posterior covariance: diag | full")
flags.DEFINE_integer("n_iter_meta_test", 3000, "per-task meta-test Adam steps")


def main(argv):
    def build(meta_train_data):
        return GPRegressionMetaLearnedPAC(
            meta_train_data,
            num_iter_fit=FLAGS.n_iter_fit,
            feature_dim=FLAGS.feature_dim,
            task_kl_weight=FLAGS.task_kl_weight,
            meta_kl_weight=FLAGS.meta_kl_weight,
            posterior_lr_multiplier=FLAGS.posterior_lr_multiplier,
            covar_module=FLAGS.covar_module,
            mean_module=FLAGS.mean_module,
            mean_nn_layers=nn_layers(),
            kernel_nn_layers=nn_layers(),
            lr=FLAGS.lr,
            lr_decay=FLAGS.lr_decay,
            svi_batch_size=FLAGS.svi_batch_size,
            cov_type=FLAGS.cov_type,
            task_batch_size=FLAGS.task_batch_size,
            normalize_data=FLAGS.normalize_data,
            random_seed=FLAGS.seed,
        )

    run_experiment(
        "meta_mlap", build,
        extra_flags=("task_kl_weight", "meta_kl_weight", "posterior_lr_multiplier",
                     "svi_batch_size", "cov_type"),
    )


if __name__ == "__main__":
    app.run(main)
