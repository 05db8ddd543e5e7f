"""PACOH-MAP experiment CLI (reference: experiments/meta_GPR_mll_base_exp.py)."""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags

from experiments.meta_base_exp import FLAGS, nn_layers, run_experiment
from meta_learning_pacoh_tpu import GPRegressionMetaLearned

flags.DEFINE_float("weight_decay", 0.0, "AdamW weight decay (meta-regularization)")
flags.DEFINE_string("learning_mode", "both", "learn_mean | learn_kernel | both | vanilla")


def main(argv):
    def build(meta_train_data):
        return GPRegressionMetaLearned(
            meta_train_data,
            learning_mode=FLAGS.learning_mode,
            lr_params=FLAGS.lr,
            weight_decay=FLAGS.weight_decay,
            feature_dim=FLAGS.feature_dim,
            num_iter_fit=FLAGS.n_iter_fit,
            covar_module=FLAGS.covar_module,
            mean_module=FLAGS.mean_module,
            mean_nn_layers=nn_layers(),
            kernel_nn_layers=nn_layers(),
            task_batch_size=FLAGS.task_batch_size,
            normalize_data=FLAGS.normalize_data,
            lr_decay=FLAGS.lr_decay,
            random_seed=FLAGS.seed,
        )

    run_experiment("meta_gpr_mll", build, extra_flags=("weight_decay", "learning_mode"))


if __name__ == "__main__":
    app.run(main)
