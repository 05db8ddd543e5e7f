"""PACOH-VI experiment CLI (reference: experiments/meta_GPR_vi_base_exp.py)."""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags

from experiments.meta_base_exp import FLAGS, nn_layers, run_experiment
from meta_learning_pacoh_tpu import GPRegressionMetaLearnedVI

flags.DEFINE_float("prior_factor", 0.01, "hyper-prior weighting")
flags.DEFINE_float("weight_prior_std", 0.5, "hyper-prior std on NN weights")
flags.DEFINE_float("bias_prior_std", 3.0, "hyper-prior std on NN biases")
flags.DEFINE_integer("svi_batch_size", 10, "reparameterized samples per step")
flags.DEFINE_string("cov_type", "diag", "posterior covariance: diag | full")


def main(argv):
    def build(meta_train_data):
        return GPRegressionMetaLearnedVI(
            meta_train_data,
            num_iter_fit=FLAGS.n_iter_fit,
            feature_dim=FLAGS.feature_dim,
            prior_factor=FLAGS.prior_factor,
            weight_prior_std=FLAGS.weight_prior_std,
            bias_prior_std=FLAGS.bias_prior_std,
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
        "meta_gpr_vi", build,
        extra_flags=("prior_factor", "weight_prior_std", "bias_prior_std",
                     "svi_batch_size", "cov_type"),
    )


if __name__ == "__main__":
    app.run(main)
