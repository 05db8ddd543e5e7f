"""Neural Process experiment CLI (reference: neural_processes_overfitting_base.py)."""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags

from experiments.meta_base_exp import FLAGS, run_experiment
from meta_learning_pacoh_tpu import NPRegressionMetaLearned

flags.DEFINE_float("weight_decay", 1e-2, "AdamW weight decay")
flags.DEFINE_integer("r_dim", 50, "context representation dim")
flags.DEFINE_integer("z_dim", 50, "latent dim")
flags.DEFINE_integer("h_dim", 50, "hidden width")


def main(argv):
    def build(meta_train_data):
        return NPRegressionMetaLearned(
            meta_train_data,
            lr_params=FLAGS.lr,
            r_dim=FLAGS.r_dim, z_dim=FLAGS.z_dim, h_dim=FLAGS.h_dim,
            num_iter_fit=FLAGS.n_iter_fit,
            weight_decay=FLAGS.weight_decay,
            task_batch_size=FLAGS.task_batch_size,
            normalize_data=FLAGS.normalize_data,
            lr_decay=FLAGS.lr_decay,
            random_seed=FLAGS.seed,
        )

    run_experiment("npr", build, extra_flags=("weight_decay", "r_dim", "z_dim", "h_dim"))


if __name__ == "__main__":
    app.run(main)
