"""Generate (and optionally execute) hyperparameter-search launch commands for
a grid of datasets x algorithms (reference:
experiments/hyperparam_search/launch_hyperparam_sweeps.py:36-84; the bsub
cluster submission is replaced by plain shell commands / local execution)."""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from absl import app, flags

from meta_learning_pacoh_tpu.utils.experiment import generate_launch_commands

FLAGS = flags.FLAGS
flags.DEFINE_string("datasets", "sin_20,cauchy_20", "datasets to sweep")
flags.DEFINE_string("algos", "pacoh_map,pacoh_svgd,pacoh_vi", "algorithms")
flags.DEFINE_boolean("execute", False, "run the commands instead of printing")

SCRIPT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "meta_hyperparam_search.py")


def main(argv):
    commands = generate_launch_commands(SCRIPT, {
        "dataset": FLAGS.datasets.split(","),
        "algo": FLAGS.algos.split(","),
    })
    for cmd in commands:
        print(cmd)
        if FLAGS.execute:
            os.system(cmd)


if __name__ == "__main__":
    app.run(main)
