"""Visualize sampled tasks from the simulated meta-learning environments.

Reference role: experiments/visualization_tasks/visualize_sim_tasks.py —
which ships as an EMPTY file upstream; this analog is functional: for each
1-D task environment it samples a handful of tasks and draws their target
functions plus the sampled (x, y) training points, one panel per
environment.

Usage:
    python visualize_sim_tasks.py [--envs sin,cauchy] [--n_tasks 5]
        [--n_samples 50] [--output sim_tasks.png]
"""

import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np
from absl import app, flags

FLAGS = flags.FLAGS
flags.DEFINE_string("envs", "sin,cauchy,mixture",
                    "comma-separated environment keys "
                    "(sin | cauchy | mixture)")
flags.DEFINE_integer("n_tasks", 5, "tasks sampled per environment")
flags.DEFINE_integer("n_samples", 40, "training points sampled per task")
flags.DEFINE_integer("seed", 26, "environment RNG seed")
flags.DEFINE_string("output", "./sim_tasks.png", "output image")


def make_env(key, rs):
    from meta_learning_pacoh_tpu.datasets import (
        CauchyDataset,
        GPFunctionsDataset,
        SinusoidDataset,
        SinusoidNonstationaryDataset,
    )

    envs = {
        "sin": SinusoidDataset,
        "cauchy": CauchyDataset,
        "mixture": SinusoidNonstationaryDataset,
        "gp_funcs": GPFunctionsDataset,
    }
    return envs[key](random_state=rs)


def main(argv):
    import matplotlib
    matplotlib.use("Agg")
    from matplotlib import pyplot as plt

    keys = FLAGS.envs.split(",")
    fig, axes = plt.subplots(1, len(keys), figsize=(4 * len(keys), 3.2),
                             squeeze=False)
    for ax, key in zip(axes[0], keys):
        env = make_env(key, np.random.RandomState(FLAGS.seed))
        tasks = env.generate_meta_train_data(
            n_tasks=FLAGS.n_tasks, n_samples=FLAGS.n_samples)
        for i, (x, y) in enumerate(tasks):
            order = np.argsort(x[:, 0])
            color = plt.get_cmap("tab10")(i % 10)
            ax.plot(x[order, 0], y[order].ravel(), lw=1.0, color=color,
                    alpha=0.8)
            ax.scatter(x[:, 0], y.ravel(), s=6, color=color, alpha=0.5)
        ax.set_title(key)
        ax.set_xlabel("x")
        ax.set_ylabel("y")
    fig.tight_layout()
    fig.savefig(FLAGS.output, dpi=150)
    print(f"wrote {FLAGS.output}")


if __name__ == "__main__":
    app.run(main)
