"""JSON-config image Neural-Process experiment driver.

JAX/TPU rebuild of the reference's
third_party/neural_processes/main_experiment.py:1-61: read a json config,
build the image NP + epoch trainer, train, and checkpoint losses + model
every epoch into a timestamped results directory.

Config keys (identical to the reference's):
  dataset ("mnist" | "celeba"), img_size [C, H, W], batch_size, r_dim,
  h_dim, z_dim, num_context_range, num_extra_target_range, epochs, lr
plus optional extras: path_to_data, limit (cap the image count — handy for
smoke runs), results_dir (default: results_<timestamp>), seed.

Usage: python experiments/np_image_experiment.py <path_to_config.json>
"""

import json
import os
import pickle
import sys
from time import strftime

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_experiment(config, results_dir=None, verbose=True):
    from meta_learning_pacoh_tpu.datasets.np_image_data import (
        celeba_image_batches,
        mnist_image_batches,
    )
    from meta_learning_pacoh_tpu.models.neural_process_img import (
        NeuralProcessImg,
        NeuralProcessImgTrainer,
    )

    results_dir = results_dir or config.get(
        "results_dir", "results_{}".format(strftime("%Y-%m-%d_%H-%M")))
    os.makedirs(results_dir, exist_ok=True)
    with open(os.path.join(results_dir, "config.json"), "w") as f:
        json.dump(config, f)

    img_size = tuple(config["img_size"])
    rs = np.random.RandomState(config.get("seed", 0))
    common = dict(batch_size=config["batch_size"], size=img_size[1],
                  random_state=rs, limit=config.get("limit"))
    if config["dataset"] == "mnist":
        kwargs = dict(common)
        if config.get("path_to_data"):
            kwargs["path_to_data"] = config["path_to_data"]
        batches = mnist_image_batches(**kwargs)
    elif config["dataset"] == "celeba":
        batches = celeba_image_batches(config["path_to_data"], **common)
    else:
        raise ValueError(f"unknown dataset {config['dataset']!r}")

    np_img = NeuralProcessImg(
        img_size, r_dim=config["r_dim"], z_dim=config["z_dim"],
        h_dim=config["h_dim"], random_seed=config.get("seed", 0))
    trainer = NeuralProcessImgTrainer(
        np_img, lr=config["lr"],
        num_context_range=tuple(config["num_context_range"]),
        num_extra_target_range=tuple(config["num_extra_target_range"]))

    for epoch in range(config["epochs"]):
        if verbose:
            print("Epoch {}".format(epoch + 1), flush=True)
        trainer.train(batches, 1, verbose=verbose)
        # save losses + model every epoch (reference main_experiment.py:55-61)
        with open(os.path.join(results_dir, "losses.json"), "w") as f:
            json.dump([float(x) for x in trainer.epoch_loss_history], f)
        import jax

        with open(os.path.join(results_dir, "model.pkl"), "wb") as f:
            pickle.dump({"params": jax.tree.map(np.asarray, np_img.params),
                         "config": config}, f)
    return trainer.epoch_loss_history, results_dir


def main():
    if len(sys.argv) != 2:
        raise RuntimeError(
            "Wrong arguments, use python np_image_experiment.py "
            "<path_to_config>")
    with open(sys.argv[1]) as f:
        config = json.load(f)
    losses, results_dir = run_experiment(config)
    print(f"done: {len(losses)} epoch losses in {results_dir}/losses.json")


if __name__ == "__main__":
    main()
