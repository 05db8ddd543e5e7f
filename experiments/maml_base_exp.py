"""MAML experiment CLI (reference: meta_overfitting_v2/maml_overfitting_base.py)."""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from absl import app, flags

from experiments.meta_base_exp import FLAGS, load_data, nn_layers
from meta_learning_pacoh_tpu import MAMLRegression
from meta_learning_pacoh_tpu.utils.experiment import save_results, setup_exp_doc

flags.DEFINE_float("lr_inner", 0.05, "inner-loop learning rate")
flags.DEFINE_integer("num_inner_steps", 1, "inner adaptation steps")


def main(argv):
    flags_dict = {k: getattr(FLAGS, k) for k in (
        "dataset", "seed", "n_iter_fit", "nn_layers", "lr", "lr_decay",
        "task_batch_size", "lr_inner", "num_inner_steps",
    )}
    run_dir = setup_exp_doc("maml", flags_dict, FLAGS.data_dir)
    data_train, data_valid, data_test = load_data()
    model = MAMLRegression(
        data_train, layer_sizes=nn_layers(), num_iter_fit=FLAGS.n_iter_fit,
        lr_inner=FLAGS.lr_inner, num_inner_steps=FLAGS.num_inner_steps,
        task_batch_size=FLAGS.task_batch_size, lr_meta=FLAGS.lr,
        lr_decay=FLAGS.lr_decay, random_seed=FLAGS.seed,
    )
    t0 = time.time()
    model.meta_fit(valid_tuples=data_valid[:10], log_period=FLAGS.log_period)
    rmse = model.eval_datasets(data_test)
    save_results({"test_rmse": rmse, "fit_time_sec": time.time() - t0}, run_dir)
    print(f"maml: RMSE={rmse:.4f}")


if __name__ == "__main__":
    app.run(main)
