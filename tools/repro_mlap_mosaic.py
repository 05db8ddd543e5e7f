"""Minimal TPU repro for the fused-MLAP Mosaic compile failure."""
import numpy as np
import jax

from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC
from meta_learning_pacoh_tpu.datasets import SinusoidDataset


def main():
    print("devices:", jax.devices())
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=4, n_samples=5)
    m = GPRegressionMetaLearnedPAC(
        train, covar_module="NN", mean_module="NN", meta_kl_weight=1e-3,
        num_iter_fit=3, random_seed=30, task_batch_size=2, svi_batch_size=3)
    print("fused ok:", m._fused_path_ok())
    loss, _ = m.meta_fit(verbose=False, log_period=3)
    print("COMPILED AND RAN OK; loss finite:", np.isfinite(loss))


if __name__ == "__main__":
    main()
