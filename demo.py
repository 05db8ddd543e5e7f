"""PACOH-MAP demo (reference: demo.py): meta-train on 20 sinusoid tasks,
meta-test, report LL/RMSE/calibration, and plot one task's prediction."""

import numpy as np

from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu import GPRegressionMetaLearned

# generate meta-training and meta-testing data
random_state = np.random.RandomState(26)
task_environment = SinusoidDataset(random_state=random_state)
meta_train_data = task_environment.generate_meta_train_data(n_tasks=20, n_samples=5)
meta_test_data = task_environment.generate_meta_test_data(
    n_tasks=20, n_samples_context=5, n_samples_test=50
)

# meta-training with PACOH-MAP
random_gp = GPRegressionMetaLearned(
    meta_train_data, weight_decay=0.2, num_iter_fit=12000, random_seed=30
)
random_gp.meta_fit(meta_test_data, log_period=1000)

# meta-testing
print("\n")
ll, rmse, calib_err = random_gp.eval_datasets(meta_test_data)
print("Test log-likelihood:", ll)
print("Test RMSE:", rmse)
print("Test calibration error:", calib_err)

try:
    from matplotlib import pyplot as plt

    x_plot = np.linspace(-5, 5, num=150)
    x_context, y_context, x_test, y_test = meta_test_data[0]
    pred_mean, pred_std = random_gp.predict(x_context, y_context, x_plot)
    ucb, lcb = random_gp.confidence_intervals(x_context, y_context, x_plot,
                                              confidence=0.9)

    plt.scatter(x_test, y_test, label="target test points")
    plt.scatter(x_context, y_context, label="target context points")
    plt.plot(x_plot, pred_mean)
    plt.fill_between(x_plot, lcb, ucb, alpha=0.2, label="90% confidence interval")
    plt.legend()
    plt.title("meta-testing prediction on new target task")
    plt.savefig("demo_prediction.png", dpi=120)
    print("saved plot to demo_prediction.png")
except Exception as e:
    print(f"\n Could not plot results ({e!r}).")
