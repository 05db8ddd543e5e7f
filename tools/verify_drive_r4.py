import numpy as np, time, os
import jax
from meta_learning_pacoh_tpu import GPRegressionMetaLearned
from meta_learning_pacoh_tpu.datasets import SinusoidDataset
print("devices:", jax.devices(), flush=True)
env = SinusoidDataset(random_state=np.random.RandomState(26))
train = env.generate_meta_train_data(n_tasks=20, n_samples=5)
test = env.generate_meta_test_data(n_tasks=20, n_samples_context=5, n_samples_test=50)
m = GPRegressionMetaLearned(train, weight_decay=0.2, num_iter_fit=3000, random_seed=30)
m.meta_fit(verbose=False, log_period=1500)
ll, rmse, calib = m.eval_datasets(test)
print(f"sin20 fused: LL {ll:.3f} RMSE {rmse:.3f} calib {calib:.3f}", flush=True)
assert ll > -1.0 and rmse < 0.6
mean, std = m.predict(*test[0][:2], np.linspace(-5, 5, 150))
ucb, lcb = m.confidence_intervals(*test[0][:2], np.linspace(-5, 5, 150))
assert np.all(np.isfinite(mean)) and np.all(std > 0) and np.all(ucb >= lcb)
# big-N fused path (the round's flagship change)
envb = SinusoidDataset(random_state=np.random.RandomState(5))
btrain = envb.generate_meta_train_data(n_tasks=5, n_samples=200)
btest = envb.generate_meta_test_data(n_tasks=5, n_samples_context=200, n_samples_test=50)
mb = GPRegressionMetaLearned(btrain, num_iter_fit=500, random_seed=1, task_batch_size=-1)
assert mb._fused_path_ok()
mb.meta_fit(verbose=False, log_period=500)
llb, rmseb, _ = mb.eval_datasets(btest)
print(f"bigN fused:  LL {llb:.3f} RMSE {rmseb:.3f}", flush=True)
assert np.isfinite(llb) and rmseb < 1.0
# DISABLE_FUSED twin: blocked-in-scan path, same config
os.environ["PACOH_TPU_DISABLE_FUSED"] = "1"
mx = GPRegressionMetaLearned(btrain, num_iter_fit=500, random_seed=1, task_batch_size=-1)
assert not mx._fused_path_ok()
mx.meta_fit(verbose=False, log_period=500)
llx, rmsex, _ = mx.eval_datasets(btest)
print(f"bigN xla:    LL {llx:.3f} RMSE {rmsex:.3f}", flush=True)
assert abs(llx - llb) < 0.5
print("VERIFY OK", flush=True)
