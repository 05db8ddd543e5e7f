"""One-command real-TPU smoke: drive every fused Pallas path end-to-end.

Runs each meta-learner's flagship config through the PUBLIC API on the
real chip (meta_fit -> eval -> predict -> confidence_intervals), asserts
the fused kernel actually engaged, compares against the XLA path
(PACOH_TPU_DISABLE_PALLAS=1) at a short horizon, and prints warm per-iter
timings. This is the .claude/skills/verify recipe, codified — run it
after any change to the compute path:

  python tools/tpu_smoke.py            # all algos
  python tools/tpu_smoke.py --algo map # one algo
  python tools/tpu_smoke.py --fast     # shorter fits (~2 min total)

Exit code 0 iff every check passes. CPU note: on a CPU-only host set
PACOH_TPU_FORCE_PALLAS=1 to run the kernels in interpreter mode (slow).
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fence(m):
    import jax

    state = getattr(m, "particles", None)
    if state is None:
        state = getattr(m, "params", None)
    if state is None:
        state = m.posterior  # VI learner
    return float(np.asarray(jax.tree.leaves(state)[0]).ravel()[0])


def run_algo(algo, n_iter, n_tasks=20, n_samples=5):
    from meta_learning_pacoh_tpu import (
        GPRegressionMetaLearned,
        GPRegressionMetaLearnedPAC,
        GPRegressionMetaLearnedSVGD,
        GPRegressionMetaLearnedVI,
    )
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=n_samples)
    test = env.generate_meta_test_data(n_tasks=5, n_samples_context=5,
                                       n_samples_test=20)

    def build():
        if algo == "map":
            return GPRegressionMetaLearned(
                train, num_iter_fit=n_iter, random_seed=30)  # batch 5: counted
        if algo == "map_fullbatch":
            return GPRegressionMetaLearned(
                train, num_iter_fit=n_iter, random_seed=30,
                task_batch_size=-1)
        if algo == "svgd":
            return GPRegressionMetaLearnedSVGD(
                train, num_iter_fit=n_iter, random_seed=30)
        if algo == "vi":
            return GPRegressionMetaLearnedVI(
                train, num_iter_fit=n_iter, random_seed=30)
        return GPRegressionMetaLearnedPAC(
            train, num_iter_fit=n_iter, random_seed=30, covar_module="NN",
            mean_module="NN", meta_kl_weight=1e-3)

    m = build()
    assert m._fused_path_ok(), f"{algo}: fused gate must engage"
    m.meta_fit(verbose=False, log_period=n_iter)
    # warm per-iter timing (second fit, readback-fenced)
    _fence(m)
    t0 = time.time()
    m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
    _fence(m)
    us = (time.time() - t0) / n_iter * 1e6

    ll, rmse, calib = m.eval_datasets(test)
    xq = np.linspace(-5, 5, 60)
    mean, std = m.predict(*test[0][:2], xq)
    ucb, lcb = m.confidence_intervals(*test[0][:2], xq)
    assert np.all(np.isfinite(np.asarray(mean))), f"{algo}: non-finite mean"
    assert np.all(np.asarray(std) > 0), f"{algo}: non-positive std"
    assert np.all(np.asarray(ucb) > np.asarray(lcb)), f"{algo}: CI inverted"

    # short-horizon XLA cross-check: same seed, pallas disabled
    os.environ["PACOH_TPU_DISABLE_PALLAS"] = "1"
    try:
        mx = build()
        assert not mx._fused_path_ok()
        mx.meta_fit(verbose=False, log_period=n_iter)
        llx, rmsex, _ = mx.eval_datasets(test)
    finally:
        del os.environ["PACOH_TPU_DISABLE_PALLAS"]
    dll = abs(ll - llx)
    print(f"  {algo:13s}: {us:8.1f} us/iter | LL {ll:+.4f} (xla {llx:+.4f}, "
          f"dLL {dll:.3f}) RMSE {rmse:.4f} calib {calib:.4f}")
    return dll


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--algo", default="all",
                    choices=["all", "map", "map_fullbatch", "svgd", "vi",
                             "mlap"])
    ap.add_argument("--fast", action="store_true",
                    help="500-iter fits instead of 3000")
    args = ap.parse_args()

    import jax

    print("devices:", jax.devices())
    if args.fast:
        print("(--fast: per-iter numbers include unamortized dispatch "
              "overhead; accuracy gates are skipped at this horizon)")
    n_iter = 500 if args.fast else 3000
    algos = (["map", "map_fullbatch", "svgd", "vi", "mlap"]
             if args.algo == "all" else [args.algo])
    bad = []
    for algo in algos:
        # fused-vs-XLA eval gap is f32-chaos-scale at matched seeds; a
        # math bug shows up as nats, not centinats (bound loosens with
        # fit length — divergence grows with horizon)
        dll = run_algo(algo, n_iter)
        # at 500 iters NOTHING is converged (esp. MLAP's nested bound) and
        # fused-vs-XLA trajectories diverge chaotically from a bad region,
        # so the accuracy gate only applies at the full horizon
        if not args.fast and dll > 1.5:
            bad.append((algo, dll))
    if bad:
        print("FAIL:", bad)
        sys.exit(1)
    print("TPU SMOKE OK")


if __name__ == "__main__":
    main()
