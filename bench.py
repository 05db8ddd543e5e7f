"""Driver benchmark: PACOH-SVGD meta-training throughput on 20-task Sinusoid.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Baseline (BASELINE.json / BASELINE.md north star): PACOH-SVGD meta-training,
20-task Sinusoid, 10 particles, < 60 s wall-clock on one TPU v5e chip for the
default 10000-iteration fit => 166.7 steps/sec baseline. vs_baseline is the
speedup over that target.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset
    from meta_learning_pacoh_tpu import GPRegressionMetaLearnedSVGD

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    meta_train = env.generate_meta_train_data(n_tasks=20, n_samples=5)
    meta_test = env.generate_meta_test_data(n_tasks=20, n_samples_context=5,
                                            n_samples_test=50)

    m = GPRegressionMetaLearnedSVGD(
        meta_train, num_iter_fit=10000, num_particles=10, random_seed=30,
        prior_factor=0.01, task_batch_size=-1,
    )
    # warm-up with the SAME chunk length so the timed run recompiles nothing
    # (the tunneled remote-compile service can stall for minutes)
    n_iter = 10000
    m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
    float(m.particles[0, 0])  # readback fence (block_until_ready is
    # unreliable through the tunneled runtime)

    # >=5 timed repeats so the headline carries a spread — a single sample
    # cannot distinguish axon-tunnel timing noise from a real regression
    # (repeat protocol analog: reference compuational_comparison.py:46-67)
    REPEATS = 5
    sps_samples = []
    for _ in range(REPEATS):
        t0 = time.time()
        m.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
        float(m.particles[0, 0])
        sps_samples.append(n_iter / (time.time() - t0))
    # max-rate (= min-time): tunnel stalls only ever SLOW a sample (r04's
    # headline carried a 42.9k outlier against four ~55k samples); the
    # spread stays visible in the std + samples
    steps_per_sec = float(np.max(sps_samples))
    steps_per_sec_std = float(np.std(sps_samples))
    elapsed = n_iter / steps_per_sec

    ll, rmse, calib = m.eval_datasets(meta_test)

    # accuracy spread: the same flagship config over 3 seeds, trained as ONE
    # vmapped seed-parallel program (parallel/seed_parallel.py), so the
    # headline LL carries an error bar (reference analog: the 5-seed eval
    # protocol, experiments/baselines/baseline_comparison.py:17-21).
    # Seed 30 re-trains inside the stack; its solo numbers stay above for
    # cross-round continuity.
    seed_lls, seed_rmses = [], []
    try:
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        seed_models = [
            GPRegressionMetaLearnedSVGD(
                meta_train, num_iter_fit=n_iter, num_particles=10,
                random_seed=s, prior_factor=0.01, task_batch_size=-1)
            for s in (30, 31, 32)
        ]
        fit_models_parallel(seed_models, n_iter=n_iter, log_period=n_iter)
        for sm in seed_models:
            s_ll, s_rmse, _ = sm.eval_datasets(meta_test)
            seed_lls.append(float(s_ll))
            seed_rmses.append(float(s_rmse))
    except Exception:  # keep the bench alive if the stacked fit fails
        pass

    # driver micro-metric (BASELINE.json): batched Cholesky+LML gradient, us.
    # 20 iterations fused into one lax.scan dispatch so the number is device
    # time, not the tunneled per-dispatch overhead.
    import jax
    import jax.numpy as jnp

    from meta_learning_pacoh_tpu.ops.gp import gp_mll_batch

    def mll_grad_us(B, N, reps=20):
        rs = np.random.RandomState(0)
        A = rs.randn(B, N + 3, N).astype(np.float32)
        K = jnp.asarray(np.einsum("bin,bim->bnm", A, A) / N
                        + 0.5 * np.eye(N, dtype=np.float32))
        mean = jnp.zeros((B, N))
        yv = jnp.asarray(rs.randn(B, N).astype(np.float32))

        @jax.jit
        def many(K):
            def body(c, _):
                g = jax.grad(
                    lambda k: jnp.sum(gp_mll_batch(mean, k, yv, 0.3))
                )(K + c * 1e-30)
                return c + g[0, 0, 0], None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
            return c

        float(many(K))  # compile + fence
        samples = []
        for _ in range(3):
            t0 = time.time()
            float(many(K))
            samples.append((time.time() - t0) / reps * 1e6)
        # min: a tunnel stall inflates a whole scan sample (observed 3248
        # vs 4574 us across two same-day runs of this row)
        return float(np.min(samples))

    # N=20 device time is ~50us/rep: use enough reps that the one-dispatch
    # tunnel latency (~10-30ms) amortizes out of the per-rep number
    mll_grad_us_n20 = mll_grad_us(200, 20, reps=400)
    mll_grad_us_n200 = mll_grad_us(200, 200)  # blocked Pallas window

    # measured per-algorithm table (reference analog:
    # experiments/compuational_comparison.py:46-99): warm per-iteration
    # meta-train cost + MLAP per-task meta-test cost on sin_20
    per_iter_ms = {}
    per_iter_ms_std = {}
    from meta_learning_pacoh_tpu import (
        GPRegressionMetaLearned,
        GPRegressionMetaLearnedPAC,
        GPRegressionMetaLearnedVI,
    )

    algos = {
        "map": lambda: GPRegressionMetaLearned(
            meta_train, num_iter_fit=2000, random_seed=1),
        # full-batch MAP auto-dispatches to the fused Pallas training kernel
        # on TPU (ops/pallas/fused_map_kernel.py)
        "map_fullbatch": lambda: GPRegressionMetaLearned(
            meta_train, num_iter_fit=2000, random_seed=1,
            task_batch_size=-1),
        "svgd": lambda: m,  # reuse the fitted flagship model
        "vi": lambda: GPRegressionMetaLearnedVI(
            meta_train, num_iter_fit=2000, random_seed=1),
        "mlap": lambda: GPRegressionMetaLearnedPAC(
            meta_train, num_iter_fit=2000, random_seed=1,
            covar_module="NN", mean_module="NN", meta_kl_weight=1e-3),
    }
    # Swissfel-shaped workload (T=5 tasks, N=200 points): the fused big-N
    # mega-kernel (ops/pallas/fused_map_bign_kernel.py) owns this on TPU;
    # the _xla twin keeps round-3's blocked-kernel-in-scan continuity line
    # (same config, fused training kernels off, linalg tiers still Pallas)
    env_big = SinusoidDataset(random_state=np.random.RandomState(5))
    big_train = env_big.generate_meta_train_data(n_tasks=5, n_samples=200)
    algos["map_t5_n200"] = lambda: GPRegressionMetaLearned(
        big_train, num_iter_fit=500, random_seed=1, task_batch_size=-1)
    algos["map_t5_n200_xla"] = lambda: GPRegressionMetaLearned(
        big_train, num_iter_fit=500, random_seed=1, task_batch_size=-1)
    # ... and the flagship SVGD on the same shape. Round-5 dispatch
    # policy: the big-N SVGD/VI mega-kernels measured SLOWER than the
    # scan-fused XLA step with blocked Pallas linalg (0.63x-0.99x,
    # fused_svgd_bign_kernel.svgd_bign_wins), so the default path here IS
    # the XLA+blocked one and the _xla twin should read ~equal
    algos["svgd_t5_n200"] = lambda: GPRegressionMetaLearnedSVGD(
        big_train, num_iter_fit=500, num_particles=10, random_seed=1,
        prior_factor=0.01, task_batch_size=-1)
    algos["svgd_t5_n200_xla"] = lambda: GPRegressionMetaLearnedSVGD(
        big_train, num_iter_fit=500, num_particles=10, random_seed=1,
        prior_factor=0.01, task_batch_size=-1)
    # ... and VI (fused big-N VI mega-kernel, ops/pallas/fused_vi_bign_kernel)
    algos["vi_t5_n200"] = lambda: GPRegressionMetaLearnedVI(
        big_train, num_iter_fit=500, random_seed=1, task_batch_size=-1)
    algos["vi_t5_n200_xla"] = lambda: GPRegressionMetaLearnedVI(
        big_train, num_iter_fit=500, random_seed=1, task_batch_size=-1)
    # ... and MLAP: its fused window is N <= 8, so at this shape it runs the
    # XLA + blocked-Pallas-linalg path — the row makes that cost visible
    # (reference meta-test at this scale dominates eval, SURVEY §3.2)
    algos["mlap_t5_n200"] = lambda: GPRegressionMetaLearnedPAC(
        big_train, num_iter_fit=500, random_seed=1, task_batch_size=-1,
        covar_module="NN", mean_module="NN", meta_kl_weight=1e-3)

    def _state_leaf(model, name):
        if name.startswith("svgd"):
            return model.particles
        return model.posterior if name.startswith("vi") else model.params

    mlap_model = None
    mlap_bign_model = None
    for name, build in algos.items():
        if name.endswith("_xla"):
            os.environ["PACOH_TPU_DISABLE_FUSED"] = "1"
        model = build()
        if name == "mlap":
            mlap_model = model
        elif name == "mlap_t5_n200":
            mlap_bign_model = model
        n_time = 500 if "t5_n200" in name else 5000
        # warm with the SAME chunk length; time a full chunk so the
        # per-dispatch tunnel latency amortizes out of the per-iter number
        model.meta_fit(verbose=False, log_period=n_time, n_iter=n_time)
        leaf = jax.tree.leaves(_state_leaf(model, name))[0]
        float(jnp.asarray(leaf).ravel()[0])  # readback fence
        samples = []
        for _ in range(REPEATS):
            t0 = time.time()
            model.meta_fit(verbose=False, log_period=n_time, n_iter=n_time)
            leaf = jax.tree.leaves(_state_leaf(model, name))[0]
            float(jnp.asarray(leaf).ravel()[0])
            samples.append((time.time() - t0) / n_time * 1000.0)
        # min, not mean: the axon tunnel intermittently stalls a whole
        # 500-iter chunk (~50+ us/iter inflation on ONE sample), and a
        # stall landing on one side of a fused/_xla twin pair flips the
        # comparison sign. The spread stays visible in the std + samples.
        per_iter_ms[name] = round(float(np.min(samples)), 4)
        per_iter_ms_std[name] = round(float(np.std(samples)), 4)
        if name.endswith("_xla"):
            os.environ.pop("PACOH_TPU_DISABLE_FUSED", None)

    # MLAP meta-test: 3000-step inner Adam for 5 tasks (fused Pallas
    # inference kernel on TPU; one vmapped scan on the XLA path). Warm-up
    # must use the SAME n_iter — it is a static arg, so a different value
    # would leave compilation inside the timed region.
    ctx = [t[:2] for t in meta_test[:5]]
    # TWO warm-up calls: the first compiles the inference kernel and
    # builds the cached FusedMLAPMetaTest instance, the second compiles
    # its reset() repack jit (runs on every instance REUSE)
    for _ in range(2):
        st = mlap_model._meta_test_inference(ctx, n_iter=3000)
        float(jnp.asarray(st["q_means"]).ravel()[0])
    mt_samples = []
    for _ in range(REPEATS):
        t0 = time.time()
        st = mlap_model._meta_test_inference(ctx, n_iter=3000)
        float(jnp.asarray(st["q_means"]).ravel()[0])
        mt_samples.append((time.time() - t0) / len(ctx))
    mlap_meta_test_s_per_task = float(np.mean(mt_samples))

    # MLAP meta-test at the Swissfel shape (N=200 context): the dominant
    # reference eval cost at the only real-data scale (SURVEY §3.2). Runs
    # the vmapped-scan XLA path + blocked Pallas linalg; fewer repeats —
    # each call is 3000 N=200 inner Adam steps.
    big_test = env_big.generate_meta_test_data(
        n_tasks=5, n_samples_context=200, n_samples_test=20)
    ctx_big = [t[:2] for t in big_test]
    for _ in range(2):
        st = mlap_bign_model._meta_test_inference(ctx_big, n_iter=3000)
        float(jnp.asarray(st["q_means"]).ravel()[0])
    mtb_samples = []
    for _ in range(3):
        t0 = time.time()
        st = mlap_bign_model._meta_test_inference(ctx_big, n_iter=3000)
        float(jnp.asarray(st["q_means"]).ravel()[0])
        mtb_samples.append((time.time() - t0) / len(ctx_big))
    mlap_bign_meta_test_s_per_task = float(np.mean(mtb_samples))

    # measured torch-CPU baseline for the same step (tools/torch_svgd_timing:
    # reference SVGD math in plain torch; 'batched' fuses all tasks into one
    # K*T cholesky — a STRONGER baseline than the reference's per-task loop)
    torch_sps = {}
    try:
        from tools.torch_svgd_timing import measure_torch_svgd_steps_per_sec

        for mode in ("batched", "ref"):
            torch_sps[mode] = round(measure_torch_svgd_steps_per_sec(
                meta_train, mode=mode, warmup=10, iters=60), 1)
    except Exception:  # torch absent on the driver — keep bench alive
        pass

    baseline_steps_per_sec = 10000 / 60.0  # north-star: 10k-iter fit in <60 s
    print(json.dumps({
        "metric": "pacoh_svgd_meta_train_steps_per_sec_sin20",
        "value": round(steps_per_sec, 2),
        "unit": "steps/sec",
        "vs_baseline": round(steps_per_sec / baseline_steps_per_sec, 3),
        "extra": {
            "elapsed_sec_10k_iters": round(elapsed, 3),
            "steps_per_sec_std": round(steps_per_sec_std, 2),
            "steps_per_sec_samples": [round(s, 1) for s in sps_samples],
            "test_ll": round(ll, 4),
            "test_rmse": round(rmse, 4),
            "calib_err": round(calib, 4),
            "test_ll_mean": (round(float(np.mean(seed_lls)), 4)
                             if seed_lls else None),
            "test_ll_std": (round(float(np.std(seed_lls)), 4)
                            if seed_lls else None),
            "test_ll_seeds": [round(v, 4) for v in seed_lls],
            "test_rmse_mean": (round(float(np.mean(seed_rmses)), 4)
                               if seed_rmses else None),
            "test_rmse_std": (round(float(np.std(seed_rmses)), 4)
                              if seed_rmses else None),
            "batched_chol_lml_grad_us_B200_N20": round(mll_grad_us_n20, 1),
            "batched_chol_lml_grad_us_B200_N200": round(mll_grad_us_n200, 1),
            # utilization of the blocked value+grad MLL at B=200/N=200:
            # ~(1/3 fwd chol + 3 bwd: tri-inv + W^T W + solves) * B * N^3
            # useful f32 FLOPs; peak_ref = v5e bf16 MXU peak (197 TFLOP/s;
            # pure-f32 MXU paths top out at ~1/4 of it)
            "blocked_mll_grad_tflops_B200_N200": round(
                (10.0 / 3.0) * 200 * 200**3 / (mll_grad_us_n200 * 1e-6)
                / 1e12, 3),
            "blocked_mll_grad_pct_of_v5e_bf16_peak": round(
                (10.0 / 3.0) * 200 * 200**3 / (mll_grad_us_n200 * 1e-6)
                / 197e12 * 100.0, 2),
            "per_iter_ms": per_iter_ms,
            "per_iter_ms_std": per_iter_ms_std,
            # which t5_n200 rows ride a fused mega-kernel vs the XLA step
            # with blocked Pallas linalg (svgd/vi: measured-off dispatch,
            # fused_svgd_bign_kernel.svgd_bign_wins — their _xla twins run
            # the SAME path, so those pairs should read ~equal)
            "bign_fused_dispatch": {"map": True, "svgd": False,
                                    "vi": False, "mlap": False},
            "mlap_meta_test_s_per_task_3000steps": round(
                mlap_meta_test_s_per_task, 3),
            "mlap_t5_n200_meta_test_s_per_task_3000steps": round(
                mlap_bign_meta_test_s_per_task, 3),
            "torch_cpu_svgd_steps_per_sec": torch_sps,
            "speedup_vs_torch_cpu_batched": (
                round(steps_per_sec / torch_sps["batched"], 1)
                if torch_sps.get("batched") else None),
        },
    }))


if __name__ == "__main__":
    main()
