"""Seed-parallel (vmapped fan-out) training: parity with sequential fits.

The reference fans independent (config, seed) runs out to Ray workers /
multiprocessing pools (reference: experiments/baselines/
baseline_comparison.py:65-123, experiments/util.py:160-185). The TPU-native
replacement stacks the seeds into a tensor axis and vmaps one jitted step
over it (parallel/seed_parallel.py) — these tests pin the contract: the
vmapped fit must reproduce each sequential `meta_fit` up to float
reassociation, with or without a 'seed' mesh axis sharding the stack.
"""

import numpy as np
import pytest

import jax


def _tasks(n_tasks=8, n=5, seed=0):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n_tasks):
        x = rs.uniform(-5, 5, (n, 1))
        y = np.sin(x) + 2 + 0.05 * rs.normal(size=(n, 1))
        out.append((x, y))
    return out


SEEDS = [3, 11, 42]


class TestSeedParallelParity:
    def test_map_parallel_matches_sequential(self):
        from meta_learning_pacoh_tpu import GPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        train = _tasks()

        def build(s):
            return GPRegressionMetaLearned(
                train, num_iter_fit=30, random_seed=s, weight_decay=0.1,
            )

        par = [build(s) for s in SEEDS]
        fit_models_parallel(par, n_iter=30)

        for s, mp in zip(SEEDS, par):
            ms = build(s)
            ms.meta_fit(verbose=False)
            assert mp.fitted and mp._step_count == 30
            for name in ms.params:
                np.testing.assert_allclose(
                    np.asarray(jax.tree.leaves(mp.params[name])[0]),
                    np.asarray(jax.tree.leaves(ms.params[name])[0]),
                    rtol=2e-4, atol=1e-5, err_msg=f"seed {s} param {name}",
                )

    def test_svgd_parallel_matches_sequential(self):
        from meta_learning_pacoh_tpu import GPRegressionMetaLearnedSVGD
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        train = _tasks()

        def build(s):
            return GPRegressionMetaLearnedSVGD(
                train, num_iter_fit=25, random_seed=s, num_particles=3,
                task_batch_size=-1,
            )

        par = [build(s) for s in SEEDS]
        fit_models_parallel(par, n_iter=25)

        for s, mp in zip(SEEDS, par):
            ms = build(s)
            ms.meta_fit(verbose=False)
            np.testing.assert_allclose(
                np.asarray(mp.particles), np.asarray(ms.particles),
                rtol=2e-4, atol=1e-5, err_msg=f"seed {s}",
            )

    def test_vi_parallel_matches_sequential(self):
        from meta_learning_pacoh_tpu import GPRegressionMetaLearnedVI
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        train = _tasks()

        def build(s):
            return GPRegressionMetaLearnedVI(
                train, num_iter_fit=20, random_seed=s, svi_batch_size=2,
            )

        par = [build(s) for s in SEEDS[:2]]
        fit_models_parallel(par, n_iter=20)

        for s, mp in zip(SEEDS[:2], par):
            ms = build(s)
            ms.meta_fit(verbose=False)
            np.testing.assert_allclose(
                np.asarray(jax.tree.leaves(mp.posterior)[0]),
                np.asarray(jax.tree.leaves(ms.posterior)[0]),
                rtol=2e-4, atol=1e-5, err_msg=f"seed {s}",
            )

    def test_per_seed_data_parallel_matches_sequential(self):
        """Different meta-train draws per seed (the overfitting-sweep shape)."""
        from meta_learning_pacoh_tpu import GPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        def build(s):
            return GPRegressionMetaLearned(
                _tasks(seed=s), num_iter_fit=25, random_seed=s,
            )

        par = [build(s) for s in SEEDS]
        fit_models_parallel(par, n_iter=25)

        s = SEEDS[1]
        ms = build(s)
        ms.meta_fit(verbose=False)
        np.testing.assert_allclose(
            np.asarray(par[1].params["noise_raw"]),
            np.asarray(ms.params["noise_raw"]), rtol=2e-4, atol=1e-5,
        )
        # models stay independently usable after the group fit
        x, y = _tasks(seed=s)[0]
        mean, std = par[1].predict(x, y, x)
        assert np.all(np.isfinite(mean)) and np.all(std > 0)


class TestSeedParallelMLAP:
    def test_mlap_parallel_matches_sequential(self):
        from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        train = _tasks(n_tasks=4)

        def build(s):
            return GPRegressionMetaLearnedPAC(
                train, num_iter_fit=10, random_seed=s, task_batch_size=-1,
            )

        par = [build(s) for s in SEEDS[:2]]
        fit_models_parallel(par, n_iter=10)
        ms = build(SEEDS[0])
        ms.meta_fit(verbose=False)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(par[0].params)[0]),
            np.asarray(jax.tree.leaves(ms.params)[0]),
            rtol=2e-4, atol=1e-5,
        )


class TestSeedParallelMAMLAndNP:
    def test_maml_parallel_runs_and_matches(self):
        from meta_learning_pacoh_tpu.algos.maml import MAMLRegression
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        train = _tasks()

        def build(s):
            return MAMLRegression(train, num_iter_fit=15, random_seed=s,
                                  num_inner_steps=1)

        par = [build(s) for s in SEEDS[:2]]
        fit_models_parallel(par, n_iter=15)
        ms = build(SEEDS[0])
        ms.meta_fit(verbose=False)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(par[0].params)[0]),
            np.asarray(jax.tree.leaves(ms.params)[0]),
            rtol=2e-4, atol=1e-5,
        )

    def test_np_parallel_runs_and_matches(self):
        from meta_learning_pacoh_tpu.algos.npr import NPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        train = _tasks()

        def build(s):
            return NPRegressionMetaLearned(train, num_iter_fit=15,
                                           random_seed=s)

        par = [build(s) for s in SEEDS[:2]]
        fit_models_parallel(par, n_iter=15)
        ms = build(SEEDS[0])
        ms.meta_fit(verbose=False)
        np.testing.assert_allclose(
            np.asarray(jax.tree.leaves(par[0].params)[0]),
            np.asarray(jax.tree.leaves(ms.params)[0]),
            rtol=2e-4, atol=1e-5,
        )


class TestSeedMesh:
    def test_seed_mesh_sharded_matches_unsharded(self):
        from meta_learning_pacoh_tpu import GPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel import (
            fit_models_parallel,
            make_seed_mesh,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        train = _tasks()

        def batch(n_iter=20):
            return [
                GPRegressionMetaLearned(train, num_iter_fit=n_iter,
                                        random_seed=s, task_batch_size=-1)
                for s in range(8)
            ]

        plain = batch()
        fit_models_parallel(plain, n_iter=20)
        sharded = batch()
        fit_models_parallel(sharded, n_iter=20, mesh=make_seed_mesh(8))

        for mp, msh in zip(plain, sharded):
            np.testing.assert_allclose(
                np.asarray(mp.params["noise_raw"]),
                np.asarray(msh.params["noise_raw"]), rtol=1e-4, atol=1e-6,
            )

    def test_seed_mesh_pads_non_divisible_model_count(self):
        """5 models on an 8-device seed mesh: padded replicas train and are
        dropped; results match the unsharded group fit."""
        from meta_learning_pacoh_tpu import GPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel import (
            fit_models_parallel,
            make_seed_mesh,
        )

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")

        train = _tasks()

        def batch():
            return [
                GPRegressionMetaLearned(train, num_iter_fit=15,
                                        random_seed=s, task_batch_size=-1)
                for s in range(5)
            ]

        plain = batch()
        fit_models_parallel(plain, n_iter=15)
        sharded = batch()
        fit_models_parallel(sharded, n_iter=15, mesh=make_seed_mesh(8))
        for mp, msh in zip(plain, sharded):
            np.testing.assert_allclose(
                np.asarray(mp.params["noise_raw"]),
                np.asarray(msh.params["noise_raw"]), rtol=1e-4, atol=1e-6,
            )

    def test_config_mismatch_raises(self):
        from meta_learning_pacoh_tpu import GPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel import fit_models_parallel

        train = _tasks()
        a = GPRegressionMetaLearned(train, num_iter_fit=10, random_seed=1,
                                    lr_params=1e-3)
        b = GPRegressionMetaLearned(train, num_iter_fit=10, random_seed=2,
                                    lr_params=3e-4)
        with pytest.raises(AssertionError):
            fit_models_parallel([a, b], n_iter=10)


def test_sequential_fused_route_matches_meta_fit(monkeypatch):
    """prefer='sequential_fused' is literally per-model meta_fit: results
    must be BIT-identical to fitting each model individually."""
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    import numpy as np
    import jax
    from meta_learning_pacoh_tpu import GPRegressionMetaLearnedSVGD
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset
    from meta_learning_pacoh_tpu.parallel.seed_parallel import (
        fit_models_parallel,
    )

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=4, n_samples=5)

    def group():
        return [GPRegressionMetaLearnedSVGD(
            train, num_iter_fit=10, random_seed=s, num_particles=3,
            mean_nn_layers=(8, 8), kernel_nn_layers=(8, 8))
            for s in (0, 1)]

    ms = group()
    assert all(m._fused_path_ok() for m in ms)
    fit_models_parallel(ms, n_iter=10, prefer="sequential_fused")

    for s, m_par in zip((0, 1), ms):
        m_solo = GPRegressionMetaLearnedSVGD(
            train, num_iter_fit=10, random_seed=s, num_particles=3,
            mean_nn_layers=(8, 8), kernel_nn_layers=(8, 8))
        m_solo.meta_fit(verbose=False, log_period=10)
        np.testing.assert_array_equal(
            np.asarray(m_par.particles), np.asarray(m_solo.particles))
