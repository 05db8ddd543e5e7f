"""Multi-device tests on the virtual 8-device CPU mesh: sharded training
matches single-device training, collectives compile and execute."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tasks(n_tasks=16, n=8, seed=0):
    rs = np.random.RandomState(seed)
    out = []
    for _ in range(n_tasks):
        x = rs.uniform(-5, 5, (n, 1))
        y = np.sin(x) + 2 + 0.05 * rs.normal(size=(n, 1))
        out.append((x, y))
    return out


@pytest.fixture(scope="module")
def devices_ok():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")


class TestMeshHelpers:
    def test_make_mesh_shapes(self, devices_ok):
        from meta_learning_pacoh_tpu.parallel.mesh import make_mesh

        m1 = make_mesh(8)
        assert m1.axis_names == ("task",) and m1.devices.size == 8
        m2 = make_mesh(8, particle_parallel=True)
        assert m2.axis_names == ("task", "particle")
        assert m2.shape["task"] == 4 and m2.shape["particle"] == 2

    def test_shard_task_batch_places_on_all_devices(self, devices_ok):
        from meta_learning_pacoh_tpu.parallel.mesh import make_mesh, shard_task_batch

        mesh = make_mesh(8)
        X = np.zeros((16, 8, 1), np.float32)
        Y = np.zeros((16, 8), np.float32)
        M = np.ones((16, 8), np.float32)
        Xs, Ys, Ms = shard_task_batch(mesh, X, Y, M)
        assert len(Xs.sharding.device_set) == 8


class TestShardedSVGD:
    def test_sharded_learner_matches_unsharded(self, devices_ok):
        """Full-batch SVGD on a task-sharded mesh == single-device run."""
        from meta_learning_pacoh_tpu import GPRegressionMetaLearnedSVGD
        from meta_learning_pacoh_tpu.parallel.mesh import make_mesh

        train = _tasks()
        m_plain = GPRegressionMetaLearnedSVGD(
            train, num_iter_fit=30, random_seed=7, num_particles=4,
            task_batch_size=-1,
        )
        m_plain.meta_fit(verbose=False)

        mesh = make_mesh(8)
        m_shard = GPRegressionMetaLearnedSVGD(
            train, num_iter_fit=30, random_seed=7, num_particles=4,
            task_batch_size=-1, mesh=mesh,
        )
        m_shard.meta_fit(verbose=False)

        np.testing.assert_allclose(
            np.asarray(m_plain.particles), np.asarray(m_shard.particles),
            rtol=1e-4, atol=1e-5,
        )

    def test_sharded_map_matches_unsharded(self, devices_ok):
        from meta_learning_pacoh_tpu import GPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel.mesh import make_mesh

        train = _tasks()
        m_plain = GPRegressionMetaLearned(train, num_iter_fit=30, random_seed=3,
                                          task_batch_size=-1)
        m_plain.meta_fit(verbose=False)
        m_shard = GPRegressionMetaLearned(train, num_iter_fit=30, random_seed=3,
                                          task_batch_size=-1, mesh=make_mesh(8))
        m_shard.meta_fit(verbose=False)
        a = np.asarray(m_plain.params["lengthscale_raw"])
        b = np.asarray(m_shard.params["lengthscale_raw"])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)

    def test_sharded_map_matches_unsharded_2d_mesh(self, devices_ok):
        """MAP on the 2-D (task, particle) mesh: the task tensor shards over
        the 'task' axis, params replicate over both — results must match the
        single-device run."""
        from meta_learning_pacoh_tpu import GPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel.mesh import make_mesh

        train = _tasks()
        m_plain = GPRegressionMetaLearned(train, num_iter_fit=30, random_seed=5,
                                          task_batch_size=-1)
        m_plain.meta_fit(verbose=False)
        mesh = make_mesh(8, particle_parallel=True)
        assert mesh.axis_names == ("task", "particle")
        m_shard = GPRegressionMetaLearned(train, num_iter_fit=30, random_seed=5,
                                          task_batch_size=-1, mesh=mesh)
        m_shard.meta_fit(verbose=False)
        a, _ = m_plain.predict(*train[0], train[1][0])
        b, _ = m_shard.predict(*train[0], train[1][0])
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)

    def test_sharded_mlap_matches_unsharded(self, devices_ok):
        """MLAP with mesh=: sharded meta-train AND sharded meta-test
        inference match the single-device run (VERDICT round-1 item 5)."""
        from meta_learning_pacoh_tpu import GPRegressionMetaLearnedPAC
        from meta_learning_pacoh_tpu.parallel.mesh import make_mesh

        train = _tasks(n_tasks=8)
        test = [(x[:4], y[:4], x[4:], y[4:]) for x, y in _tasks(n_tasks=8, seed=3)]

        m_plain = GPRegressionMetaLearnedPAC(train, num_iter_fit=20,
                                             random_seed=9, task_batch_size=-1)
        m_plain.meta_fit(verbose=False)
        ll_p, rmse_p, _ = m_plain.eval_datasets(test, n_iter_meta_test=50)

        m_shard = GPRegressionMetaLearnedPAC(train, num_iter_fit=20,
                                             random_seed=9, task_batch_size=-1,
                                             mesh=make_mesh(8))
        m_shard.meta_fit(verbose=False)
        ll_s, rmse_s, _ = m_shard.eval_datasets(test, n_iter_meta_test=50)

        np.testing.assert_allclose(
            np.asarray(m_plain.params["q_means"]),
            np.asarray(m_shard.params["q_means"]), rtol=1e-4, atol=1e-5,
        )
        assert abs(ll_p - ll_s) < 1e-3
        assert abs(rmse_p - rmse_s) < 1e-3

    def test_parallel_step_builder(self, devices_ok):
        import optax

        from meta_learning_pacoh_tpu.models.random_gp import (
            make_hyper_prior, random_gp_config,
        )
        from meta_learning_pacoh_tpu.parallel.mesh import (
            build_svgd_parallel_step, make_mesh,
        )
        from meta_learning_pacoh_tpu.utils.input_handling import stack_task_tuples

        cfg = random_gp_config(1, feature_dim=1, mean_nn_layers=(8,),
                               kernel_nn_layers=(8,))
        hp = make_hyper_prior(cfg)
        X, Y, M = stack_task_tuples(_tasks())
        # normalize roughly
        Y = (Y - Y.mean()) / (Y.std() + 1e-8)
        particles = hp.sample(jax.random.PRNGKey(0), (8,))
        mesh = make_mesh(8, particle_parallel=True)
        opt = optax.adam(1e-3)
        step, place = build_svgd_parallel_step(hp, 0.01, opt, mesh)
        state = opt.init(particles)
        particles_s, state_s, Xs, Ys, Ms = place(particles, state, X, Y, M)
        new_p, _ = step(particles_s, state_s, Xs, Ys, Ms)
        assert np.all(np.isfinite(np.asarray(new_p)))
        assert float(jnp.max(jnp.abs(new_p - particles_s))) > 0


class TestShardedMAMLAndNP:
    def test_sharded_maml_matches_unsharded(self, devices_ok):
        """Full-batch MAML on a task-sharded mesh == single-device run."""
        from meta_learning_pacoh_tpu import MAMLRegression
        from meta_learning_pacoh_tpu.parallel.mesh import make_mesh

        train = _tasks()
        m_plain = MAMLRegression(train, layer_sizes=(16, 16), num_iter_fit=30,
                                 random_seed=5, task_batch_size=-1)
        m_plain.meta_fit(verbose=False)

        m_shard = MAMLRegression(train, layer_sizes=(16, 16), num_iter_fit=30,
                                 random_seed=5, task_batch_size=-1,
                                 mesh=make_mesh(8))
        m_shard.meta_fit(verbose=False)

        for lp, ls in zip(jax.tree.leaves(m_plain.params),
                          jax.tree.leaves(m_shard.params)):
            np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                                       rtol=1e-4, atol=1e-5)

    def test_sharded_np_matches_unsharded(self, devices_ok):
        """Full-batch Neural Process on a task-sharded mesh == single-device."""
        from meta_learning_pacoh_tpu import NPRegressionMetaLearned
        from meta_learning_pacoh_tpu.parallel.mesh import make_mesh

        train = _tasks()
        m_plain = NPRegressionMetaLearned(train, r_dim=8, z_dim=8, h_dim=8,
                                          num_iter_fit=30, random_seed=5,
                                          task_batch_size=-1)
        m_plain.meta_fit(verbose=False)

        m_shard = NPRegressionMetaLearned(train, r_dim=8, z_dim=8, h_dim=8,
                                          num_iter_fit=30, random_seed=5,
                                          task_batch_size=-1, mesh=make_mesh(8))
        m_shard.meta_fit(verbose=False)

        for lp, ls in zip(jax.tree.leaves(m_plain.params),
                          jax.tree.leaves(m_shard.params)):
            np.testing.assert_allclose(np.asarray(lp), np.asarray(ls),
                                       rtol=1e-4, atol=1e-5)
