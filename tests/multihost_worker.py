"""Worker process for tests/test_multihost.py.

Each worker calls `initialize_distributed` (the real multi-process
`jax.distributed` path, parallel/mesh.py) to join a 2-process CPU cluster
(4 local devices each -> 8-device GLOBAL mesh), then meta-fits the same
PACOH-MAP learner through the mesh-sharded training path. Process 0 dumps
the trained GP-prior parameters for the parent test to compare against a
single-process fit.

Usage (spawned by the test, never run directly):
    python multihost_worker.py <coordinator> <num_procs> <proc_id> <out.npz>
"""

import sys


def main():
    coordinator, num_procs, proc_id, out_path = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])

    from meta_learning_pacoh_tpu.parallel.mesh import (
        initialize_distributed,
        make_mesh,
    )

    initialize_distributed(coordinator_address=coordinator,
                           num_processes=num_procs, process_id=proc_id)

    import jax
    import numpy as np

    assert len(jax.devices()) == 8, jax.devices()
    assert jax.process_count() == num_procs

    from meta_learning_pacoh_tpu import GPRegressionMetaLearned
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=8, n_samples=5)

    mesh = make_mesh()
    m = GPRegressionMetaLearned(
        train, num_iter_fit=20, task_batch_size=-1, random_seed=30,
        mean_nn_layers=(8,), kernel_nn_layers=(8,), mesh=mesh)
    m.meta_fit(verbose=False)

    if proc_id == 0:
        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(m.params)[0]:
            key = "/".join(str(p) for p in path)
            flat[key] = np.asarray(leaf)
        np.savez(out_path, **flat)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
