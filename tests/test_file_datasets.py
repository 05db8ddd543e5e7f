"""Fixture-backed tests for the file-backed task environments.

The reference has NO tests for Physionet/Swissfel (SURVEY.md §4: "they need
data files absent from the repo"); these synthesize tiny on-disk fixtures in
the loaders' formats so the parsing/split logic is covered.
"""

import os

import numpy as np
import pytest

h5py = pytest.importorskip("h5py")

from meta_learning_pacoh_tpu.datasets.data_sim import (
    PhysionetDataset,
    SwissfelDataset,
)


@pytest.fixture()
def physionet_dir(tmp_path):
    """Plain-h5py layout: one group per patient, 'times' + variable columns."""
    rs = np.random.RandomState(0)
    path = tmp_path / "set_a_merged.h5"
    with h5py.File(path, "w") as f:
        for i in range(6):
            g = f.create_group(f"p{i:05d}")
            n = 10 + 4 * i
            times = np.sort(rs.uniform(0, 48, n)).astype(np.float32)
            g.create_dataset("times", data=times)
            for var in PhysionetDataset.VARIABLES:
                vals = rs.randn(n).astype(np.float32) + 10.0
                vals[rs.rand(n) < 0.1] = np.nan  # dropna path
                g.create_dataset(var, data=vals)
    return str(tmp_path)


def test_physionet_train_and_test_tasks(physionet_dir):
    env = PhysionetDataset(random_state=np.random.RandomState(1),
                           variable_id=2, physionet_dir=physionet_dir)
    train = env.generate_meta_train_data(n_tasks=4, n_samples=47)
    assert len(train) == 4
    for t, v in train:
        assert t.shape == v.shape and len(t) >= 4
        assert np.all(t <= 47) and not np.any(np.isnan(v))

    test = env.generate_meta_test_data(n_tasks=3, n_samples_context=24)
    assert len(test) == 3
    for tc, vc, tt, vt in test:
        assert len(tc) >= 4 and len(tt) >= 1
        assert np.all(tc <= 24)
        assert tc.shape == vc.shape and tt.shape == vt.shape


@pytest.fixture()
def swissfel_dir(tmp_path):
    """evaluations.hdf5 per experiment: group '1' -> structured array per run."""
    rs = np.random.RandomState(0)
    d = 12
    for spec in SwissfelDataset.RUNS_12DIM:
        exp_dir = tmp_path / spec["experiment"] / "data"
        os.makedirs(exp_dir, exist_ok=True)
        path = exp_dir / "evaluations.hdf5"
        mode = "a" if path.exists() else "w"
        with h5py.File(path, mode) as f:
            g = f.require_group("1")
            run = str(spec["run"])
            if run not in g:
                n = 650
                rec = np.zeros(n, dtype=[("x", "f4", (d,)), ("y", "f4")])
                rec["x"] = rs.uniform(size=(n, d)).astype(np.float32)
                rec["y"] = rs.randn(n).astype(np.float32)
                g.create_dataset(run, data=rec)
    return str(tmp_path)


def test_swissfel_train_test_split(swissfel_dir):
    env = SwissfelDataset(random_state=np.random.RandomState(2),
                          swissfel_dir=swissfel_dir)
    train = env.generate_meta_train_data(n_tasks=5, n_samples=200)
    assert len(train) == 5
    for x, y in train:
        assert x.shape == (200, 12) and y.shape == (200,)

    test = env.generate_meta_test_data(n_samples_context=200, n_samples_test=400)
    assert len(test) == 4  # 9 runs - 5 train
    for xc, yc, xt, yt in test:
        assert xc.shape == (200, 12) and xt.shape == (400, 12)
        assert yc.shape == (200,) and yt.shape == (400,)
    # context/test indices must not overlap (shuffled split of 600 rows)
    xc, yc, xt, yt = test[0]
    joint = np.concatenate([xc, xt], axis=0)
    assert np.unique(joint, axis=0).shape[0] == joint.shape[0]


def test_swissfel_seed_controls_run_split(swissfel_dir):
    e1 = SwissfelDataset(random_state=np.random.RandomState(3),
                         swissfel_dir=swissfel_dir)
    e2 = SwissfelDataset(random_state=np.random.RandomState(3),
                         swissfel_dir=swissfel_dir)
    assert e1.run_specs_train == e2.run_specs_train
