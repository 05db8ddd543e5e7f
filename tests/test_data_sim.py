"""Tier-3: data-environment tests (mirrors reference tests/test_data_sim.py):
seed reproducibility, noise-free exactness, shape contracts."""

import numpy as np
import pytest

from meta_learning_pacoh_tpu.datasets import (
    CauchyDataset,
    GPFunctionsDataset,
    SinusoidDataset,
    SinusoidNonstationaryDataset,
    provide_data,
)


@pytest.mark.parametrize("env_cls", [
    SinusoidDataset, SinusoidNonstationaryDataset, GPFunctionsDataset, CauchyDataset,
])
class TestSeedReproducibility:
    def test_train_data_reproducible(self, env_cls):
        a = env_cls(random_state=np.random.RandomState(55)).generate_meta_train_data(4, 6)
        b = env_cls(random_state=np.random.RandomState(55)).generate_meta_train_data(4, 6)
        for (xa, ya), (xb, yb) in zip(a, b):
            np.testing.assert_array_equal(xa, xb)
            np.testing.assert_array_equal(ya, yb)

    def test_test_data_reproducible(self, env_cls):
        a = env_cls(random_state=np.random.RandomState(51)).generate_meta_test_data(3, 5, 7)
        b = env_cls(random_state=np.random.RandomState(51)).generate_meta_test_data(3, 5, 7)
        for ta, tb in zip(a, b):
            for arr_a, arr_b in zip(ta, tb):
                np.testing.assert_array_equal(arr_a, arr_b)

    def test_shapes(self, env_cls):
        env = env_cls(random_state=np.random.RandomState(1))
        train = env.generate_meta_train_data(3, 9)
        assert len(train) == 3
        for x, y in train:
            assert x.shape[0] == 9 and y.shape[0] == 9
        test = env.generate_meta_test_data(2, 4, 11)
        assert len(test) == 2
        for xc, yc, xt, yt in test:
            assert xc.shape[0] == 4 and yc.shape[0] == 4
            assert xt.shape[0] == 11 and yt.shape[0] == 11


class TestSinusoidValues:
    def test_noise_free_points_on_curve(self):
        """With noise_std=0 and degenerate parameter ranges, y is the exact
        deterministic sinusoid."""
        env = SinusoidDataset(
            amp_low=1.0, amp_high=1.0, x_shift_std=0.0, y_shift_std=0.0,
            slope_std=0.0, noise_std=0.0, random_state=np.random.RandomState(0),
        )
        (x, y), = env.generate_meta_train_data(1, 20)
        ref = 0.5 * x + 1.0 * np.sin(1.5 * x) + 5.0
        np.testing.assert_allclose(y, ref, atol=1e-8)

    def test_context_and_test_from_same_function(self):
        env = SinusoidDataset(noise_std=0.0, random_state=np.random.RandomState(2))
        ((xc, yc, xt, yt),) = env.generate_meta_test_data(1, 10, 10)
        # fit a dense grid interpolation sanity check: shared monotone trend
        assert np.abs(np.mean(yc) - np.mean(yt)) < 2.0


class TestProvideData:
    def test_sin_registry(self):
        train, valid, test = provide_data("sin_7", seed=28)
        assert len(train) == 7
        assert len(valid) == 200 and len(test) == 200
        x, y = train[0]
        assert x.shape == (5, 1) and y.shape == (5, 1)
        xc, yc, xt, yt = valid[0]
        assert xc.shape[0] == 5 and xt.shape[0] == 200

    def test_cauchy_registry_dims(self):
        train, valid, test = provide_data("cauchy_4", seed=28)
        assert len(train) == 4
        assert train[0][0].shape == (20, 2)

    def test_seed_changes_data(self):
        a, _, _ = provide_data("sin_3", seed=28)
        b, _, _ = provide_data("sin_3", seed=29)
        assert np.abs(a[0][0] - b[0][0]).max() > 0

    def test_seed_reproducible(self):
        a, _, _ = provide_data("sin_3", seed=28)
        b, _, _ = provide_data("sin_3", seed=28)
        np.testing.assert_array_equal(a[0][0], b[0][0])

    def test_unknown_raises(self):
        with pytest.raises(NotImplementedError):
            provide_data("not_a_dataset")
