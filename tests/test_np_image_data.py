"""NP image data loaders + json-config experiment driver.

Fixture pattern of test_file_datasets.py: synthesize tiny on-disk files in
the loaders' exact formats (IDX for MNIST, jpgs for CelebA) so the parsing,
crop/resize, static-shape batching, and the end-to-end json-config driver
(reference third_party/neural_processes/{datasets,main_experiment}.py) are
covered without real datasets.
"""

import gzip
import json
import os
import struct

import numpy as np
import pytest

from meta_learning_pacoh_tpu.datasets.np_image_data import (
    ImageBatches,
    SineFunctionData,
    celeba_image_batches,
    mnist_image_batches,
)


@pytest.fixture()
def mnist_dir(tmp_path):
    """12 random 28x28 images in gzipped IDX3 format."""
    rs = np.random.RandomState(0)
    imgs = rs.randint(0, 256, size=(12, 28, 28), dtype=np.uint8)
    raw = struct.pack(">IIII", 2051, *imgs.shape) + imgs.tobytes()
    with gzip.open(tmp_path / "train-images-idx3-ubyte.gz", "wb") as f:
        f.write(raw)
    return str(tmp_path)


@pytest.fixture()
def celeba_dir(tmp_path):
    from PIL import Image

    rs = np.random.RandomState(1)
    for i in range(6):
        arr = rs.randint(0, 256, size=(109, 89, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{i:06d}.jpg")
    return str(tmp_path)


def test_sine_function_data_shapes_and_ranges():
    d = SineFunctionData(num_samples=7, num_points=50,
                         random_state=np.random.RandomState(0))
    assert len(d) == 7
    x, y = d[3]
    assert x.shape == (50, 1) and y.shape == (50, 1)
    assert abs(float(x[0, 0]) + np.pi) < 1e-6
    assert np.all(np.abs(y) <= 1.0 + 1e-6)  # |a| <= 1


def test_mnist_batches_static_shapes_and_resize(mnist_dir):
    b = mnist_image_batches(batch_size=5, size=28, path_to_data=mnist_dir,
                            random_state=np.random.RandomState(0))
    batches = list(b)
    assert len(batches) == 2  # 12 // 5, drop-last
    for img in batches:
        assert img.shape == (5, 1, 28, 28)
        assert 0.0 <= img.min() and img.max() <= 1.0
    # resize path
    b16 = mnist_image_batches(batch_size=4, size=16, path_to_data=mnist_dir)
    assert next(iter(b16)).shape == (4, 1, 16, 16)
    # re-iteration reshuffles but keeps shapes
    again = list(b)
    assert len(again) == 2 and again[0].shape == (5, 1, 28, 28)


def test_celeba_batches_crop_then_resize(celeba_dir):
    b = celeba_image_batches(celeba_dir, batch_size=3, size=32, crop=89)
    batches = list(b)
    assert len(batches) == 2
    assert batches[0].shape == (3, 3, 32, 32)
    assert 0.0 <= batches[0].min() and batches[0].max() <= 1.0


def test_image_batches_drop_last_and_reshuffle():
    imgs = np.arange(10, dtype=np.float32).reshape(10, 1, 1, 1) * np.ones(
        (10, 1, 4, 4), np.float32)
    b = ImageBatches(imgs, batch_size=4, shuffle=True,
                     random_state=np.random.RandomState(0))
    e1 = np.concatenate([x[:, 0, 0, 0] for x in b])
    e2 = np.concatenate([x[:, 0, 0, 0] for x in b])
    assert e1.shape == (8,) and e2.shape == (8,)  # drop-last
    assert not np.array_equal(e1, e2)  # reshuffled


def test_json_config_mnist_experiment_end_to_end(mnist_dir, tmp_path):
    """The reference main_experiment.py flow: json config -> epoch train ->
    losses.json + model.pkl checkpoints."""
    from experiments.np_image_experiment import run_experiment

    config = {
        "dataset": "mnist", "img_size": [1, 16, 16], "batch_size": 4,
        "r_dim": 8, "h_dim": 8, "z_dim": 4,
        "num_context_range": [3, 5], "num_extra_target_range": [4, 6],
        "epochs": 2, "lr": 1e-3, "path_to_data": mnist_dir, "seed": 0,
    }
    losses, results_dir = run_experiment(
        config, results_dir=str(tmp_path / "res"), verbose=False)
    assert len(losses) == 2
    assert all(np.isfinite(losses))
    with open(os.path.join(results_dir, "losses.json")) as f:
        assert json.load(f) == [float(x) for x in losses]
    assert os.path.exists(os.path.join(results_dir, "model.pkl"))
    assert os.path.exists(os.path.join(results_dir, "config.json"))
