"""Image-completion Neural Process (reference: third_party image NP stack):
mask utilities round-trip, trainer learns, inpainting reconstructs."""

import numpy as np
import pytest

from meta_learning_pacoh_tpu.models.neural_process_img import (
    NeuralProcessImg,
    NeuralProcessImgTrainer,
    batch_context_target_mask,
    img_mask_to_np_input,
    random_context_target_mask,
    xy_to_img,
)


def _gradient_images(n, h=8, w=8, seed=0):
    """Synthetic 1-channel images: random linear intensity ramps in [0, 1]."""
    rs = np.random.RandomState(seed)
    rows = np.linspace(0, 1, h)[:, None]
    cols = np.linspace(0, 1, w)[None, :]
    imgs = []
    for _ in range(n):
        a, b = rs.uniform(0.2, 0.8, 2)
        img = a * rows + (1 - a) * cols * b
        imgs.append((img / max(img.max(), 1e-6))[None])  # [1, H, W]
    return np.stack(imgs).astype(np.float32)


def test_mask_utils_roundtrip():
    rs = np.random.RandomState(0)
    img_size = (1, 8, 8)
    cm, tm = random_context_target_mask(img_size, 5, 7, rs)
    assert cm.sum() == 5 and tm.sum() == 12
    assert np.all(tm[cm.astype(bool)] == 1)  # context subset of target

    imgs = _gradient_images(3)
    cmb, tmb = batch_context_target_mask(img_size, 5, 7, 3, random_state=rs)
    x, y = img_mask_to_np_input(imgs, tmb)
    assert x.shape == (3, 12, 2) and y.shape == (3, 12, 1)
    assert np.all(np.abs(x) <= 1.0) and np.all(np.abs(y) <= 0.5)

    # scatter back: visible pixels reproduce the image
    rec = xy_to_img(x, y, img_size)
    for i in range(3):
        m = tmb[i].astype(bool)
        np.testing.assert_allclose(rec[i, 0][m], imgs[i, 0][m], atol=1e-6)


def test_trainer_reduces_loss_and_inpaints():
    imgs = _gradient_images(16)
    model = NeuralProcessImg((1, 8, 8), r_dim=32, z_dim=16, h_dim=32,
                             random_seed=3)
    # fixed ranges -> one (P_context, P_target) shape -> a single jit trace
    trainer = NeuralProcessImgTrainer(model, lr=2e-3,
                                      num_context_range=(10, 11),
                                      num_extra_target_range=(15, 16))
    batches = [imgs[:8], imgs[8:]]
    history = trainer.train(batches, epochs=40)
    assert history[-1] < history[0]

    cm, _ = random_context_target_mask((1, 8, 8), 20, 10,
                                       np.random.RandomState(1))
    mean_img, sigma_img = model.inpaint(imgs[0], cm)
    assert mean_img.shape == (1, 8, 8) and sigma_img.shape == (1, 8, 8)
    assert np.all(np.isfinite(mean_img)) and np.all(sigma_img > 0)
    # trained model beats predicting a constant 0.5 on the full image
    err = np.mean((mean_img - imgs[0]) ** 2)
    base = np.mean((0.5 - imgs[0]) ** 2)
    assert err < base


def test_forward_loss_finite():
    imgs = _gradient_images(4, seed=2)
    model = NeuralProcessImg((1, 8, 8), r_dim=16, z_dim=8, h_dim=16,
                             random_seed=0)
    cm, tm = batch_context_target_mask((1, 8, 8), 6, 6, 4,
                                       random_state=np.random.RandomState(2))
    loss = model.forward_loss(imgs, cm, tm)
    assert np.isfinite(loss)
