"""Neural Processes for image completion (context pixels -> full image).

Rebuilds the reference's vendored image-NP stack — `NeuralProcessImg`
(reference: third_party/neural_processes/neural_process.py:138-189), the
mask utilities `img_mask_to_np_input` / `random_context_target_mask` /
`batch_context_target_mask` / `xy_to_img` (reference:
third_party/neural_processes/utils.py:37-196), and `NeuralProcessTrainer`
(reference: third_party/neural_processes/training.py:10-131) — on top of the
functional JAX NP core (models/neural_process.py).

TPU-first deltas: masks are sampled host-side as *index arrays* with a fixed
point count (the reference already requires every mask in a batch to expose
the same number of pixels, utils.py:50-53), so the jitted ELBO step sees
static [B, P, 2]/[B, P, C] gathers and one `vmap` covers the image batch —
no per-image Python loop, no recompile across batches.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.models.neural_process import (
    init_np_params,
    np_decode,
    np_encode,
)


# ----------------------------------------------------------------- mask utils


def img_mask_to_np_input(img, mask, normalize=True):
    """(img [B, C, H, W], mask [B, H, W] binary) -> (x [B, P, 2], y [B, P, C]).

    x holds (row, col) locations of visible pixels, y their intensities.
    Every mask must expose the SAME number P of pixels (reference contract,
    utils.py:50-53). normalize=True maps locations to [-1, 1] and
    intensities to [-0.5, 0.5] (utils.py:55-57). Host-side numpy.
    """
    img = np.asarray(img)
    mask = np.asarray(mask).astype(bool)
    b, c, h, w = img.shape
    xs, ys = [], []
    for i in range(b):
        rows, cols = np.nonzero(mask[i])
        xs.append(np.stack([rows, cols], axis=-1).astype(np.float32))
        ys.append(img[i, :, rows, cols].astype(np.float32))  # [P, C]
    P = xs[0].shape[0]
    assert all(x.shape[0] == P for x in xs), "masks must expose equal counts"
    x = np.stack(xs)  # [B, P, 2]
    y = np.stack(ys)  # [B, P, C]
    if normalize:
        x = (x - np.array([h / 2.0, w / 2.0], np.float32)) / np.array(
            [h / 2.0, w / 2.0], np.float32)
        y = y - 0.5
    return x, y


def random_context_target_mask(img_size, num_context, num_extra_target,
                               random_state=None):
    """Random binary (context, target) masks with context a subset of target
    (reference: utils.py:88-121)."""
    rs = random_state or np.random
    _, h, w = img_size
    measurements = rs.choice(h * w, size=num_context + num_extra_target,
                             replace=False)
    context_mask = np.zeros((h, w), np.uint8)
    target_mask = np.zeros((h, w), np.uint8)
    rows, cols = measurements // w, measurements % w
    target_mask[rows, cols] = 1
    context_mask[rows[:num_context], cols[:num_context]] = 1
    return context_mask, target_mask


def batch_context_target_mask(img_size, num_context, num_extra_target,
                              batch_size, repeat=False, random_state=None):
    """Batch of (context, target) masks (reference: utils.py:124-159)."""
    _, h, w = img_size
    cm = np.zeros((batch_size, h, w), np.uint8)
    tm = np.zeros((batch_size, h, w), np.uint8)
    if repeat:
        c, t = random_context_target_mask(img_size, num_context,
                                          num_extra_target, random_state)
        cm[:], tm[:] = c, t
    else:
        for i in range(batch_size):
            cm[i], tm[i] = random_context_target_mask(
                img_size, num_context, num_extra_target, random_state)
    return cm, tm


def xy_to_img(x, y, img_size):
    """Inverse of img_mask_to_np_input: scatter normalized (x, y) points back
    into [B, C, H, W] images; missing pixels are 0 (reference: utils.py:162-196)."""
    x, y = np.asarray(x), np.asarray(y)
    c, h, w = img_size
    b = x.shape[0]
    rows = np.clip((x[..., 0] * (h / 2.0) + h / 2.0).astype(int), 0, h - 1)
    cols = np.clip((x[..., 1] * (w / 2.0) + w / 2.0).astype(int), 0, w - 1)
    img = np.zeros((b, c, h, w), np.float32)
    for i in range(b):
        # advanced indexing puts the point axis first: result is [P, C]
        img[i, :, rows[i], cols[i]] = y[i] + 0.5
    return img


# ------------------------------------------------------------------- ELBO/jit


def np_elbo_given_split(params, key, xc, yc, xt, yt):
    """NP training loss with an explicit context-subset/target split:
    -sum log p(y_t | z ~ q_target) + KL(q_target || q_context)
    (reference: training.py:110-131)."""
    mu_t, sig_t = np_encode(params, xt, yt)
    mu_c, sig_c = np_encode(params, xc, yc)
    z = mu_t + sig_t * jax.random.normal(key, mu_t.shape)
    mu_y, sig_y = np_decode(params, xt, z)
    log_lik = jnp.sum(
        -0.5 * (((yt - mu_y) / sig_y) ** 2) - jnp.log(sig_y)
        - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    kl = jnp.sum(
        jnp.log(sig_c) - jnp.log(sig_t)
        + (sig_t**2 + (mu_t - mu_c) ** 2) / (2.0 * sig_c**2) - 0.5
    )
    return -log_lik + kl


# ----------------------------------------------------------------------- model


class NeuralProcessImg:
    """Image-completion NP: x = normalized pixel locations, y = intensities
    (reference: neural_process.py:138-189)."""

    def __init__(self, img_size, r_dim=128, z_dim=128, h_dim=128,
                 random_seed=None):
        self.img_size = tuple(img_size)
        self.num_channels = img_size[0]
        key = jax.random.PRNGKey(0 if random_seed is None else random_seed)
        self.params = init_np_params(key, x_dim=2, y_dim=self.num_channels,
                                     r_dim=r_dim, z_dim=z_dim, h_dim=h_dim)
        self._rng = np.random.RandomState(random_seed)
        self._key = jax.random.fold_in(key, 1)

        @jax.jit
        def batch_elbo(params, key, XC, YC, XT, YT):
            keys = jax.random.split(key, XC.shape[0])
            losses = jax.vmap(
                lambda k, xc, yc, xt, yt:
                np_elbo_given_split(params, k, xc, yc, xt, yt)
            )(keys, XC, YC, XT, YT)
            return jnp.mean(losses)

        self._batch_elbo = batch_elbo

        @jax.jit
        def predict_fn(params, key, xc, yc, xt):
            mu_c, sig_c = np_encode(params, xc, yc)
            z = mu_c + sig_c * jax.random.normal(key, mu_c.shape)
            return np_decode(params, xt, z)

        self._predict_fn = predict_fn

    def _next_key(self):
        self._key, k = jax.random.split(self._key)
        return k

    def forward_loss(self, img, context_mask, target_mask):
        """Mean ELBO loss of a batch given explicit masks."""
        xc, yc = img_mask_to_np_input(img, context_mask)
        xt, yt = img_mask_to_np_input(img, target_mask)
        return float(self._batch_elbo(
            self.params, self._next_key(),
            jnp.asarray(xc), jnp.asarray(yc), jnp.asarray(xt), jnp.asarray(yt),
        ))

    def inpaint(self, img, context_mask):
        """Complete a single image from its visible (context) pixels:
        predicts intensities at ALL pixel locations. img [C, H, W],
        context_mask [H, W] -> (mean_img, sigma_img) [C, H, W]."""
        c, h, w = self.img_size
        xc, yc = img_mask_to_np_input(img[None], context_mask[None])
        rows, cols = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        x_all = np.stack([rows.ravel(), cols.ravel()], -1).astype(np.float32)
        x_all = (x_all - np.array([h / 2.0, w / 2.0], np.float32)) / np.array(
            [h / 2.0, w / 2.0], np.float32)
        mu, sigma = self._predict_fn(
            self.params, self._next_key(), jnp.asarray(xc[0]),
            jnp.asarray(yc[0]), jnp.asarray(x_all),
        )
        mu = np.asarray(mu).T.reshape(c, h, w) + 0.5
        sigma = np.asarray(sigma).T.reshape(c, h, w)
        return mu, sigma


class NeuralProcessImgTrainer:
    """Epoch trainer for image NPs (reference: training.py:10-105): per batch,
    sample (num_context, num_extra_target) uniformly from the given ranges,
    build random masks, minimize the ELBO loss with Adam.

    XLA note: every distinct (num_context, num_target) pair is a new static
    shape and re-traces the step. Wide ranges therefore pay one compile per
    distinct draw (the reference pays per-batch eager overhead instead); on
    TPU prefer narrow ranges or bucketed point counts."""

    def __init__(self, neural_process, lr=1e-3, num_context_range=(3, 50),
                 num_extra_target_range=(5, 50), print_freq=100):
        self.np_img = neural_process
        self.num_context_range = num_context_range
        self.num_extra_target_range = num_extra_target_range
        self.print_freq = print_freq
        self._opt = optax.adam(lr)
        self._opt_state = self._opt.init(neural_process.params)

        opt = self._opt

        @jax.jit
        def step(params, opt_state, key, XC, YC, XT, YT):
            loss, grads = jax.value_and_grad(
                lambda p: neural_process._batch_elbo(p, key, XC, YC, XT, YT)
            )(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        self._step = step
        self.steps = 0
        self.epoch_loss_history = []

    def train(self, batches, epochs, verbose=False):
        """batches: iterable of [B, C, H, W] numpy arrays (pixel values in
        [0, 1]); re-iterated each epoch."""
        m = self.np_img
        rs = m._rng
        for epoch in range(epochs):
            epoch_loss, n_batches = 0.0, 0
            for img in batches:
                num_context = rs.randint(*self.num_context_range)
                num_extra = rs.randint(*self.num_extra_target_range)
                cm, tm = batch_context_target_mask(
                    m.img_size, num_context, num_extra, img.shape[0],
                    random_state=rs)
                xc, yc = img_mask_to_np_input(img, cm)
                xt, yt = img_mask_to_np_input(img, tm)
                m.params, self._opt_state, loss = self._step(
                    m.params, self._opt_state, m._next_key(),
                    jnp.asarray(xc), jnp.asarray(yc),
                    jnp.asarray(xt), jnp.asarray(yt),
                )
                epoch_loss += float(loss)
                n_batches += 1
                self.steps += 1
                if verbose and self.steps % self.print_freq == 0:
                    print(f"iteration {self.steps}, loss {float(loss):.3f}")
            self.epoch_loss_history.append(epoch_loss / max(n_batches, 1))
        return self.epoch_loss_history
