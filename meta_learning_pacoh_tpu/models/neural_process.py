"""Latent-variable Neural Process, functional JAX implementation.

Replaces the vendored third-party NP (reference:
third_party/neural_processes/neural_process.py + models.py) with pure
functions over one parameter pytree:

  encoder    (x, y) -> r_i           ReLU MLP [h, h] -> r_dim
  aggregate  mean over points
  mu/sigma   r -> (mu, 0.1 + 0.9 sigmoid(.))           (models.py:51-84)
  decoder    (x, z) -> (mu_y, 0.1 + 0.9 softplus(.))   (models.py:87-156)

The context-is-subset-of-target convention is preserved
(third_party utils.py:5-34).
"""

import jax
import jax.numpy as jnp



def _linear(params, name, x):
    return x @ params[f"w_{name}"] + params[f"b_{name}"]


def _init_linear(key, fan_in, fan_out):
    import math

    kw, kb = jax.random.split(key)
    bound = 1.0 / math.sqrt(fan_in)
    return (
        jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    )


def init_np_params(key, x_dim, y_dim, r_dim=50, z_dim=50, h_dim=50):
    keys = jax.random.split(key, 11)
    p = {}
    # encoder: (x_dim+y_dim) -> h -> h -> r
    for i, (fi, fo) in enumerate([(x_dim + y_dim, h_dim), (h_dim, h_dim), (h_dim, r_dim)]):
        p[f"w_enc_{i}"], p[f"b_enc_{i}"] = _init_linear(keys[i], fi, fo)
    # mu/sigma encoder: r -> r(hidden) -> z twice
    p["w_rh"], p["b_rh"] = _init_linear(keys[3], r_dim, r_dim)
    p["w_rmu"], p["b_rmu"] = _init_linear(keys[4], r_dim, z_dim)
    p["w_rsig"], p["b_rsig"] = _init_linear(keys[5], r_dim, z_dim)
    # decoder: (x_dim+z_dim) -> h -> h -> h, then mu/sigma heads
    for i, (fi, fo) in enumerate([(x_dim + z_dim, h_dim), (h_dim, h_dim), (h_dim, h_dim)]):
        p[f"w_dec_{i}"], p[f"b_dec_{i}"] = _init_linear(keys[6 + i], fi, fo)
    p["w_dmu"], p["b_dmu"] = _init_linear(keys[9], h_dim, y_dim)
    p["w_dsig"], p["b_dsig"] = _init_linear(keys[10], h_dim, y_dim)
    return p


def np_encode(params, x, y, mask=None):
    """(x [N, Dx], y [N, Dy]) -> (mu_z, sigma_z) of the latent.

    mask [N] (1=real, 0=padding) makes the mean-aggregation ignore padded
    points, so ragged task sets (e.g. Physionet) ride the same static shapes.
    """
    h = jnp.concatenate([x, y], axis=-1)
    h = jax.nn.relu(_linear(params, "enc_0", h))
    h = jax.nn.relu(_linear(params, "enc_1", h))
    r_i = _linear(params, "enc_2", h)  # [N, r]
    if mask is None:
        r = jnp.mean(r_i, axis=0)
    else:
        r = jnp.sum(r_i * mask[:, None], axis=0) / jnp.maximum(jnp.sum(mask), 1.0)
    hidden = jax.nn.relu(r @ params["w_rh"] + params["b_rh"])
    mu = hidden @ params["w_rmu"] + params["b_rmu"]
    sigma = 0.1 + 0.9 * jax.nn.sigmoid(hidden @ params["w_rsig"] + params["b_rsig"])
    return mu, sigma


def np_decode(params, x, z):
    """(x [N, Dx], z [Dz]) -> (mu_y [N, Dy], sigma_y [N, Dy])."""
    zt = jnp.broadcast_to(z, (x.shape[0],) + z.shape)
    h = jnp.concatenate([x, zt], axis=-1)
    h = jax.nn.relu(_linear(params, "dec_0", h))
    h = jax.nn.relu(_linear(params, "dec_1", h))
    h = jax.nn.relu(_linear(params, "dec_2", h))
    mu = h @ params["w_dmu"] + params["b_dmu"]
    sigma = 0.1 + 0.9 * jax.nn.softplus(h @ params["w_dsig"] + params["b_dsig"])
    return mu, sigma


def np_elbo_loss(params, key, x, y, num_context, mask=None):
    """Per-task NP training loss (reference: NPR_meta.py:228-252):
    -sum log p(y_target | z~q_target) + sum KL(q_target || q_context),
    context = first num_context of a shuffled target set (= all real points).

    mask [N] marks real points; num_context may be a traced per-task scalar.
    Padded points are shuffled to the back, excluded from both encoders and
    the log-likelihood.
    """
    n = x.shape[0]
    if mask is None:
        mask = jnp.ones((n,), x.dtype)
    # random order among REAL points, padding pushed to the back
    scores = jax.random.uniform(key, (n,)) + (1.0 - mask) * 10.0
    perm = jnp.argsort(scores)
    x_t, y_t, m_t = x[perm], y[perm], mask[perm]
    ctx_mask = (jnp.arange(n) < num_context).astype(x.dtype) * m_t

    mu_t, sig_t = np_encode(params, x_t, y_t, mask=m_t)
    mu_c, sig_c = np_encode(params, x_t, y_t, mask=ctx_mask)
    z = mu_t + sig_t * jax.random.normal(jax.random.fold_in(key, 1), mu_t.shape)
    mu_y, sig_y = np_decode(params, x_t, z)

    log_lik = jnp.sum(
        m_t[:, None] * (
            -0.5 * (((y_t - mu_y) / sig_y) ** 2) - jnp.log(sig_y)
            - 0.5 * jnp.log(2.0 * jnp.pi)
        )
    )
    kl = jnp.sum(
        jnp.log(sig_c) - jnp.log(sig_t)
        + (sig_t**2 + (mu_t - mu_c) ** 2) / (2.0 * sig_c**2) - 0.5
    )
    return -log_lik + kl


def np_predict(params, key, x_context, y_context, x_test):
    """Eval-mode prediction: z sampled from q_context
    (reference: neural_process.py:124-135). Returns (mu_y, sigma_y) [Nt, Dy]."""
    mu_c, sig_c = np_encode(params, x_context, y_context)
    z = mu_c + sig_c * jax.random.normal(key, mu_c.shape)
    return np_decode(params, x_test, z)
