"""Matched-initialization TRAINING-trajectory parity vs plain torch.

tools/torch_reference_check.py compares end metrics across seeds (RNG streams
differ, so only seed-level agreement is possible there). This test removes
the RNG from the picture: the torch mirror of the reference's PACOH-MAP
pipeline (equations from meta_learn/GPR_meta_mll.py:104-117 + models.py
tanh MLPs + gpytorch softplus constraints + AdamW, see
tools/torch_reference_check.py) is initialized with the SAME parameters as
the JAX learner, trained FULL-BATCH (no task sampling), and the per-step
losses must agree to ~1e-4 over 100 steps — closing the reference-parity
criterion at training level instead of the seed-noise argument.

Both sides run f32; the measured max relative loss gap on this config is
8e-8 at step 1 and 1.2e-6 over the full 100-step window (different op
orderings random-walk; recorded in STATUS.md).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu import GPRegressionMetaLearned
from meta_learning_pacoh_tpu.datasets import SinusoidDataset

torch = pytest.importorskip("torch")

N_STEPS = 100
LR = 1e-3
WD = 0.2


def _make_learner():
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    train = env.generate_meta_train_data(n_tasks=8, n_samples=5)
    m = GPRegressionMetaLearned(
        train, weight_decay=WD, lr_params=LR, num_iter_fit=N_STEPS,
        task_batch_size=-1, random_seed=30,
    )
    return m


def _torch_mirror_losses(m, n_steps):
    """Run the torch mirror from the learner's EXACT initial params on the
    learner's EXACT normalized tensors; return per-step losses."""
    import torch.nn.functional as F

    torch.set_num_threads(2)
    X = torch.as_tensor(np.asarray(m.X))      # [T, N, D] normalized
    Y = torch.as_tensor(np.asarray(m.Y))      # [T, N]
    p = jax.tree.map(lambda a: np.asarray(a), m.params)

    def t(a):
        return torch.tensor(np.asarray(a), dtype=torch.float32,
                            requires_grad=True)

    mean_w = {k: t(v) for k, v in p["mean_nn"].items()}
    kern_w = {k: t(v) for k, v in p["kernel_nn"].items()}
    raw_ls, raw_os, raw_noise = t(p["lengthscale_raw"]), t(p["outputscale_raw"]), t(p["noise_raw"])
    sp = F.softplus

    def mlp(w, x):
        n_layers = len(w) // 2 - 1
        h = x
        for i in range(n_layers):
            h = torch.tanh(h @ w[f"w_{i}"] + w[f"b_{i}"])
        return h @ w["w_out"] + w["b_out"]

    def task_mll(xn, yn):
        n = yn.shape[0]
        mean = mlp(mean_w, xn)[:, 0]
        phi = mlp(kern_w, xn)
        ls = sp(raw_ls)
        z = phi / ls
        d2 = ((z * z).sum(-1)[:, None] - 2.0 * z @ z.T
              + (z * z).sum(-1)[None, :])
        K = sp(raw_os) * torch.exp(-0.5 * torch.clamp(d2, min=0.0))
        K = K + (sp(raw_noise) + 1e-3) * torch.eye(n)
        L = torch.linalg.cholesky(K)
        r = (yn - mean)[:, None]
        zs = torch.linalg.solve_triangular(L, r, upper=False)[:, 0]
        logdet = 2.0 * torch.log(torch.diagonal(L)).sum()
        return (-0.5 * ((zs * zs).sum() + logdet + n * np.log(2 * np.pi))) / n

    params = (list(mean_w.values()) + list(kern_w.values())
              + [raw_ls, raw_os, raw_noise])
    opt = torch.optim.AdamW(params, lr=LR, weight_decay=WD)

    losses = []
    for _ in range(n_steps):
        opt.zero_grad()
        loss = -sum(task_mll(X[i], Y[i]) for i in range(X.shape[0]))
        loss.backward()
        losses.append(float(loss.detach()))
        opt.step()
    return np.asarray(losses)


def test_matched_init_fullbatch_trajectory_tracks_torch():
    m = _make_learner()
    torch_losses = _torch_mirror_losses(m, N_STEPS)

    # the learner's own jitted chunk fn returns the per-step loss vector
    _, _, losses = m._step_fn(
        m.params, m.opt_state, m.X, m.Y, m.mask, m._train_key, 0, N_STEPS
    )
    jax_losses = np.asarray(losses)

    rel = np.abs(jax_losses - torch_losses) / np.abs(torch_losses)
    # early steps: pure-arithmetic agreement; full window: 1e-4 criterion
    assert rel[:10].max() < 1e-5, rel[:10].max()
    assert rel.max() < 1e-4, (rel.max(), int(rel.argmax()))
