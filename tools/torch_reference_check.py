"""End-to-end accuracy cross-check against a plain-torch reference build.

gpytorch cannot be installed in this container, so the PyTorch reference
cannot run verbatim. This script re-implements the reference's PACOH-MAP
training pipeline in plain torch (CPU) from its equations — torch.nn.Linear
tanh MLPs (reference: meta_learn/models.py:190-217), ScaleKernel(RBFKernel)
softplus constraints, GaussianLikelihood GreaterThan(1e-3) noise
(GPR_meta_mll.py:54-56), exact-MLL-divided-by-n loss summed over a sampled
task batch (GPR_meta_mll.py:104-117), one AdamW(lr, weight_decay) over all
parameter groups (GPR_meta_mll.py:253-255) — and runs the demo.py config
(sin 20 tasks x 5 samples, data seed 26, weight_decay 0.2, 12000 iters)
side by side with the JAX learner.

RNG streams differ across frameworks, so bit-level parity is undefined; the
comparison is the demo's test metrics across model seeds. Expected outcome
(recorded in STATUS.md): |LL_jax - LL_torch| within seed noise (~0.05 nats).

Usage: python tools/torch_reference_check.py [--n_iter 12000] [--seeds 30,31]
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ------------------------------------------------------------ torch reference


def torch_pacoh_map_demo(meta_train_data, meta_test_data, seed=30,
                         n_iter=12000, weight_decay=0.2, lr=1e-3,
                         task_batch_size=5, layers=(32, 32), feature_dim=2):
    import torch
    import torch.nn as nn

    torch.manual_seed(seed)
    torch.set_num_threads(4)
    rds = np.random.RandomState(seed)

    # pooled normalization stats (reference: abstract.py:212-233)
    xs = np.concatenate([x for x, _ in meta_train_data], 0)
    ys = np.concatenate([y for _, y in meta_train_data], 0)
    x_mean, x_std = xs.mean(0), xs.std(0) + 1e-8
    y_mean, y_std = float(ys.mean()), float(ys.std() + 1e-8)

    def norm(x, y=None):
        xn = torch.as_tensor((x - x_mean) / x_std, dtype=torch.float32)
        if y is None:
            return xn
        yn = torch.as_tensor((np.ravel(y) - y_mean) / y_std, dtype=torch.float32)
        return xn, yn

    def mlp(d_in, d_out):
        layers_ = []
        d = d_in
        for h in layers:
            layers_ += [nn.Linear(d, h), nn.Tanh()]
            d = h
        layers_.append(nn.Linear(d, d_out))
        return nn.Sequential(*layers_)

    d_in = meta_train_data[0][0].shape[1]
    mean_nn = mlp(d_in, 1)
    kernel_nn = mlp(d_in, feature_dim)
    raw_ls = torch.zeros(feature_dim, requires_grad=True)
    raw_os = torch.zeros((), requires_grad=True)
    raw_noise = torch.zeros((), requires_grad=True)
    sp = torch.nn.functional.softplus

    def gram(phi1, phi2):
        ls = sp(raw_ls)
        z1, z2 = phi1 / ls, phi2 / ls
        d2 = (z1 * z1).sum(-1)[:, None] - 2.0 * z1 @ z2.T + (z2 * z2).sum(-1)[None, :]
        return sp(raw_os) * torch.exp(-0.5 * torch.clamp(d2, min=0.0))

    def task_mll(xn, yn):
        """Exact MLL / n (gpytorch ExactMarginalLogLikelihood convention)."""
        n = yn.shape[0]
        mean = mean_nn(xn)[:, 0]
        phi = kernel_nn(xn)
        K = gram(phi, phi) + (sp(raw_noise) + 1e-3) * torch.eye(n)
        L = torch.linalg.cholesky(K)
        r = (yn - mean)[:, None]
        z = torch.linalg.solve_triangular(L, r, upper=False)[:, 0]
        logdet = 2.0 * torch.log(torch.diagonal(L)).sum()
        ll = -0.5 * ((z * z).sum() + logdet + n * np.log(2 * np.pi))
        return ll / n

    params = (list(mean_nn.parameters()) + list(kernel_nn.parameters())
              + [raw_ls, raw_os, raw_noise])
    opt = torch.optim.AdamW(params, lr=lr, weight_decay=weight_decay)

    tasks = [norm(x, y) for x, y in meta_train_data]
    t0 = time.time()
    for _ in range(n_iter):
        opt.zero_grad()
        idx = rds.choice(len(tasks), size=task_batch_size)
        loss = -sum(task_mll(*tasks[i]) for i in idx)
        loss.backward()
        opt.step()
    train_s = time.time() - t0

    # eval: exact posterior + observation noise, affine un-normalized joint
    # LL / n and RMSE per task (reference: abstract.py:134-163)
    lls, rmses = [], []
    with torch.no_grad():
        for (cx, cy, tx, ty) in meta_test_data:
            xcn, ycn = norm(cx, cy)
            xtn = norm(tx)
            noise = sp(raw_noise) + 1e-3
            mean_c, mean_t = mean_nn(xcn)[:, 0], mean_nn(xtn)[:, 0]
            phi_c, phi_t = kernel_nn(xcn), kernel_nn(xtn)
            K_cc = gram(phi_c, phi_c) + noise * torch.eye(xcn.shape[0])
            K_ct = gram(phi_c, phi_t)
            K_tt = gram(phi_t, phi_t)
            A = torch.linalg.solve(K_cc, K_ct)
            post_mean = mean_t + A.T @ (ycn - mean_c)
            post_cov = K_tt - K_ct.T @ A + noise * torch.eye(xtn.shape[0])

            mean_o = y_mean + y_std * post_mean
            cov_o = (y_std ** 2) * post_cov
            yt = torch.as_tensor(np.ravel(ty), dtype=torch.float32)
            n = yt.shape[0]
            L = torch.linalg.cholesky(cov_o)
            z = torch.linalg.solve_triangular(L, (yt - mean_o)[:, None],
                                              upper=False)[:, 0]
            logdet = 2.0 * torch.log(torch.diagonal(L)).sum()
            lls.append(float(-0.5 * ((z * z).sum() + logdet
                                     + n * np.log(2 * np.pi))) / n)
            rmses.append(float(torch.sqrt(((mean_o - yt) ** 2).mean())))
    return float(np.mean(lls)), float(np.mean(rmses)), train_s


def jax_pacoh_map_demo(meta_train_data, meta_test_data, seed=30,
                       n_iter=12000, weight_decay=0.2):
    from meta_learning_pacoh_tpu import GPRegressionMetaLearned

    m = GPRegressionMetaLearned(meta_train_data, weight_decay=weight_decay,
                                num_iter_fit=n_iter, random_seed=seed)
    t0 = time.time()
    m.meta_fit(verbose=False, log_period=n_iter)
    train_s = time.time() - t0
    ll, rmse, _ = m.eval_datasets(meta_test_data)
    return ll, rmse, train_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_iter", type=int, default=12000)
    ap.add_argument("--seeds", type=str, default="30,31,32")
    args = ap.parse_args()

    from meta_learning_pacoh_tpu.datasets import SinusoidDataset

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    meta_train = env.generate_meta_train_data(n_tasks=20, n_samples=5)
    meta_test = env.generate_meta_test_data(n_tasks=20, n_samples_context=5,
                                            n_samples_test=50)

    print(f"demo config: sin 20x5 (data seed 26), wd=0.2, {args.n_iter} iters")
    for seed in (int(s) for s in args.seeds.split(",")):
        ll_t, rmse_t, s_t = torch_pacoh_map_demo(
            meta_train, meta_test, seed=seed, n_iter=args.n_iter)
        ll_j, rmse_j, s_j = jax_pacoh_map_demo(
            meta_train, meta_test, seed=seed, n_iter=args.n_iter)
        print(f"seed {seed}: torch LL {ll_t:+.4f} RMSE {rmse_t:.4f} "
              f"({s_t:.0f}s) | jax LL {ll_j:+.4f} RMSE {rmse_j:.4f} "
              f"({s_j:.0f}s) | dLL {abs(ll_t - ll_j):.4f}")


if __name__ == "__main__":
    main()
