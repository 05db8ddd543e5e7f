"""Measured torch-CPU baseline for the headline bench metric.

bench.py's headline is PACOH-SVGD meta-train steps/sec on sin_20 (20 tasks x 5
samples, 10 particles, full task batch). The reference implements this step in
PyTorch (meta_learn/GPR_meta_svgd.py + svgd.py + random_gp.py); gpytorch is not
installable here, so this module re-implements the reference's SVGD step in
plain torch from its equations, with the same math:

- K particles, each a flat vector over (mean NN, kernel NN, lengthscale_raw,
  noise_raw) with NN layers (32, 32), feature_dim 1 (the learner defaults,
  reference GPR_meta_svgd.py:16-20 / random_gp.py:24-72);
- score = grad of prior_factor * hyper-prior log-prob (per-block Normals:
  weights std 0.5, biases std 3.0, lengthscale N(0,1), noise N(-1,1),
  random_gp.py:126-150) + (m_harmonic/(m_harmonic+T)) * sum of per-task exact
  MLL/n (random_gp.py:206-219, gpytorch ExactMarginalLogLikelihood divides
  by n);
- SVGD transport phi = (K_XX @ score + grad_K)/K with median-heuristic RBF
  (svgd.py:12-23, 44-51), both kernel grads via autograd exactly as the
  reference does;
- Adam receives -phi as the gradient (svgd.py:25-28).

Two modes:
- 'ref'     — per-task Python loop over forwards, the reference's own compute
              pattern (random_gp.py:210-219);
- 'batched' — all tasks fused into one K*T-batched cholesky/bmm, i.e. a
              STRONGER torch baseline than the reference could reach without
              a rewrite. bench.py records the batched number.

Usage: python tools/torch_svgd_timing.py [--iters 200] [--mode batched|ref|both]
"""

import argparse
import math
import time

import numpy as np


def measure_torch_svgd_steps_per_sec(meta_train_data, num_particles=10,
                                     prior_factor=0.01, weight_prior_std=0.5,
                                     bias_prior_std=3.0, feature_dim=1,
                                     layers=(32, 32), lr=1e-3, mode="batched",
                                     warmup=20, iters=200, threads=None,
                                     seed=30):
    import torch

    if threads:
        torch.set_num_threads(threads)
    torch.manual_seed(seed)

    K = num_particles
    T = len(meta_train_data)
    d_in = meta_train_data[0][0].shape[1] if meta_train_data[0][0].ndim == 2 else 1

    # pooled normalization stats (reference: abstract.py:212-233)
    xs = np.concatenate([np.atleast_2d(x.reshape(len(x), -1))
                         for x, _ in meta_train_data], 0)
    ys = np.concatenate([np.ravel(y) for _, y in meta_train_data], 0)
    x_mean, x_std = xs.mean(0), xs.std(0) + 1e-8
    y_mean, y_std = ys.mean(), ys.std() + 1e-8

    X_np = np.stack([(np.atleast_2d(x.reshape(len(x), -1)) - x_mean) / x_std
                     for x, _ in meta_train_data]).astype(np.float32)
    Y_np = np.stack([(np.ravel(y) - y_mean) / y_std
                     for _, y in meta_train_data]).astype(np.float32)
    N = X_np.shape[1]
    Xt = torch.as_tensor(X_np)   # [T, N, d_in]
    Yt = torch.as_tensor(Y_np)   # [T, N]

    # flat particle layout: per-layer (W, b) for mean then kernel NN, then
    # lengthscale_raw [feature_dim], noise_raw [1]
    sizes = []
    for d_out_final, tag in ((1, "mean"), (feature_dim, "kernel")):
        d = d_in
        for h in tuple(layers) + (d_out_final,):
            sizes.append((tag + ".weight", d, h))
            sizes.append((tag + ".bias", 1, h))
            d = h
    P = sum(a * b for _, a, b in sizes) + feature_dim + 1

    def unpack(X):
        """X [K, P] -> dict of per-layer [K, d_in, d_out] / [K, 1, d_out]."""
        out, off = {"mean": [], "kernel": []}, 0
        for tag in ("mean", "kernel"):
            d = d_in
            d_final = 1 if tag == "mean" else feature_dim
            for h in tuple(layers) + (d_final,):
                W = X[:, off:off + d * h].reshape(K, d, h); off += d * h
                b = X[:, off:off + h].reshape(K, 1, h); off += h
                out[tag].append((W, b))
                d = h
        ls_raw = X[:, off:off + feature_dim]; off += feature_dim
        noise_raw = X[:, off:off + 1]; off += 1
        assert off == X.shape[1]
        return out, ls_raw, noise_raw

    def mlp(layers_kwb, x):
        """x [K, M, d_in] -> [K, M, d_out], tanh hidden (models.py:295-313)."""
        h = x
        for i, (W, b) in enumerate(layers_kwb):
            h = torch.bmm(h, W) + b
            if i < len(layers_kwb) - 1:
                h = torch.tanh(h)
        return h

    def task_mlls_batched(nets, ls_raw, noise_raw, x_kt, y_t):
        """x_kt [K, T*N, d_in] -> per-particle sum of per-task MLL/n, [K]."""
        mean = mlp(nets["mean"], x_kt)[..., 0].reshape(K, T, N)
        phi = mlp(nets["kernel"], x_kt).reshape(K, T, N, feature_dim)
        ls = torch.nn.functional.softplus(ls_raw)[:, None, None, :]
        z = phi / ls
        d2 = (z.unsqueeze(-2) - z.unsqueeze(-3)).pow(2).sum(-1)
        noise = torch.nn.functional.softplus(noise_raw)[:, :, None, None]
        Kmat = torch.exp(-0.5 * d2) + noise * torch.eye(N)
        L = torch.linalg.cholesky(Kmat.reshape(K * T, N, N))
        r = (y_t[None].expand(K, T, N) - mean).reshape(K * T, N, 1)
        zr = torch.linalg.solve_triangular(L, r, upper=False)[..., 0]
        logdet = 2.0 * torch.log(torch.diagonal(L, dim1=-2, dim2=-1)).sum(-1)
        ll = -0.5 * (zr.pow(2).sum(-1) + logdet + N * math.log(2 * math.pi))
        return (ll / N).reshape(K, T).sum(-1)

    def task_mlls_ref(nets, ls_raw, noise_raw, x_k):
        """Per-task Python loop, the reference pattern (random_gp.py:210-219)."""
        ls = torch.nn.functional.softplus(ls_raw)[:, None, :]
        noise = torch.nn.functional.softplus(noise_raw)[:, :, None]
        total = 0.0
        for t in range(T):
            xt = x_k[:, t]                      # [K, N, d_in]
            mean = mlp(nets["mean"], xt)[..., 0]
            phi = mlp(nets["kernel"], xt)
            z = phi / ls
            d2 = (z.unsqueeze(-2) - z.unsqueeze(-3)).pow(2).sum(-1)
            Kmat = torch.exp(-0.5 * d2) + noise * torch.eye(N)
            L = torch.linalg.cholesky(Kmat)
            r = (Yt[t][None].expand(K, N) - mean).unsqueeze(-1)
            zr = torch.linalg.solve_triangular(L, r, upper=False)[..., 0]
            logdet = 2.0 * torch.log(
                torch.diagonal(L, dim1=-2, dim2=-1)).sum(-1)
            total = total + (-0.5 * (zr.pow(2).sum(-1) + logdet
                                     + N * math.log(2 * math.pi))) / N
        return total

    # hyper-prior log prob: per-block Normals (random_gp.py:126-150)
    blocks = []  # (slice, loc, std)
    off = 0
    for name, a, b in sizes:
        n_el = a * b
        std = weight_prior_std if name.endswith("weight") else bias_prior_std
        blocks.append((slice(off, off + n_el), 0.0, std)); off += n_el
    blocks.append((slice(off, off + feature_dim), 0.0, 1.0)); off += feature_dim
    blocks.append((slice(off, off + 1), -1.0, 1.0))

    def hyper_prior_log_prob(X):
        lp = 0.0
        for sl, loc, std in blocks:
            v = X[:, sl]
            lp = lp + (-0.5 * ((v - loc) / std).pow(2)
                       - math.log(std) - 0.5 * math.log(2 * math.pi)).sum(-1)
        return lp

    pre = (1.0 / (1.0 / N)) / ((1.0 / (1.0 / N)) + T)  # m_tilde/(m_tilde+T)

    # init particles from the hyper-prior
    g = torch.Generator().manual_seed(seed)
    X0 = torch.empty(K, P).normal_(generator=g)
    for sl, loc, std in blocks:
        X0[:, sl] = X0[:, sl] * std + loc
    particles = X0.clone().requires_grad_(True)
    opt = torch.optim.Adam([particles], lr=lr)

    x_kt = Xt.reshape(1, T * N, d_in).expand(K, T * N, d_in)
    x_k = Xt[None].expand(K, T, N, d_in)

    def svgd_step():
        opt.zero_grad()
        nets, ls_raw, noise_raw = unpack(particles)
        if mode == "batched":
            mlls = task_mlls_batched(nets, ls_raw, noise_raw, x_kt, Yt)
        else:
            mlls = task_mlls_ref(nets, ls_raw, noise_raw, x_k)
        logp = prior_factor * hyper_prior_log_prob(particles) + pre * mlls
        score = torch.autograd.grad(logp.sum(), particles,
                                    create_graph=False)[0]
        # RBF median-heuristic Stein kernel, grads via autograd (svgd.py:17-19)
        Xv = particles.detach().requires_grad_(True)
        d2 = torch.cdist(Xv, Xv.detach()).pow(2)
        h = d2.detach().median() / math.log(K + 1)
        K_XX = torch.exp(-d2 / h)
        grad_K = -torch.autograd.grad(K_XX.sum(), Xv)[0]
        phi = (K_XX.detach() @ score + grad_K) / K
        particles.grad = -phi
        opt.step()

    for _ in range(warmup):
        svgd_step()
    t0 = time.time()
    for _ in range(iters):
        svgd_step()
    elapsed = time.time() - t0
    return iters / elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--mode", type=str, default="both",
                    choices=["batched", "ref", "both"])
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    import os
    import sys
    sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from meta_learning_pacoh_tpu.datasets import SinusoidDataset

    env = SinusoidDataset(random_state=np.random.RandomState(26))
    meta_train = env.generate_meta_train_data(n_tasks=20, n_samples=5)

    modes = ["batched", "ref"] if args.mode == "both" else [args.mode]
    for mode in modes:
        sps = measure_torch_svgd_steps_per_sec(
            meta_train, mode=mode, iters=args.iters,
            threads=args.threads or None)
        print(f"torch-cpu svgd ({mode}): {sps:.1f} steps/sec "
              f"({1000.0 / sps:.2f} ms/iter)")


if __name__ == "__main__":
    main()
