"""Pallas TPU kernel: an ENTIRE PACOH-MAP training run in one kernel launch.

The reference's flagship demo (reference: demo.py:14-35) trains
`GPRegressionMetaLearned`: shared NN mean + NN-feature RBF kernel +
likelihood noise by AdamW on the negative sum of per-task exact MLLs
(reference: GPR_meta_mll.py:104-117, 255). This kernel runs that whole loop
— forward (two MLPs + masked exact-GP MLL over every task), the
hand-derived backward, and an exact optax-AdamW update — inside one
`pl.pallas_call`, with a `fori_loop` running `n_steps` iterations back to
back and all state VMEM-resident. It is the single-model (K=1) sibling of
the fused SVGD kernel (ops/pallas/fused_train_kernel.py) with three deltas:
no Stein transport, the MAP/gpytorch constraint flavor (outputscale,
noise = softplus + 1e-3 floor; models/gp_base.py:9-11), and decoupled
weight decay (AdamW) as the meta-regularizer instead of a hyper-prior.

Layouts: everything is dense and 2-D. MLP weights keep their natural
[in, out] shapes ([M, H] activations, M = T*N rows, n-major). The per-task
GP linalg is ENTRY-WISE over [T, 1] tiles (rows = tasks): each matrix entry
of all T N x N systems is one [T, 1] tensor, so one unrolled
Cholesky/solve/inverse sweep factorizes every task simultaneously on the
VPU — [T, 1] tiles occupy the same vector registers as the SVGD kernel's
[T, K] tiles, so K=1 wastes nothing. Kernel features are [T, F] tiles
(F = feature_dim lanes) reduced over lanes into the [T, 1] Gram entries.

Fast-path constraints (the general XLA path remains for the rest):
mean_module == covar_module == 'NN', learning_mode == 'both', full task
batch OR count-weighted sampled batches (counted=True — per-step draw
counts streamed as pages, the learner's _weight_by_counts analog),
Adam(W), optionally staircase StepLR (lr_decay < 1: launch_sched splits
launches at staircase boundaries, per-launch lr rides the runtime scalar),
N <= 8 (unrolled-linalg window), f32.

Known divergence from optax: the Adam bias-correction step counter is
carried as f32 SMEM (`t_f = step0 + i + 1`), so past ~2^24 total steps the
counter loses integer exactness and the corrections silently diverge from
optax's int32 count. Harmless in practice — the corrections are ~1.0 long
before that (1 - b1^t underflows to exactly 1.0 near t ≈ 2.4k for b1=0.9,
t ≈ 18k for b2=0.999) — but bit-exact optax parity is only claimed for runs
whose total step count stays below 2^24.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
    _chol_e,
    _kinv_e,
    _lower_inv_e,
    _mm,
    _mm_nt,
    _mm_tn,
    _sigmoid,
    _softplus,
    _solve_lower_e,
    _solve_lower_t_e,
)

_LOG_2PI = math.log(2.0 * math.pi)


def state_names(mean_hidden, kernel_hidden):
    names = []
    for tag, hidden in (("m", mean_hidden), ("k", kernel_hidden)):
        for i in range(len(hidden)):
            names += [f"{tag}_w{i}", f"{tag}_b{i}"]
        names += [f"{tag}_wout", f"{tag}_bout"]
    return names + ["ls", "os", "nz"]


# ------------------------------------------------------- host-side layouts


def pack_state(params, mean_hidden, kernel_hidden):
    """GPConfig NN/NN param pytree -> dict of kernel-layout f32 tensors."""
    out = {}
    for tag, net, hidden in (("m", params["mean_nn"], mean_hidden),
                             ("k", params["kernel_nn"], kernel_hidden)):
        for i in range(len(hidden)):
            out[f"{tag}_w{i}"] = jnp.asarray(net[f"w_{i}"], jnp.float32)
            out[f"{tag}_b{i}"] = jnp.asarray(net[f"b_{i}"],
                                             jnp.float32).reshape(1, -1)
        if tag == "m":
            # mean head [H, 1] stored as a [1, H] row (lane-sum forward)
            out["m_wout"] = jnp.asarray(net["w_out"],
                                        jnp.float32).reshape(1, -1)
        else:
            out["k_wout"] = jnp.asarray(net["w_out"], jnp.float32)  # [H, F]
        out[f"{tag}_bout"] = jnp.asarray(net["b_out"],
                                         jnp.float32).reshape(1, -1)
    out["ls"] = jnp.asarray(params["lengthscale_raw"],
                            jnp.float32).reshape(1, -1)
    out["os"] = jnp.asarray(params["outputscale_raw"],
                            jnp.float32).reshape(1, 1)
    out["nz"] = jnp.asarray(params["noise_raw"], jnp.float32).reshape(1, 1)
    return out


def unpack_state(packed, mean_hidden, kernel_hidden):
    """Inverse of pack_state -> GPConfig NN/NN param pytree."""
    params = {}
    for tag, key, hidden in (("m", "mean_nn", mean_hidden),
                             ("k", "kernel_nn", kernel_hidden)):
        net = {}
        for i in range(len(hidden)):
            net[f"w_{i}"] = packed[f"{tag}_w{i}"]
            net[f"b_{i}"] = packed[f"{tag}_b{i}"].reshape(-1)
        if tag == "m":
            net["w_out"] = packed["m_wout"].reshape(-1, 1)
        else:
            net["w_out"] = packed["k_wout"]
        net["b_out"] = packed[f"{tag}_bout"].reshape(-1)
        params[key] = net
    params["lengthscale_raw"] = packed["ls"].reshape(-1)
    params["outputscale_raw"] = packed["os"].reshape(())
    params["noise_raw"] = packed["nz"].reshape(())
    return params


# ------------------------------------------------------------- kernel body


def _make_kernel(*, T, N, D, F, mean_hidden, kernel_hidden,
                 noise_floor, n_steps, counted=False, b1=0.9, b2=0.999,
                 eps=1e-8):
    """counted=True streams a per-step [T] task-draw count page and weights
    every per-task contribution by counts_t * w_t — the kernel analog of
    the learner's no-gather count-weighted task batching
    (algos/pacoh_map.py _weight_by_counts; same randint draws host-side,
    so the fused and XLA paths follow the SAME random trajectory)."""
    M = T * N
    names = state_names(mean_hidden, kernel_hidden)
    S = len(names)
    n_mh, n_kh = len(mean_hidden), len(kernel_hidden)

    def kernel(*refs):
        state_refs = refs[:S]
        m_refs = refs[S:2 * S]
        v_refs = refs[2 * S:3 * S]
        x_ref, y_ref, mask_ref, w_ref, scal_ref = refs[3 * S:3 * S + 5]
        n_in = 3 * S + 5 + (1 if counted else 0)
        counts_hbm = refs[3 * S + 5] if counted else None
        out_state = refs[n_in:n_in + S]
        out_m = refs[n_in + S:n_in + 2 * S]
        out_v = refs[n_in + 2 * S:n_in + 3 * S]
        out_loss = refs[n_in + 3 * S]       # [1, 1] last-iteration loss
        out_loss_sum = refs[n_in + 3 * S + 1]  # [1, 1] chunk loss sum
        if counted:
            counts_scr = refs[n_in + 3 * S + 2]
            dma_sem = refs[n_in + 3 * S + 3]

        x = x_ref[...]        # [M, D], rows n-major (row n*T + t)
        y_nm = y_ref[...]     # [M, 1]
        msk = mask_ref[...]   # [M, 1]
        w_t = w_ref[...]      # [T, 1]  1/n_eff (0 for empty tasks)
        # runtime scalars (SMEM): step0, lr, weight_decay — lr and the
        # decay are TRACED so hyperparameter sweeps share ONE compiled
        # kernel instead of paying a Mosaic recompile per trial
        step0 = scal_ref[0, 0]
        lr = scal_ref[0, 1]
        weight_decay = scal_ref[0, 2]
        ones_m = jnp.ones((1, M), jnp.float32)

        def _adamw_update(g, st_l, m_l, v_l, i):
            """Exact optax.adamw: adam-normalized update + decoupled decay."""
            t_f = step0 + jnp.asarray(i, jnp.float32) + 1.0
            bc1 = 1.0 - jnp.exp(t_f * math.log(b1))
            bc2 = 1.0 - jnp.exp(t_f * math.log(b2))
            new_st, new_m, new_v = [], [], []
            for nm, th, m_, v_ in zip(names, st_l, m_l, v_l):
                gg = g[nm]
                m_n = b1 * m_ + (1.0 - b1) * gg
                v_n = b2 * v_ + (1.0 - b2) * gg * gg
                upd = (m_n / bc1) / (jnp.sqrt(v_n / bc2) + eps)
                new_st.append(th - lr * (upd + weight_decay * th))
                new_m.append(m_n)
                new_v.append(v_n)
            return tuple(new_st), tuple(new_m), tuple(new_v)

        def hidden_forward(st, tag, n_hidden):
            """x -> last hidden activation, first layer via per-d broadcast
            (D is tiny; avoids a [M, D] @ [D, H] matmul with D ~ 1)."""
            w1 = st[f"{tag}_w0"]
            pre = st[f"{tag}_b0"]
            for d in range(D):
                pre = pre + x[:, d:d + 1] * w1[d:d + 1, :]
            a = jnp.tanh(pre)
            acts = [a]
            for i in range(1, n_hidden):
                a = jnp.tanh(_mm(a, st[f"{tag}_w{i}"]) + st[f"{tag}_b{i}"])
                acts.append(a)
            return acts

        def hidden_backward(st, tag, acts, da, g):
            """da = dL/d(last activation) [M, H]; writes w/b grads into g."""
            n_hidden = len(acts)
            for i in range(n_hidden - 1, 0, -1):
                dz = da * (1.0 - acts[i] * acts[i])
                g[f"{tag}_w{i}"] = _mm_tn(acts[i - 1], dz)
                g[f"{tag}_b{i}"] = _mm(ones_m, dz)
                da = _mm_nt(dz, st[f"{tag}_w{i}"])
            dz1 = da * (1.0 - acts[0] * acts[0])
            g[f"{tag}_w0"] = _mm_tn(x, dz1)
            g[f"{tag}_b0"] = _mm(ones_m, dz1)

        def body(i, carry):
            st_l, m_l, v_l, _, loss_sum = carry
            st = dict(zip(names, st_l))

            if counted:
                # stream this step's task-draw counts HBM -> VMEM
                dma = pltpu.make_async_copy(counts_hbm.at[i], counts_scr,
                                            dma_sem)
                dma.start()
                dma.wait()
                c_t = counts_scr[0:T, 0:1]              # [T, 1]
                # never-sampled tasks contribute EXACTLY 0 (0 * NaN guard,
                # same rationale as the learner's masked weighting)
                w_i = jnp.where(c_t > 0, w_t * c_t, 0.0)
            else:
                w_i = w_t

            # ---------------- forward ----------------
            m_acts = hidden_forward(st, "m", n_mh)
            mu = (jnp.sum(m_acts[-1] * st["m_wout"], axis=1, keepdims=True)
                  + st["m_bout"])                     # [M, 1]
            k_acts = hidden_forward(st, "k", n_kh)
            phi = _mm(k_acts[-1], st["k_wout"]) + st["k_bout"]  # [M, F]

            sp_ls = _softplus(st["ls"])               # [1, F]
            sp_os = _softplus(st["os"])[0, 0]         # scalar
            sp_nz = _softplus(st["nz"])[0, 0]         # scalar

            # [T, *] entry tiles (rows n-major: entry i is rows i*T..i*T+T)
            m_e = [msk[i2 * T:(i2 + 1) * T, :] for i2 in range(N)]   # [T, 1]
            y_e = [y_nm[i2 * T:(i2 + 1) * T, :] for i2 in range(N)]  # [T, 1]
            mu_e = [mu[i2 * T:(i2 + 1) * T, :] for i2 in range(N)]   # [T, 1]
            z_e = [phi[i2 * T:(i2 + 1) * T, :] / sp_ls
                   for i2 in range(N)]                               # [T, F]

            r_rows = [(y_e[i2] - mu_e[i2]) * m_e[i2] for i2 in range(N)]

            diag_add = sp_nz + noise_floor + 1e-6
            Kn = {}
            Km_e = {}
            for i2 in range(N):
                diag_i = jnp.where(m_e[i2] > 0, diag_add, 1.0)
                for j2 in range(i2 + 1):
                    dzf = z_e[i2] - z_e[j2]                      # [T, F]
                    d2 = jnp.sum(dzf * dzf, axis=1, keepdims=True)
                    km = sp_os * jnp.exp(-0.5 * d2)              # [T, 1]
                    Km_e[(i2, j2)] = km
                    Km_e[(j2, i2)] = km
                    v_ = km * m_e[i2] * m_e[j2]
                    if i2 == j2:
                        v_ = v_ + diag_i
                    Kn[(i2, j2)] = v_
                    Kn[(j2, i2)] = v_

            # jitter escalation on trial factorizations (matches ops/gp.py)
            def diag_ok(jit):
                A = dict(Kn)
                for i2 in range(N):
                    A[(i2, i2)] = Kn[(i2, i2)] + jit
                Lt = _chol_e(A, N)
                ok = None
                for i2 in range(N):
                    d_ = Lt[(i2, i2)]
                    c = jnp.isfinite(d_) & (d_ > 0)
                    ok = c if ok is None else (ok & c)
                return ok

            ok0 = diag_ok(0.0)
            ok1 = diag_ok(1e-4)
            jit_sel = jnp.where(ok0, 0.0, jnp.where(ok1, 1e-4, 1e-2))
            for i2 in range(N):
                Kn[(i2, i2)] = Kn[(i2, i2)] + jit_sel

            L = _chol_e(Kn, N)
            zs = _solve_lower_e(L, r_rows, N)
            alpha = _solve_lower_t_e(L, zs, N)
            W = _lower_inv_e(L, N)
            Kinv = _kinv_e(W, N)

            # loss = -sum_t MLL_t / n_t  (reference loss, GPR_meta_mll.py:113)
            quad_logdet = None
            for i2 in range(N):
                term = zs[i2] * zs[i2] + 2.0 * jnp.log(L[(i2, i2)])
                quad_logdet = term if quad_logdet is None \
                    else quad_logdet + term
            n_eff_t = jnp.where(w_t > 0, 1.0 / jnp.maximum(w_t, 1e-30), 0.0)
            ll_t = -0.5 * w_i * (quad_logdet + n_eff_t * _LOG_2PI)
            loss = -jnp.sum(ll_t, axis=0, keepdims=True)  # [1, 1]

            # ---------------- backward (d(sum_t ll_t)/d·) ----------------
            dmu_rows = []
            dn_acc = None
            for i2 in range(N):
                dmu_rows.append(w_i * alpha[i2] * m_e[i2])
                g_ii = 0.5 * w_i * (alpha[i2] * alpha[i2] - Kinv[(i2, i2)])
                term = g_ii * m_e[i2]
                dn_acc = term if dn_acc is None else dn_acc + term

            dz_rows = []
            dls_acc = None
            dos_acc = None
            for i2 in range(N):
                acc = None
                for j2 in range(N):
                    g_ij = 0.5 * w_i * (alpha[i2] * alpha[j2]
                                        - Kinv[(i2, j2)])
                    dkm = g_ij * m_e[i2] * m_e[j2]                # [T, 1]
                    if j2 <= i2:  # d(os): each unordered pair once
                        c = dkm * Km_e[(i2, j2)]
                        if j2 < i2:  # symmetric pair appears twice in sum
                            c = 2.0 * c
                        dos_acc = c if dos_acc is None else dos_acc + c
                    dd2 = -0.5 * dkm * Km_e[(i2, j2)]
                    term = 2.0 * dd2 * (z_e[i2] - z_e[j2])        # [T, F]
                    acc = term if acc is None else acc + term
                dz_i = 2.0 * acc  # ordered pairs (i,j)+(j,i) double dd2
                dz_rows.append(dz_i)
                c = jnp.sum(dz_i * (-z_e[i2]) / sp_ls, axis=0, keepdims=True)
                dls_acc = c if dls_acc is None else dls_acc + c

            d_nz = (jnp.sum(dn_acc, axis=0, keepdims=True)
                    * _sigmoid(st["nz"]))                         # [1, 1]
            d_ls = dls_acc * _sigmoid(st["ls"])                   # [1, F]
            d_os = (jnp.sum(dos_acc, axis=0, keepdims=True)
                    * _sigmoid(st["os"]) / sp_os)                 # [1, 1]

            DPHI = jnp.concatenate(
                [dz_rows[i2] / sp_ls for i2 in range(N)], axis=0)  # [M, F]
            DMU = jnp.concatenate(dmu_rows, axis=0)                # [M, 1]

            score = {}
            a_last_m = m_acts[-1]
            score["m_wout"] = _mm(ones_m, a_last_m * DMU)          # [1, H]
            score["m_bout"] = _mm(ones_m, DMU)                     # [1, 1]
            hidden_backward(st, "m", m_acts, DMU * st["m_wout"], score)

            a_last_k = k_acts[-1]
            score["k_wout"] = _mm_tn(a_last_k, DPHI)               # [H, F]
            score["k_bout"] = _mm(ones_m, DPHI)                    # [1, F]
            hidden_backward(st, "k", k_acts, _mm_nt(DPHI, st["k_wout"]),
                            score)
            score["ls"], score["os"], score["nz"] = d_ls, d_os, d_nz

            # loss gradient = -score; AdamW with decoupled weight decay
            g = {nm: -score[nm] for nm in names}
            new_st, new_m, new_v = _adamw_update(g, st_l, m_l, v_l, i)
            return new_st, new_m, new_v, loss, loss_sum + loss

        st0 = tuple(r[...] for r in state_refs)
        m0 = tuple(r[...] for r in m_refs)
        v0 = tuple(r[...] for r in v_refs)
        loss0 = jnp.zeros((1, 1), jnp.float32)
        st_f, m_f, v_f, loss_f, loss_sum_f = jax.lax.fori_loop(
            0, n_steps, body, (st0, m0, v0, loss0, loss0))
        for r, val in zip(out_state, st_f):
            r[...] = val
        for r, val in zip(out_m, m_f):
            r[...] = val
        for r, val in zip(out_v, v_f):
            r[...] = val
        out_loss[...] = loss_f
        out_loss_sum[...] = loss_sum_f

    return kernel


# ------------------------------------------------------------ host wrapper


@functools.partial(
    jax.jit,
    static_argnames=("T", "N", "D", "F", "mean_hidden", "kernel_hidden",
                     "noise_floor", "n_steps",
                     "interpret"))
def fused_map_train_packed(packed, m_packed, v_packed, x, y_nm, mask_nm, w_t,
                           step0, *, T, N, D, F, mean_hidden, kernel_hidden,
                           lr, weight_decay, noise_floor, n_steps,
                           counts_pages=None, interpret=False):
    """Run n_steps MAP iterations in one kernel launch on packed state.

    counts_pages [n_steps, Tpad8, 128] (counts in lane 0) switches on the
    count-weighted sampled-task-batch mode."""
    names = state_names(mean_hidden, kernel_hidden)
    counted = counts_pages is not None
    kernel = _make_kernel(
        T=T, N=N, D=D, F=F, mean_hidden=tuple(mean_hidden),
        kernel_hidden=tuple(kernel_hidden),
        noise_floor=noise_floor, n_steps=n_steps, counted=counted)
    state_in = [packed[nm] for nm in names]
    m_in = [m_packed[nm] for nm in names]
    v_in = [v_packed[nm] for nm in names]
    scalars = jnp.stack([jnp.asarray(step0, jnp.float32),
                         jnp.asarray(lr, jnp.float32),
                         jnp.asarray(weight_decay, jnp.float32)]
                        ).reshape(1, 3)
    others = [x, y_nm, mask_nm, w_t, scalars]
    all_in = state_in + m_in + v_in + others
    if counted:
        all_in = all_in + [counts_pages]
    S = len(names)
    out_shapes = ([jax.ShapeDtypeStruct(t.shape, t.dtype)
                   for t in state_in + m_in + v_in]
                  + [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 2)
    t_pad = -(-T // 8) * 8
    scratch = ([pltpu.VMEM((t_pad, 128), jnp.float32),
                pltpu.SemaphoreType.DMA(())] if counted else [])
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * S + 4)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + ([pl.BlockSpec(memory_space=pl.ANY)] if counted else []),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * S + 2),
        input_output_aliases={i: i for i in range(3 * S)},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*all_in)
    new_state = dict(zip(names, outs[:S]))
    new_m = dict(zip(names, outs[S:2 * S]))
    new_v = dict(zip(names, outs[2 * S:3 * S]))
    return (new_state, new_m, new_v, outs[3 * S][0, 0],
            outs[3 * S + 1][0, 0] / n_steps)


class FusedMAPTrainer:
    """Host-side driver: pack state once, run chunks, unpack on demand.

    task_batch_size < T (with base_key) switches on the count-weighted
    sampled-batch mode: per-step task draws are generated host-side with
    the XLA step's exact fold_in + randint discipline and streamed to the
    kernel as count pages, so both paths follow the SAME random
    trajectory (learner analog: algos/pacoh_map.py _weight_by_counts)."""

    MAX_LAUNCH = 512  # bounds the streamed count-page buffer per launch

    def __init__(self, params, X, Y, mask, *, feature_dim, mean_hidden,
                 kernel_hidden, lr, weight_decay, lr_decay=1.0,
                 noise_floor=1e-3, task_batch_size=None, base_key=None,
                 interpret=False):
        import numpy as np

        self.T, self.N, self.D = int(X.shape[0]), int(X.shape[1]), int(X.shape[2])
        self.F = int(feature_dim)
        self.mean_hidden = tuple(int(h) for h in mean_hidden)
        self.kernel_hidden = tuple(int(h) for h in kernel_hidden)
        self.lr, self.weight_decay = float(lr), float(weight_decay)
        self.lr_decay = float(lr_decay)
        self.noise_floor = float(noise_floor)
        self.interpret = interpret
        self.last_loss = float("nan")
        self.avg_loss = float("nan")

        sizes = np.asarray(jnp.sum(mask, axis=-1))
        w = np.where(sizes > 0, 1.0 / np.maximum(sizes, 1.0), 0.0)
        self.w_t = jnp.asarray(w.reshape(self.T, 1), jnp.float32)

        self.packed = pack_state(params, self.mean_hidden, self.kernel_hidden)
        self.m = jax.tree.map(jnp.zeros_like, self.packed)
        self.v = jax.tree.map(jnp.zeros_like, self.packed)

        mh, kh = self.mean_hidden, self.kernel_hidden
        self._unpack3 = jax.jit(lambda p, m, v: (
            unpack_state(p, mh, kh),
            unpack_state(m, mh, kh),
            unpack_state(v, mh, kh),
        ))

        self.x = jnp.transpose(X, (1, 0, 2)).reshape(
            self.N * self.T, self.D).astype(jnp.float32)
        self.y_nm = jnp.transpose(Y, (1, 0)).reshape(
            self.N * self.T, 1).astype(jnp.float32)
        self.mask_nm = jnp.transpose(mask, (1, 0)).reshape(
            self.N * self.T, 1).astype(jnp.float32)

        self.counted = (task_batch_size is not None
                        and int(task_batch_size) != self.T)
        self.base_key = base_key
        if self.counted:
            assert base_key is not None
            b_n, t_n = int(task_batch_size), self.T
            t_pad = -(-t_n // 8) * 8

            @functools.partial(jax.jit, static_argnames=("n_steps",))
            def make_counts(base_key, start_step, n_steps):
                steps = start_step + jnp.arange(n_steps)

                def one(i):
                    key = jax.random.fold_in(base_key, i)
                    idx = jax.random.randint(key, (b_n,), 0, t_n)
                    counts = jnp.sum(
                        jax.nn.one_hot(idx, t_n, dtype=jnp.float32), axis=0)
                    page = jnp.zeros((t_pad, 128), jnp.float32)
                    return jax.lax.dynamic_update_slice(
                        page, counts.reshape(t_n, 1), (0, 0))

                return jax.vmap(one)(steps)

            self._make_counts = make_counts

    def run(self, n_steps, step0):
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
            staircase_launches,
        )

        n_steps, step0 = int(n_steps), int(step0)
        cap = self.MAX_LAUNCH if self.counted else n_steps
        for s, sub in staircase_launches(step0, n_steps, cap, self.lr_decay):
            self._run_one(sub, s)

    def _run_one(self, n_steps, step0):
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
            staircase_lr,
        )

        pages = (self._make_counts(self.base_key, int(step0), int(n_steps))
                 if self.counted else None)
        (self.packed, self.m, self.v, self.last_loss,
         self.avg_loss) = fused_map_train_packed(
            self.packed, self.m, self.v, self.x, self.y_nm, self.mask_nm,
            self.w_t, float(step0), T=self.T, N=self.N, D=self.D, F=self.F,
            mean_hidden=self.mean_hidden, kernel_hidden=self.kernel_hidden,
            lr=staircase_lr(self.lr, self.lr_decay, step0),
            weight_decay=self.weight_decay,
            noise_floor=self.noise_floor, n_steps=int(n_steps),
            counts_pages=pages, interpret=self.interpret)

    def sync(self):
        """(params, adam_mu, adam_nu) pytrees, one dispatch."""
        return self._unpack3(self.packed, self.m, self.v)
