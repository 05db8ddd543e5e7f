"""Pallas TPU kernel: PACOH-VI training in one launch for LARGE N (9-256).

The N<=8 VI mega-kernel (ops/pallas/fused_vi_kernel.py) runs the
per-(sample, task) GP linalg through the entry-wise unrolled window, so
Swissfel-shaped configs (T~5 tasks x N~200 points, reference:
experiments/data_sim.py:380-497) never trained VI fused. This is the
large-N sibling, composed from the same separately-verified sections the
big-N SVGD kernel uses:

  1. per-iteration reparameterization-noise pages streamed HBM->VMEM and
     mapped into the S-lane sample layout (fused_vi_kernel's eps_layout /
     make_lane_sample_ops — identical host-side fold_in/split key
     discipline, so fused and XLA paths follow the SAME random trajectory),
  2. the shared big-N score section (fused_svgd_bign_kernel.
     make_bign_score_section with K = S and want_wql=True): NN/NN forward,
     blocked per-system exact-MLL linalg over the G = S*T systems in
     VMEM-bounded chunks, hand-derived backward, hyper-prior term — plus
     the per-sample weighted-MLL value for the neg-ELBO output,
  3. the closed-form reparameterization gradient reductions
     (make_lane_sample_ops.reduce_pair) and exact optax-Adam on
     (loc, log_scale), as in the small-N VI kernel.

Reference hot loop this owns: meta_learn/GPR_meta_vi.py:216-226 at
Swissfel/Physionet scale.

Fast-path constraints: NN/NN shared hidden width, F=1, diag posterior,
full or count-weighted sampled task batches (uniform sizes), Adam,
9 <= N <= 256, f32.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import (
    bign_scratch_shapes,
    make_bign_score_section,
    svgd_bign_shapes,
)
from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
    _block_sum_mat,
    _mm_nt,
    hyper_prior_loc_scale,
    state_names,
)
from meta_learning_pacoh_tpu.ops.pallas.fused_vi_kernel import (
    FusedVITrainer,
    eps_layout,
    make_lane_prior_quad,
    make_lane_sample_ops,
)

_LOG_2PI = math.log(2.0 * math.pi)


def vi_bign_fits(S, T, N):
    """Same VMEM gate as the big-N SVGD kernel with K = S samples."""
    from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import (
        svgd_bign_fits,
    )

    return svgd_bign_fits(S, T, N)


# ------------------------------------------------------------- kernel body


def _make_kernel(*, S, T, N, Np, D, hidden, wps, bps, mll_const, lp_const,
                 ent_const, n_steps, counted=False, b1=0.9, b2=0.999,
                 eps_adam=1e-8):
    """Kernel factory. Data rows are TASK-major ([T*Np, D], row t*Np + n),
    padded per task to Np (padded rows: x=0, mask=0)."""
    n_hidden = len(hidden)
    names = state_names(n_hidden)
    NS = len(names)
    H = hidden[0]
    prior_ls = hyper_prior_loc_scale(n_hidden, wps, bps)
    layout, r_pad, lanes = eps_layout(hidden, D, S)
    eps_slices = {nm: (off, nr, nl) for nm, off, nr, nl in layout}
    sec_init, sec_score = make_bign_score_section(
        K=S, T=T, N=N, Np=Np, D=D, hidden=hidden, prior_ls=prior_ls,
        want_wql=True)
    build_mats, sample_st, reduce_pair = make_lane_sample_ops(
        S=S, hidden=hidden, layout=layout)
    prior_quad = make_lane_prior_quad(S=S, hidden=hidden, layout=layout,
                                      prior_ls=prior_ls)

    def kernel(*refs):
        loc_refs = refs[:NS]
        lsc_refs = refs[NS:2 * NS]
        mom_refs = refs[2 * NS:6 * NS]  # m_loc, m_lsc, v_loc, v_lsc
        x_ref, y_ref, mask_ref, w_ref = refs[6 * NS:6 * NS + 4]
        eps_hbm = refs[6 * NS + 4]
        scal_ref = refs[6 * NS + 5]
        n_in = 6 * NS + 6 + (1 if counted else 0)
        counts_hbm = refs[6 * NS + 6] if counted else None
        out_refs = refs[n_in:n_in + 6 * NS]
        out_loss = refs[n_in + 6 * NS]
        out_loss_sum = refs[n_in + 6 * NS + 1]
        scr = list(refs[n_in + 6 * NS + 2:])
        eps_scr, dma_sem = scr[0], scr[1]
        off = 2
        if counted:
            counts_scr, dma_sem2 = scr[2], scr[3]
            off = 4
        sec_scr = scr[off:]

        x = x_ref[...]        # [M, D], rows task-major (row t*Np + n)
        y_nm = y_ref[...]     # [M, 1]
        msk = mask_ref[...]   # [M, 1]
        w_t = w_ref[...]      # [T, 1]  pre / n_eff (0 for empty tasks)
        step0 = scal_ref[0, 0]
        lr = scal_ref[0, 1]
        prior_factor = scal_ref[0, 2]

        mats = build_mats()                   # loop-invariant helper mats
        sumL = _block_sum_mat(S, hidden[-1])  # score section's lane reducer
        M = x.shape[0]
        ones_m = jnp.ones((1, M), jnp.float32)
        inv = sec_init(sec_scr, msk, y_nm)

        def _adam(gs, th_l, m_l, v_l, i):
            t_f = step0 + jnp.asarray(i, jnp.float32) + 1.0
            bc1 = 1.0 - jnp.exp(t_f * math.log(b1))
            bc2 = 1.0 - jnp.exp(t_f * math.log(b2))
            new_t, new_m, new_v = [], [], []
            for g, th, m_, v_ in zip(gs, th_l, m_l, v_l):
                m_n = b1 * m_ + (1.0 - b1) * g
                v_n = b2 * v_ + (1.0 - b2) * g * g
                upd = (m_n / bc1) / (jnp.sqrt(v_n / bc2) + eps_adam)
                new_t.append(th - lr * upd)
                new_m.append(m_n)
                new_v.append(v_n)
            return new_t, new_m, new_v

        def body(i, carry):
            loc_l, lsc_l, ml_l, mls_l, vl_l, vls_l, _, loss_sum = carry
            loc = dict(zip(names, loc_l))
            lsc = dict(zip(names, lsc_l))

            # stream this iteration's noise page (HBM -> VMEM)
            dma = pltpu.make_async_copy(eps_hbm.at[i], eps_scr, dma_sem)
            dma.start()
            if counted:
                dma2 = pltpu.make_async_copy(counts_hbm.at[i], counts_scr,
                                             dma_sem2)
                dma2.start()
                dma2.wait()
                c_t = counts_scr[0:T, 0:1]              # [T, 1]
                w_i = jnp.where(c_t > 0, w_t * c_t, 0.0)
            else:
                w_i = w_t
            dma.wait()
            page = eps_scr[...]

            def eps_of(nm):
                off2, nr, nl = eps_slices[nm]
                return page[off2:off2 + nr, :nl]

            # ---- sample: theta_s = loc + exp(log_scale) * eps_s --------
            scale = {nm: jnp.exp(lsc[nm]) for nm in names}
            st, eps_lane = sample_st(loc, scale, eps_of, mats)

            # ---- per-sample particle score (shared big-N section) ------
            score, wql = sec_score(st, x, w_i, sumL, ones_m, prior_factor,
                                   sec_scr, inv)

            # ---- loss: neg-ELBO of this iteration ----------------------
            lp_s = -0.5 * prior_quad(st) + lp_const             # [1, S]
            wmll = -0.5 * (wql + mll_const)                     # [1, S]
            obj = prior_factor * lp_s + wmll
            sum_lsc = None
            for nm in names:
                t_ = jnp.sum(lsc[nm])
                sum_lsc = t_ if sum_lsc is None else sum_lsc + t_
            mean_obj = _mm_nt(obj, mats["ones1s"]) / S          # [1, 1]
            loss = -(mean_obj
                     + prior_factor * (ent_const + sum_lsc))    # [1, 1]

            # ---- reparameterization gradients --------------------------
            g_loc, g_lsc = [], []
            for nm in names:
                red, red_e = reduce_pair(nm, score[nm], eps_of, eps_lane,
                                         mats)
                g_loc.append(-red / S)
                g_lsc.append(-scale[nm] * red_e / S - prior_factor)

            loc_n, ml_n, vl_n = _adam(g_loc, loc_l, ml_l, vl_l, i)
            lsc_n, mls_n, vls_n = _adam(g_lsc, lsc_l, mls_l, vls_l, i)
            return (tuple(loc_n), tuple(lsc_n), tuple(ml_n), tuple(mls_n),
                    tuple(vl_n), tuple(vls_n), loss, loss_sum + loss)

        loc0 = tuple(r[...] for r in loc_refs)
        lsc0 = tuple(r[...] for r in lsc_refs)
        m_loc0 = tuple(r[...] for r in mom_refs[:NS])
        m_lsc0 = tuple(r[...] for r in mom_refs[NS:2 * NS])
        v_loc0 = tuple(r[...] for r in mom_refs[2 * NS:3 * NS])
        v_lsc0 = tuple(r[...] for r in mom_refs[3 * NS:4 * NS])
        zero = jnp.zeros((1, 1), jnp.float32)
        out = jax.lax.fori_loop(
            0, n_steps, body,
            (loc0, lsc0, m_loc0, m_lsc0, v_loc0, v_lsc0, zero, zero))
        flat = (list(out[0]) + list(out[1]) + list(out[2]) + list(out[3])
                + list(out[4]) + list(out[5]))
        for r, val in zip(out_refs, flat):
            r[...] = val
        out_loss[...] = out[6]
        out_loss_sum[...] = out[7]

    return kernel, r_pad, lanes


# ------------------------------------------------------------ host wrapper


@functools.partial(
    jax.jit,
    static_argnames=("S", "T", "N", "Np", "D", "hidden",
                     "wps", "bps", "mll_const", "lp_const", "ent_const",
                     "n_steps", "interpret"))
def fused_vi_bign_train_packed(loc_p, lsc_p, m_loc, m_lsc, v_loc, v_lsc, x,
                               y_nm, mask_nm, w_t, eps_pages, step0, *, S, T,
                               N, Np, D, hidden, lr, prior_factor, wps, bps,
                               mll_const, lp_const, ent_const, n_steps,
                               counts_pages=None, interpret=False):
    """Run n_steps large-N VI iterations in one kernel launch."""
    names = state_names(len(hidden))
    counted = counts_pages is not None
    kernel, r_pad, lanes = _make_kernel(
        S=S, T=T, N=N, Np=Np, D=D, hidden=tuple(hidden), wps=wps, bps=bps,
        mll_const=mll_const, lp_const=lp_const, ent_const=ent_const,
        n_steps=n_steps, counted=counted)
    state_in = ([loc_p[nm] for nm in names] + [lsc_p[nm] for nm in names]
                + [m_loc[nm] for nm in names] + [m_lsc[nm] for nm in names]
                + [v_loc[nm] for nm in names] + [v_lsc[nm] for nm in names])
    scalars = jnp.stack([jnp.asarray(step0, jnp.float32),
                         jnp.asarray(lr, jnp.float32),
                         jnp.asarray(prior_factor, jnp.float32)]
                        ).reshape(1, 3)
    others = [x, y_nm, mask_nm, w_t, eps_pages, scalars]
    all_in = state_in + others
    if counted:
        all_in = all_in + [counts_pages]
    NS = len(names)
    out_shapes = ([jax.ShapeDtypeStruct(t.shape, t.dtype)
                   for t in state_in]
                  + [jax.ShapeDtypeStruct((1, 1), jnp.float32)] * 2)
    scratch = [pltpu.VMEM((r_pad, lanes), jnp.float32),
               pltpu.SemaphoreType.DMA(())]
    if counted:
        scratch += [pltpu.VMEM((-(-T // 8) * 8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())]
    scratch += bign_scratch_shapes(S, T, N, want_wql=True)
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 * NS + 4)
        + [pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + ([pl.BlockSpec(memory_space=pl.ANY)] if counted else []),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (6 * NS + 2),
        input_output_aliases={i: i for i in range(6 * NS)},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*all_in)
    res = []
    for j in range(6):
        res.append(dict(zip(names, outs[j * NS:(j + 1) * NS])))
    return tuple(res) + (outs[6 * NS][0, 0], outs[6 * NS + 1][0, 0] / n_steps)


class FusedVIBigNTrainer(FusedVITrainer):
    """Large-N variant of FusedVITrainer: identical host interface/state
    (packing, eps pages, counted pages, staircase launches); data re-packed
    TASK-major and padded to Np per task (the big-N section's row order)."""

    def __init__(self, hyper_prior, post, X, Y, mask, **kw):
        import numpy as np

        super().__init__(hyper_prior, post, X, Y, mask, **kw)
        _, _, self.Np = svgd_bign_shapes(self.S, self.T, self.N)
        Xp = np.zeros((self.T, self.Np, self.D), np.float32)
        Yp = np.zeros((self.T, self.Np), np.float32)
        Mp = np.zeros((self.T, self.Np), np.float32)
        Xp[:, :self.N] = np.asarray(X, np.float32)
        Yp[:, :self.N] = np.asarray(Y, np.float32)
        Mp[:, :self.N] = np.asarray(mask, np.float32)
        M = self.T * self.Np
        self.x = jnp.asarray(Xp.reshape(M, self.D))
        self.y_nm = jnp.asarray(Yp.reshape(M, 1))
        self.mask_nm = jnp.asarray(Mp.reshape(M, 1))

    def _run_one(self, n_steps, step0):
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
            staircase_lr,
        )

        eps_pages = self._make_eps(self.base_key, int(step0), int(n_steps))
        counts = (self._make_counts(self.base_key, int(step0), int(n_steps))
                  if self.counted else None)
        (self.loc_p, self.lsc_p, self.m_loc, self.m_lsc, self.v_loc,
         self.v_lsc, self.last_loss,
         self.avg_loss) = fused_vi_bign_train_packed(
            self.loc_p, self.lsc_p, self.m_loc, self.m_lsc, self.v_loc,
            self.v_lsc, self.x, self.y_nm, self.mask_nm, self.w_t,
            eps_pages, float(step0), S=self.S, T=self.T, N=self.N,
            Np=self.Np, D=self.D, hidden=self.hidden,
            lr=staircase_lr(self.lr, self.lr_decay, step0),
            prior_factor=self.prior_factor,
            wps=self.wps, bps=self.bps, mll_const=self.mll_const,
            lp_const=self.lp_const, ent_const=self.ent_const,
            n_steps=int(n_steps), counts_pages=counts,
            interpret=self.interpret)
