"""Pallas TPU kernel: an ENTIRE PACOH-VI training run in one kernel launch.

PACOH-VI (reference: meta_learn/GPR_meta_vi.py:216-226) fits a diagonal
Gaussian hyper-posterior q(theta) = N(loc, diag(exp(log_scale))^2) by Adam
on the reparameterized negative ELBO with S samples per iteration. This
kernel runs that whole loop inside one `pl.pallas_call`: per iteration it

  1. streams that iteration's packed standard-normal page eps_i from HBM
     into VMEM (async DMA inside the fori_loop — the one per-step input
     that cannot live VMEM-resident for a 10k-iteration run),
  2. forms the S samples  theta_s = loc + exp(log_scale) * eps_s  directly
     in the fused SVGD kernel's S-lane particle layout (loc/log_scale are
     held in the K=1 packed layout and broadcast to lane blocks with
     stacked-identity matmuls; block-diagonal hidden layers are expanded
     lane-stacked then masked onto the block diagonal),
  3. reuses the shared score section (fused_train_kernel.make_score_section,
     K = S) — NN/NN GP forward, entry-wise [T, S] exact-MLL linalg with
     jitter escalation, hand-derived backward, hyper-prior term — to get
     score_s = d obj_s / d theta_s for every sample lane at once,
  4. reduces the lanes into the closed-form reparameterization gradients
         d/d loc       = -mean_s score_s
         d/d log_scale = -exp(log_scale) * mean_s(score_s * eps_s)
                         - prior_factor          (entropy term, exact)
     with stacked-identity matmuls (the exact adjoints of the broadcasts),
  5. applies an exact optax.adam update to (loc, log_scale).

The reparameterization noise is generated HOST-side per chunk with the
same fold_in/split key discipline as the XLA learner step
(algos/pacoh_vi.py single_step), so the fused path follows the exact same
random trajectory as the XLA path — kernel == closed-form spec
(ops/fused_vi_math.py) == jax.grad learner step, verified in
tests/test_fused_vi.py. Streaming cost: one [R_pad, S*H] f32 page
(~100 KB at the flagship config) per iteration, overlapped trivially
against the ~30 us of compute.

Fast-path constraints (the general XLA path remains for the rest):
mean_module == covar_module == 'NN' with one shared hidden width,
feature_dim == 1, cov_type == 'diag', full task batch, Adam with constant
lr, N <= 8 (the unrolled-linalg window), f32.

The Adam step counter is f32 SMEM — the 2^24-step caveat of
fused_map_kernel.py applies.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
    _bd_mask,
    _block_sum_mat,
    _mm,
    _mm_nt,
    _mm_tn,
    _stack_mat,
    hyper_prior_loc_scale,
    make_score_section,
    state_names,
)

_LOG_2PI = math.log(2.0 * math.pi)


# ------------------------------------------------------------- eps layout


def eps_layout(hidden, d, s):
    """Row layout of one iteration's packed noise page.

    Returns ([(name, row_offset, n_rows, n_lanes)], padded_rows, lanes).
    Wide tensors use all S*H lanes; per-sample scalars (boutcat/ls/nz) use
    the first S lanes. wbd pages are LANE-STACKED [H_in, S*H_out] (sample s
    occupies lane block s), expanded onto the block diagonal in-kernel.
    """
    h = hidden[0]
    lanes = s * h
    rows = []
    off = 0
    for tag in ("m", "k"):
        rows.append((f"{tag}_w1cat", off, d, lanes))
        off += d
        rows.append((f"{tag}_b1cat", off, 1, lanes))
        off += 1
        for i in range(1, len(hidden)):
            rows.append((f"{tag}_wbd{i}", off, hidden[i - 1], s * hidden[i]))
            off += hidden[i - 1]
            rows.append((f"{tag}_bcat{i}", off, 1, s * hidden[i]))
            off += 1
        rows.append((f"{tag}_woutcat", off, 1, s * hidden[-1]))
        off += 1
        rows.append((f"{tag}_boutcat", off, 1, s))
        off += 1
    rows.append(("ls", off, 1, s))
    off += 1
    rows.append(("nz", off, 1, s))
    off += 1
    r_pad = -(-off // 8) * 8
    # the per-iteration HBM->VMEM DMA requires the page's lane dimension
    # aligned to the 128-lane tiling; kernel-side slices stay narrow
    lanes_pad = max(128, -(-lanes // 128) * 128)
    return rows, r_pad, lanes_pad


def pack_eps_page(hyper_prior, eps_flat, hidden):
    """[S, P] standard normals -> one [R_pad, LANES] page (host side)."""
    from meta_learning_pacoh_tpu.ops.fused_svgd_math import (
        particles_to_blocks,
    )

    s = eps_flat.shape[0]
    blocks = particles_to_blocks(hyper_prior, eps_flat)
    d = blocks["mean_ws"][0].shape[1]
    layout, r_pad, lanes = eps_layout(hidden, d, s)
    n_hidden = len(hidden)

    pages = {}
    for tag, ws, bs in (("m", blocks["mean_ws"], blocks["mean_bs"]),
                        ("k", blocks["kernel_ws"], blocks["kernel_bs"])):
        pages[f"{tag}_w1cat"] = jnp.transpose(ws[0], (1, 0, 2)).reshape(
            d, s * hidden[0])
        pages[f"{tag}_b1cat"] = bs[0].reshape(1, s * hidden[0])
        for i in range(1, n_hidden):
            pages[f"{tag}_wbd{i}"] = jnp.transpose(ws[i], (1, 0, 2)).reshape(
                hidden[i - 1], s * hidden[i])
            pages[f"{tag}_bcat{i}"] = bs[i].reshape(1, s * hidden[i])
        pages[f"{tag}_woutcat"] = ws[-1][:, :, 0].reshape(1, s * hidden[-1])
        pages[f"{tag}_boutcat"] = bs[-1].reshape(1, s)
    pages["ls"] = blocks["ls_raw"].reshape(1, s)
    pages["nz"] = blocks["noise_raw"].reshape(1, s)

    page = jnp.zeros((r_pad, lanes), jnp.float32)
    for nm, off, nr, nl in layout:
        page = jax.lax.dynamic_update_slice(
            page, pages[nm].astype(jnp.float32), (off, 0))
    return page


# -------------------------------------------------- lane sampling machinery


def make_lane_sample_ops(*, S, hidden, layout):
    """Reparameterization sampling on the K=1 packed state, shared by the
    fused VI and MLAP kernels.

    Returns (build_mats, sample, reduce_pair):
      - build_mats() -> dict of stacked-identity / block-diag helper
        matrices; call ONCE at kernel-body top so they stay loop-invariant.
      - sample(loc, scale, eps_of, mats) -> (st, eps_lane): maps the K=1
        packed (loc, scale) and the iteration's noise page into the S-lane
        particle layout (theta_s = loc + scale * eps_s).
      - reduce_pair(nm, sc, eps_of, eps_lane, mats) -> (red, red_e): the
        exact adjoints of the broadcasts — sum over the S sample lanes of a
        lane-layout cotangent sc, and of sc * eps (the log_scale chain).
    """
    names = state_names(len(hidden))
    n_hidden = len(hidden)
    H = hidden[0]
    wide = {nm for nm, _, _, nl in layout
            if nl == S * H and "wbd" not in nm}

    def build_mats():
        mats = {"stackH": _stack_mat(S, H),
                "ones1s": jnp.ones((1, S), jnp.float32),
                "ones_s1": jnp.ones((S, 1), jnp.float32)}
        for i in range(1, n_hidden):
            mats[f"bdm{i}"] = _bd_mask(S, hidden[i - 1], hidden[i])
            mats[f"stack_in{i}"] = _stack_mat(S, hidden[i - 1])
            mats[f"stack_out{i}"] = _stack_mat(S, hidden[i])
        return mats

    def sample(loc, scale, eps_of, mats):
        st, eps_lane = {}, {}
        for nm in names:
            if "wbd" in nm:
                i3 = int(nm[-1])
                st_out = mats[f"stack_out{i3}"]
                lane = (_mm_nt(loc[nm], st_out)
                        + _mm_nt(scale[nm], st_out) * eps_of(nm))
                eps_lane[nm] = eps_of(nm)
                st[nm] = (_mm(mats[f"stack_in{i3}"], lane)
                          * mats[f"bdm{i3}"])
            elif nm in wide:
                st[nm] = (_mm_nt(loc[nm], mats["stackH"])
                          + _mm_nt(scale[nm], mats["stackH"]) * eps_of(nm))
            else:
                st[nm] = (loc[nm] * mats["ones1s"]
                          + scale[nm] * mats["ones1s"] * eps_of(nm))
        return st, eps_lane

    def reduce_pair(nm, sc, eps_of, eps_lane, mats):
        if "wbd" in nm:
            i3 = int(nm[-1])
            st_in, st_out = mats[f"stack_in{i3}"], mats[f"stack_out{i3}"]
            red = _mm_tn(st_in, _mm(sc, st_out))
            se_lane = _mm_tn(st_in, sc) * eps_lane[nm]
            red_e = _mm(se_lane, st_out)
        elif nm in wide:
            red = _mm(sc, mats["stackH"])
            red_e = _mm(sc * eps_of(nm), mats["stackH"])
        else:
            # ones-COLUMN dot, not _mm_nt with the ones row: Mosaic lowers
            # the row form to vector.multi_reduction, and a consumer that
            # directly adds a non-constant to `red` (the MLAP kernel's
            # closed-form outer-KL terms) gets folded into the reduction
            # accumulator, which Mosaic rejects.
            red = _mm(sc, mats["ones_s1"])
            red_e = _mm(sc * eps_of(nm), mats["ones_s1"])
        return red, red_e

    return build_mats, sample, reduce_pair


def make_lane_prior_quad(*, S, hidden, layout, prior_ls):
    """sum_p z_p^2 of the S lane-layout samples under the hyper-prior,
    z = (theta - loc) / scale, as [1, S] — the dynamic part of the prior
    log prob (lp_s = -0.5 * quad + lp_const). Shared by the small-N and
    big-N fused VI kernels."""
    names = state_names(len(hidden))
    H = hidden[0]
    wide = {nm for nm, _, _, nl in layout if nl == S * H}

    def prior_quad(st):
        bsumH = _block_sum_mat(S, H)
        qsum = jnp.zeros((1, S), jnp.float32)
        for nm in names:
            p_loc, p_scale = prior_ls[nm]
            z = (st[nm] - p_loc) / p_scale
            sq = z * z
            if "wbd" in nm:
                i3 = int(nm[-1])
                qsum = qsum + _mm(jnp.sum(sq, axis=0, keepdims=True),
                                  _block_sum_mat(S, hidden[i3]))
            elif nm in wide:
                qsum = qsum + _mm(jnp.sum(sq, axis=0, keepdims=True),
                                  bsumH)
            else:
                qsum = qsum + sq
        return qsum

    return prior_quad


# ------------------------------------------------------------- kernel body


def _make_vi_kernel(*, S, T, N, D, hidden, wps, bps,
                    mll_const, lp_const, ent_const, n_steps, counted=False,
                    b1=0.9, b2=0.999, eps_adam=1e-8):
    """S = svi sample count (the lane-block count of the score section).

    counted=True streams a second per-step page of task-draw counts and
    weights per-task contributions by counts_t * w_t (no-gather sampled
    task batches; uniform task sizes keep mll_const a launch constant)."""
    n_hidden = len(hidden)
    M = T * N
    names = state_names(n_hidden)
    NS = len(names)
    H = hidden[0]
    prior_ls = hyper_prior_loc_scale(n_hidden, wps, bps)
    layout, r_pad, lanes = eps_layout(hidden, D, S)
    eps_slices = {nm: (off, nr, nl) for nm, off, nr, nl in layout}
    score_section = make_score_section(
        K=S, T=T, N=N, D=D, hidden=hidden, prior_factor=0.0,
        prior_ls=prior_ls, want_wql=True)
    build_mats, sample_st, reduce_pair = make_lane_sample_ops(
        S=S, hidden=hidden, layout=layout)
    prior_quad = make_lane_prior_quad(S=S, hidden=hidden, layout=layout,
                                      prior_ls=prior_ls)

    # static shapes of the K=1 packed posterior tensors, for iteration
    k1_rows = {}
    for tag in ("m", "k"):
        k1_rows[f"{tag}_w1cat"] = D
        k1_rows[f"{tag}_b1cat"] = 1
        for i in range(1, n_hidden):
            k1_rows[f"{tag}_wbd{i}"] = hidden[i - 1]
            k1_rows[f"{tag}_bcat{i}"] = 1
        k1_rows[f"{tag}_woutcat"] = 1
        k1_rows[f"{tag}_boutcat"] = 1
    k1_rows["ls"] = 1
    k1_rows["nz"] = 1

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
        eps_scr = refs[n_in + 6 * NS + 2]
        dma_sem = refs[n_in + 6 * NS + 3]
        if counted:
            counts_scr = refs[n_in + 6 * NS + 4]
            dma_sem2 = refs[n_in + 6 * NS + 5]

        x = x_ref[...]        # [M, D], rows n-major (row n*T + t)
        y_nm = y_ref[...]     # [M, 1]
        msk = mask_ref[...]   # [M, 1]
        w_t = w_ref[...]      # [T, 1]  pre / n_eff (0 for empty tasks)
        # runtime scalars (SMEM): lr and prior_factor are TRACED so lr /
        # prior-factor sweeps share ONE compiled kernel per shape config
        step0 = scal_ref[0, 0]
        lr = scal_ref[0, 1]
        prior_factor = scal_ref[0, 2]

        mats = build_mats()                   # loop-invariant helper mats
        bsumH = _block_sum_mat(S, H)          # [S*H, S]
        sumL = bsumH                          # score section's lane reducer
        ones_m = jnp.ones((1, M), jnp.float32)

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
                # this step's task-draw counts (no-gather sampled batches;
                # same pattern as fused_map_kernel / fused_train_kernel)
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
                off, nr, nl = eps_slices[nm]
                return page[off:off + nr, :nl]

            # ---- sample: theta_s = loc + exp(log_scale) * eps_s --------
            scale = {nm: jnp.exp(lsc[nm]) for nm in names}
            st, eps_lane = sample_st(loc, scale, eps_of, mats)

            # ---- per-sample particle score (shared section, K = S) -----
            score, wql = score_section(st, x, y_nm, msk, w_i, sumL, ones_m,
                                       pf=prior_factor)

            # ---- loss: neg-ELBO of this iteration ----------------------
            # prior log prob per sample: -(1/2) sum_p z^2 + static const
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
    static_argnames=("S", "T", "N", "D", "hidden",
                     "wps", "bps", "mll_const", "lp_const", "ent_const",
                     "n_steps", "interpret"))
def fused_vi_train_packed(loc_p, lsc_p, m_loc, m_lsc, v_loc, v_lsc, x, y_nm,
                          mask_nm, w_t, eps_pages, step0, *, S, T, N, D,
                          hidden, lr, prior_factor, wps, bps, mll_const,
                          lp_const, ent_const, n_steps, counts_pages=None,
                          interpret=False):
    """Run n_steps VI iterations in one kernel launch on packed state.

    counts_pages [n_steps, Tpad8, 128] (counts in lane 0) switches on the
    count-weighted sampled-task-batch mode."""
    names = state_names(len(hidden))
    counted = counts_pages is not None
    kernel, r_pad, lanes = _make_vi_kernel(
        S=S, T=T, N=N, D=D, hidden=tuple(hidden),
        wps=wps, bps=bps, mll_const=mll_const,
        lp_const=lp_const, ent_const=ent_const, n_steps=n_steps,
        counted=counted)
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
    t_pad = -(-T // 8) * 8
    scratch = [pltpu.VMEM((r_pad, lanes), jnp.float32),
               pltpu.SemaphoreType.DMA(())]
    if counted:
        scratch += [pltpu.VMEM((t_pad, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())]
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
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*all_in)
    res = []
    for j in range(6):
        res.append(dict(zip(names, outs[j * NS:(j + 1) * NS])))
    return tuple(res) + (outs[6 * NS][0, 0], outs[6 * NS + 1][0, 0] / n_steps)


class FusedVITrainer:
    """Host-side driver: pack posterior once, run chunks, unpack on demand.

    The reparameterization noise for each chunk is generated host-side with
    the XLA learner's exact key discipline (fold_in(base_key, step) ->
    split -> k_sample -> normal([S, P])) and packed into per-iteration
    pages streamed by the kernel, so fused and XLA runs follow the same
    random trajectory.
    """

    def __init__(self, hyper_prior, post, X, Y, mask, *, hidden, lr,
                 prior_factor, weight_prior_std, bias_prior_std,
                 svi_batch_size, base_key, lr_decay=1.0,
                 task_batch_size=None, interpret=False):
        import numpy as np

        from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
            pack_state,
        )

        self.hp = hyper_prior
        self.S = int(svi_batch_size)
        self.T, self.N, self.D = (int(X.shape[0]), int(X.shape[1]),
                                  int(X.shape[2]))
        self.hidden = tuple(int(h) for h in hidden)
        self.lr, self.prior_factor = float(lr), float(prior_factor)
        self.lr_decay = float(lr_decay)
        self.wps, self.bps = float(weight_prior_std), float(bias_prior_std)
        self.base_key = base_key
        self.interpret = interpret
        self.last_loss = float("nan")
        self.avg_loss = float("nan")

        self.counted = (task_batch_size is not None
                        and int(task_batch_size) != self.T)

        sizes = np.asarray(jnp.sum(mask, axis=-1))
        if self.counted:
            # sampled-multiset harmonic mean == n only for uniform sizes
            # (the learner gate enforces this); the count-weighted MLL sum
            # then keeps mll_const a per-launch constant: sum_t c_t w n
            # = pre * batch_n
            assert np.all(sizes == sizes[0]), (
                "counted fused batching requires uniform task sizes")
            harmonic = float(sizes[0])
            batch_n = int(task_batch_size)
        else:
            harmonic = 1.0 / np.mean(1.0 / sizes)
            batch_n = self.T
        pre = float(harmonic / (harmonic + batch_n))
        w = np.where(sizes > 0, pre / np.maximum(sizes, 1.0), 0.0)
        self.w_t = jnp.asarray(w.reshape(self.T, 1), jnp.float32)
        # static part of the count-weighted MLL sum (see counted note above)
        self.mll_const = (float(pre * batch_n * _LOG_2PI) if self.counted
                          else float(np.sum((sizes > 0) * pre) * _LOG_2PI))

        if self.counted:
            b_n, t_n = int(task_batch_size), self.T
            t_pad = -(-t_n // 8) * 8

            @functools.partial(jax.jit, static_argnames=("n_steps",))
            def make_counts(base_key, start_step, n_steps):
                steps = start_step + jnp.arange(n_steps)

                def one(i):
                    key = jax.random.fold_in(base_key, i)
                    k_task, _ = jax.random.split(key)  # XLA step discipline
                    idx = jax.random.randint(k_task, (b_n,), 0, t_n)
                    counts = jnp.sum(
                        jax.nn.one_hot(idx, t_n, dtype=jnp.float32), axis=0)
                    page = jnp.zeros((t_pad, 128), jnp.float32)
                    return jax.lax.dynamic_update_slice(
                        page, counts.reshape(t_n, 1), (0, 0))

                return jax.vmap(one)(steps)

            self._make_counts = make_counts

        # static prior-log-prob and entropy constants
        p_dim = int(hyper_prior.dim)
        n_w = sum(int(np.prod(s)) for s in self._weight_shapes())
        n_b = sum(int(np.prod(s)) for s in self._bias_shapes())
        # remaining params (ls F=1, nz, prior scale 1.0) add -log(1) = 0
        self.lp_const = float(-(n_w * math.log(self.wps)
                                + n_b * math.log(self.bps))
                              - 0.5 * p_dim * _LOG_2PI)
        self.ent_const = float(0.5 * p_dim * (1.0 + _LOG_2PI))
        self.p_dim = p_dim

        self.loc_p = pack_state(hyper_prior, post["loc"][None, :],
                                self.hidden)
        self.lsc_p = pack_state(hyper_prior, post["log_scale"][None, :],
                                self.hidden)
        self.m_loc = jax.tree.map(jnp.zeros_like, self.loc_p)
        self.m_lsc = jax.tree.map(jnp.zeros_like, self.lsc_p)
        self.v_loc = jax.tree.map(jnp.zeros_like, self.loc_p)
        self.v_lsc = jax.tree.map(jnp.zeros_like, self.lsc_p)

        hp, hidden_t = hyper_prior, self.hidden

        def unpack6(a, b, c, d, e, f):
            from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
                unpack_state,
            )

            return tuple(unpack_state(hp, t, hidden_t, 1)[0]
                         for t in (a, b, c, d, e, f))

        self._unpack6 = jax.jit(unpack6)

        s_n, p_n = self.S, p_dim

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def make_eps(base_key, start_step, n_steps):
            steps = start_step + jnp.arange(n_steps)

            def one(i):
                key = jax.random.fold_in(base_key, i)
                _, k_sample = jax.random.split(key)
                eps = jax.random.normal(k_sample, (s_n, p_n), jnp.float32)
                return pack_eps_page(hp, eps, hidden_t)

            return jax.vmap(one)(steps)

        self._make_eps = make_eps

        self.x = jnp.transpose(X, (1, 0, 2)).reshape(
            self.N * self.T, self.D).astype(jnp.float32)
        self.y_nm = jnp.transpose(Y, (1, 0)).reshape(
            self.N * self.T, 1).astype(jnp.float32)
        self.mask_nm = jnp.transpose(mask, (1, 0)).reshape(
            self.N * self.T, 1).astype(jnp.float32)

    def _weight_shapes(self):
        h = self.hidden
        shapes = [(self.D, h[0])]
        shapes += [(h[i - 1], h[i]) for i in range(1, len(h))]
        shapes += [(h[-1], 1)]
        return shapes * 2  # mean + kernel nets

    def _bias_shapes(self):
        h = self.hidden
        return ([(hh,) for hh in h] + [(1,)]) * 2

    # max iterations per kernel launch: bounds the streamed noise buffer
    # (512 pages ~ 60 MB HBM at the flagship config) and keeps the
    # host-side eps generation overlapped with the previous launch
    MAX_LAUNCH = 512

    def run(self, n_steps, step0):
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
            staircase_launches,
        )

        for s, sub in staircase_launches(step0, n_steps, self.MAX_LAUNCH,
                                         self.lr_decay):
            self._run_one(sub, s)

    def _run_one(self, n_steps, step0):
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
            staircase_lr,
        )

        eps_pages = self._make_eps(self.base_key, int(step0), int(n_steps))
        counts = (self._make_counts(self.base_key, int(step0), int(n_steps))
                  if self.counted else None)
        (self.loc_p, self.lsc_p, self.m_loc, self.m_lsc, self.v_loc,
         self.v_lsc, self.last_loss, self.avg_loss) = fused_vi_train_packed(
            self.loc_p, self.lsc_p, self.m_loc, self.m_lsc, self.v_loc,
            self.v_lsc, self.x, self.y_nm, self.mask_nm, self.w_t,
            eps_pages, float(step0), S=self.S, T=self.T, N=self.N, D=self.D,
            hidden=self.hidden,
            lr=staircase_lr(self.lr, self.lr_decay, step0),
            prior_factor=self.prior_factor,
            wps=self.wps, bps=self.bps, mll_const=self.mll_const,
            lp_const=self.lp_const, ent_const=self.ent_const,
            n_steps=int(n_steps), counts_pages=counts,
            interpret=self.interpret)

    def sync(self):
        """(post, m, v): post = {'loc','log_scale'}, m/v same structure."""
        loc, lsc, ml, mls, vl, vls = self._unpack6(
            self.loc_p, self.lsc_p, self.m_loc, self.m_lsc, self.v_loc,
            self.v_lsc)
        post = {"loc": loc, "log_scale": lsc}
        m = {"loc": ml, "log_scale": mls}
        v = {"loc": vl, "log_scale": vls}
        return post, m, v
