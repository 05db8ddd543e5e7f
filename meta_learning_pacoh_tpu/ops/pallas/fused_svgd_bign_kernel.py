"""Pallas TPU kernel: PACOH-SVGD training in one launch for LARGE N (9-256).

The N<=8 SVGD mega-kernel (ops/pallas/fused_train_kernel.py) unrolls the
per-(particle, task) GP linalg entry-wise, which caps it at the tiny-N
window — so Swissfel-shaped configs (T~5 tasks x N~200 points, reference:
experiments/data_sim.py:380-497) never trained the FLAGSHIP algorithm
fused (round-3 VERDICT weak #1, "SVGD next"). This kernel is the large-N
sibling, composed from three existing, separately-verified sections:

  1. the K-lane packed MLP forward/backward (fused_train_kernel.make_net_fns
     — one [M, K*H] matmul chain covers all K particles at once),
  2. the blocked per-system exact-MLL linalg (blocked_mll_kernel helpers:
     factor_escalated / zsubst_blocked / assemble_w_inv), run over the
     G = K*T independent [Np, Np] systems in VMEM-bounded chunks of 8
     (the batch-major small-G regime) inside a fori_loop,
  3. the Stein transport + median-heuristic bandwidth
     (fused_train_kernel.make_transport_section) and exact optax-Adam.

Per-iteration dataflow (system order g = k*T + t, so [K, M] <-> [G, Np]
reshapes are row-major views):

  mu, phi = nets(x)                 # [M, K], M = T*Np task-major rows
  Z = (phi/ls)^T  as [G, Np];  R = ((y - mu) * mask)^T  as [G, Np]
  for each chunk of 8 systems:      # fori_loop, scratch-resident
      Kn = exp(-0.5 (z_i - z_j)^2) m_i m_j + diag  -> blocked factor (L, Wd)
      z_sub = L^{-1} r;  W = L^{-1};  Kinv = W^T W; alpha = W^T z_sub
      score_K = 0.5 w (alpha alpha^T - Kinv)
      dz_g = 4 (rowsum(dd2) z - dd2 z), dd2 = -0.5 dKm Km   (accumulated)
  DPHI = (dz as [M, K]) / ls;  DMU = (w alpha m as [M, K])
  score = net_backward(DPHI, DMU) + ls/nz chains + prior_factor * d hyperprior
  theta += Adam(-transport(score))

Reference hot loop this owns: meta_learn/GPR_meta_svgd.py:104-131 ->
svgd.py:12-28 at Swissfel/Physionet scale.

Fast-path constraints: NN/NN shared hidden width, F=1, full or
count-weighted sampled task batches (uniform sizes), RBF median-heuristic,
Adam, 9 <= N <= 256 (VMEM: ~10 live [8, Np, Np] chunk tensors), f32.
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
    _bmm,
    _diag3,
    assemble_w_inv,
    extract_border_z,
    factor_escalated,
    logdet_blocked,
    make_border_row,
    zsubst_blocked,
)

# Pinned panel size for the mega-kernels, independent of the
# standalone kernel's sweepable blocked_mll_kernel._NB: the
# factorization helpers infer the panel size from the Wd scratch's
# last dim. 64 measured best here — NB=32 pads N=200 to 224, a
# ragged 1.75-lane-tile dim that slows the mega-kernel's big MXU
# sections ~45% (round-5 faceoff) and breaks a Mosaic shape cast
# in the SVGD section, while the standalone kernel (VPU-latency
# bound) prefers 32.
_NBF = 64

from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
    FusedSVGDTrainer,
    _block_sum_mat,
    _same_pos_mask,
    _sigmoid,
    _softplus,
    _stack_mat,
    hyper_prior_loc_scale,
    make_net_fns,
    make_transport_section,
    state_names,
)

import os as _os

# systems per factorization chunk. 16 (lane-major leaf regime) measured
# 7% faster than 8 (batch-major) at G=50/N=200 on v5e; 32 fails to compile
# (tools/bign_gc_sweep.py). PACOH_TPU_BIGN_GC overrides for sweeps.
_GC = int(_os.environ.get("PACOH_TPU_BIGN_GC", "16"))


def svgd_bign_shapes(K, T, N):
    """(G, Gp, Np): system count K*T, its chunk-padded count, padded N."""
    np_ = max(_NBF, -(-N // _NBF) * _NBF)
    g = K * T
    return g, -(-g // _GC) * _GC, np_


def svgd_bign_fits(K, T, N):
    """Feasibility gate. VMEM: the chunk working set is ~10 live
    [8, Np, Np] f32 tensors (scratch + factorization/backward values), so
    Np caps at 256; the [Gp, Np] accumulators are negligible. Np floor 128
    on real TPUs: the [K, M] -> [G, Np] system views are lane-dim splits
    Mosaic only lowers for full-lane-tile (>=128) targets — at Np=64 the
    kernel fails to compile on hardware (round-5 N=64 faceoff); interpret
    mode has no lane tiles, so CPU tests can still exercise small shapes.

    Feasible is not the same as PROFITABLE — see svgd_bign_wins for the
    measured dispatch policy the learners consult."""
    from meta_learning_pacoh_tpu import config

    _, gp_, np_ = svgd_bign_shapes(K, T, N)
    np_ok = np_ >= 128 or config.pallas_interpret()
    return (9 <= N and np_ok and np_ <= 256
            and gp_ * np_ * 4 * 8 <= 2**24)


def svgd_bign_wins():
    """Measured dispatch policy (v5e, round-5 in-process faceoffs,
    tools/bign_faceoff.py, T=5, K/S=10): the SVGD/VI big-N mega-kernels
    LOSE to the scan-fused XLA step with blocked Pallas linalg across
    their whole window — svgd 0.63x at N=128 / 0.98x at N=200, vi 0.71x /
    0.99x (the per-iteration _GC=16-chunked serial factorization loop
    never amortizes; _GC=32 exceeds VMEM). MAP's big-N mega-kernel WINS
    (1.10x / 1.26x) and is unaffected by this policy. Default: off;
    PACOH_TPU_FORCE_BIGN_FUSED=1 forces the fused path (used by the
    interpret-mode parity tests and for re-measuring on new hardware)."""
    return _os.environ.get("PACOH_TPU_FORCE_BIGN_FUSED", "") == "1"


# ------------------------------------------------- shared big-N score section


def bign_scratch_shapes(K, T, N, *, want_wql=False):
    """Scratch list for make_bign_score_section (order matches its `scr`)."""
    _, gp_, np_ = svgd_bign_shapes(K, T, N)
    base = [
        pltpu.VMEM((_GC, np_, np_), jnp.float32),   # kn (then W)
        pltpu.VMEM((_GC, np_, np_), jnp.float32),   # L (in-place work)
        pltpu.VMEM((_GC, np_, _NBF), jnp.float32),   # Wd
        pltpu.VMEM((gp_, np_), jnp.float32),        # Z
        pltpu.VMEM((gp_, np_), jnp.float32),        # R
        pltpu.VMEM((gp_, np_), jnp.float32),        # mask
        pltpu.VMEM((gp_, np_), jnp.float32),        # dz accumulator
        pltpu.VMEM((gp_, np_), jnp.float32),        # dmu accumulator
        pltpu.VMEM((gp_, 128), jnp.float32),        # per-system w
        pltpu.VMEM((gp_, 128), jnp.float32),        # per-system diag add
        pltpu.VMEM((gp_, 128), jnp.float32),        # per-system dn acc
        pltpu.VMEM((gp_, 128), jnp.float32),        # per-system dls acc
    ]
    if want_wql:
        base.append(pltpu.VMEM((gp_, 128), jnp.float32))  # per-system wql
    return base


def make_bign_score_section(*, K, T, N, Np, D, hidden, prior_ls,
                            want_wql=False):
    """Per-iteration K-lane particle score at LARGE N — the blocked-linalg
    sibling of fused_train_kernel.make_score_section, shared by the big-N
    SVGD and VI kernels (K = particles / reparameterized samples).

    Returns (init_fn, score_fn):
      - init_fn(scr, msk, y_nm) -> inv: zero the [Gp, *] accumulators ONCE
        (padded systems [G:Gp) keep mask rows 0, so Kn = I and w = 0 — they
        contribute exactly nothing) and build the loop-invariant system
        views. Call at kernel-body top.
      - score_fn(st, x, w_i, sumL, ones_m, pf, scr, inv) -> (score, wql):
        NN/NN forward, [G = K*T] blocked per-system exact-MLL linalg in
        VMEM-bounded chunks of 8, hand-derived backward, hyper-prior term.
        `wql` (only when want_wql) is the [1, K] per-lane
        sum_t w_t * (quad_t + logdet_t), as in make_score_section.
    """
    M = T * Np
    G, Gp, _ = svgd_bign_shapes(K, T, N)
    n_chunks = Gp // _GC
    net_forward, net_backward = make_net_fns(K=K, D=D, hidden=hidden)
    names = state_names(len(hidden))

    def init_fn(scr, msk, y_nm):
        rows_n = jax.lax.broadcasted_iota(jnp.int32, (1, Np, Np), 1)
        cols_n = jax.lax.broadcasted_iota(jnp.int32, (1, Np, Np), 2)
        eye = jnp.where(rows_n == cols_n, 1.0, 0.0)   # [1, Np, Np]
        # [K, M] broadcasts of the task-shared rows, as [G, Np] views
        m_sys = jnp.broadcast_to(jnp.transpose(msk), (K, M)).reshape(G, Np)
        y_sys = jnp.broadcast_to(jnp.transpose(y_nm), (K, M)).reshape(G, Np)
        for ref in scr[3:13 if want_wql else 12]:
            ref[...] = jnp.zeros(ref.shape, jnp.float32)
        m_sc = scr[5]
        m_sc[0:G, :] = m_sys
        return m_sys, y_sys, eye

    def score_fn(st, x, w_i, sumL, ones_m, pf, scr, inv):
        kn_scr, l_scr, wd_scr = scr[:3]
        (z_sc, r_sc, m_sc, dz_acc, dmu_acc, w_sc, dv_sc, dn_sc,
         dls_sc) = scr[3:12]
        wql_sc = scr[12] if want_wql else None
        m_sys, y_sys, eye = inv

        # ---------------- forward (all K particles at once) ----------
        mu, m_acts = net_forward(st, "m", x, sumL)   # [M, K]
        phi, k_acts = net_forward(st, "k", x, sumL)  # [M, K]
        sp_ls = _softplus(st["ls"])   # [1, K]
        sp_nz = _softplus(st["nz"])   # [1, K]

        # [G, Np] system views (g = k*T + t: [K, M] -> [G, Np] is a
        # row-major reshape; one [M, K] -> [K, M] transpose per tensor)
        z_sc[0:G, :] = jnp.transpose(phi / sp_ls).reshape(G, Np)
        r_sc[0:G, :] = (y_sys - jnp.transpose(mu).reshape(G, Np)) * m_sys
        # per-system scalars, lane-broadcast. Mosaic only supports
        # reshapes that split/merge LEADING dims (lane dim unchanged),
        # so [T,1]/[K,1] expand through a [K, T, 1] broadcast instead
        # of a [K, T] -> [G, 1] lane-collapsing reshape.
        w_g = jnp.broadcast_to(w_i.reshape(1, T, 1),
                               (K, T, 1)).reshape(G, 1)
        dv_g = jnp.broadcast_to(
            jnp.transpose(sp_nz).reshape(K, 1, 1) + 1e-6,
            (K, T, 1)).reshape(G, 1)
        w_sc[0:G, :] = jnp.broadcast_to(w_g, (G, 128))
        dv_sc[0:G, :] = jnp.broadcast_to(dv_g, (G, 128))

        # ------------- per-chunk blocked MLL score (fori, scratch) ----
        def chunk(c, _):
            o = c * _GC
            zc = z_sc[pl.ds(o, _GC), :]              # [8, Np]
            mc = m_sc[pl.ds(o, _GC), :]
            zc3 = zc.reshape(_GC, Np, 1)
            mc3 = mc.reshape(_GC, Np, 1)
            m_row = jnp.swapaxes(mc3, 1, 2)
            m2 = mc3 * m_row
            dvec = dv_sc[pl.ds(o, _GC), 0:1].reshape(_GC, 1, 1)
            wc = w_sc[pl.ds(o, _GC), 0:1].reshape(_GC, 1, 1)

            d2 = (zc3 - jnp.swapaxes(zc3, 1, 2)) ** 2  # [8, Np, Np]
            Km = jnp.exp(-0.5 * d2)
            eye_real = eye * mc3
            diag_m = eye * (mc3 * dvec + (1.0 - mc3))
            kn_scr[...] = Km * m2 + diag_m

            r_row = r_sc[pl.ds(o, _GC), :].reshape(_GC, 1, Np)
            if N < Np:
                # bordered system: z = L^{-1} r rides the panel solves that
                # already process the padding rows (see blocked_mll_kernel.
                # factor_panels) — no serialized substitution pass. NOTE:
                # ragged tasks have mask rows n_task..N-1 zeroed, but r is
                # zero there too, so borrowing GLOBAL row N stays exact.
                border = (N, make_border_row(r_row, N))
                factor_escalated(l_scr, wd_scr,
                                 lambda: kn_scr[...], eye_real,
                                 border=border)
                z_sub = extract_border_z(l_scr, wd_scr, N)   # [8, 1, Np]
            else:
                factor_escalated(l_scr, wd_scr,
                                 lambda: kn_scr[...], eye_real)
                z_sub = zsubst_blocked(l_scr, wd_scr, r_row)  # [8, 1, Np]
            assemble_w_inv(l_scr, wd_scr, kn_scr)
            W = kn_scr[...]
            alpha_row = _bmm(z_sub, W)                     # [8, 1, Np]
            Kinv = jnp.einsum("gkm,gkn->gmn", W, W,
                              preferred_element_type=jnp.float32)
            outer = jnp.swapaxes(alpha_row, 1, 2) * alpha_row
            score_K = 0.5 * wc * (outer - Kinv)

            dn_c = jnp.sum(_diag3(score_K * mc3), axis=1,
                           keepdims=True)                  # [8, 1]
            dKm = score_K * m2
            dd2 = jnp.where(d2 > 0, -0.5 * dKm * Km, 0.0)
            rs = jnp.sum(dd2, axis=2, keepdims=True)       # [8, Np, 1]
            dz_c = (4.0 * (rs * zc3 - _bmm(dd2, zc3))
                    ).reshape(_GC, Np)                     # [8, Np]
            dls_c = jnp.sum(dz_c * (-zc), axis=1,
                            keepdims=True)                 # [8, 1]
            dmu_c = (wc * jnp.swapaxes(alpha_row, 1, 2) * mc3
                     ).reshape(_GC, Np)

            dz_acc[pl.ds(o, _GC), :] = dz_c
            dmu_acc[pl.ds(o, _GC), :] = dmu_c
            dn_sc[pl.ds(o, _GC), :] = jnp.broadcast_to(dn_c, (_GC, 128))
            dls_sc[pl.ds(o, _GC), :] = jnp.broadcast_to(dls_c,
                                                        (_GC, 128))
            if want_wql:
                # dynamic part of the per-system weighted MLL value:
                # w * (|L^{-1} r|^2 + 2 sum log diag L). Padded rows have
                # diag 1 (log 0) and r = 0 — they contribute nothing.
                quad_c = jnp.sum(z_sub * z_sub, axis=2)    # [8, 1]
                ld_c = logdet_blocked(l_scr)[:, :, 0]      # [8, 1]
                wql_c = wc[:, :, 0] * (quad_c + ld_c)
                wql_sc[pl.ds(o, _GC), :] = jnp.broadcast_to(wql_c,
                                                            (_GC, 128))
            return 0

        jax.lax.fori_loop(0, n_chunks, chunk, 0)

        # ------------- gather per-particle gradients ------------------
        DPHI = (jnp.transpose(dz_acc[0:G, :].reshape(K, M))
                / sp_ls)                                   # [M, K]
        DMU = jnp.transpose(dmu_acc[0:G, :].reshape(K, M))  # [M, K]
        dn_k = jnp.sum(dn_sc[0:G, 0:1].reshape(K, T, 1),
                       axis=1)                               # [K, 1]
        dls_k = jnp.sum(dls_sc[0:G, 0:1].reshape(K, T, 1), axis=1)

        score = {}
        score.update(net_backward(st, "m", m_acts, DMU, x, sumL, ones_m))
        score.update(net_backward(st, "k", k_acts, DPHI, x, sumL, ones_m))
        score["ls"] = (jnp.transpose(dls_k) / sp_ls
                       * _sigmoid(st["ls"]))                # [1, K]
        score["nz"] = jnp.transpose(dn_k) * _sigmoid(st["nz"])

        # hyper-prior term (generalized Bayes, prior_factor-tempered)
        for nm in names:
            loc, scale = prior_ls[nm]
            score[nm] = score[nm] + pf * (
                -(st[nm] - loc) / (scale * scale))

        wql = None
        if want_wql:
            wql = jnp.transpose(
                jnp.sum(wql_sc[0:G, 0:1].reshape(K, T, 1), axis=1))  # [1, K]
        return score, wql

    return init_fn, score_fn


# ------------------------------------------------------------- kernel body


def _make_kernel(*, K, T, N, Np, D, hidden, wps, bps, n_steps,
                 counted=False, b1=0.9, b2=0.999, eps=1e-8):
    """Kernel factory. Data rows are TASK-major ([T*Np, D], row t*Np + n),
    padded per task to Np (padded rows: x=0, mask=0)."""
    n_hidden = len(hidden)
    names = state_names(n_hidden)
    S = len(names)
    H0, HL = hidden[0], hidden[-1]
    prior_ls = hyper_prior_loc_scale(n_hidden, wps, bps)
    sec_init, sec_score = make_bign_score_section(
        K=K, T=T, N=N, Np=Np, D=D, hidden=hidden, prior_ls=prior_ls)
    transport_section = make_transport_section(K=K, hidden=hidden)

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
        scr = list(refs[n_in + 3 * S:])
        if counted:
            counts_scr, dma_sem = scr[12], scr[13]

        x = x_ref[...]        # [M, D], rows task-major (row t*Np + n)
        y_nm = y_ref[...]     # [M, 1]
        msk = mask_ref[...]   # [M, 1]
        w_t = w_ref[...]      # [T, 1]  pre / n_eff (0 for empty tasks)
        step0 = scal_ref[0, 0]
        lr = scal_ref[0, 1]
        prior_factor = scal_ref[0, 2]

        # loop-invariant helpers
        sum0 = _block_sum_mat(K, H0)
        sumL = _block_sum_mat(K, HL)
        stackL = {h: _stack_mat(K, h) for h in set(hidden[1:] or [HL])}
        same0 = _same_pos_mask(K, H0)
        M = x.shape[0]
        ones_m = jnp.ones((1, M), jnp.float32)
        inv = sec_init(scr, msk, y_nm)

        def _adam_update(phi_t, st_l, m_l, v_l, i):
            t_f = step0 + jnp.asarray(i, jnp.float32) + 1.0
            bc1 = 1.0 - jnp.exp(t_f * math.log(b1))
            bc2 = 1.0 - jnp.exp(t_f * math.log(b2))
            new_st, new_m, new_v = [], [], []
            for nm, th, m_, v_ in zip(names, st_l, m_l, v_l):
                g = -phi_t[nm]
                m_n = b1 * m_ + (1.0 - b1) * g
                v_n = b2 * v_ + (1.0 - b2) * g * g
                upd = (m_n / bc1) / (jnp.sqrt(v_n / bc2) + eps)
                new_st.append(th - lr * upd)
                new_m.append(m_n)
                new_v.append(v_n)
            return (tuple(new_st), tuple(new_m), tuple(new_v))

        def body(i, carry):
            st_l, m_l, v_l = carry
            st = dict(zip(names, st_l))

            if counted:
                dma = pltpu.make_async_copy(counts_hbm.at[i], counts_scr,
                                            dma_sem)
                dma.start()
                dma.wait()
                c_t = counts_scr[0:T, 0:1]              # [T, 1]
                w_i = jnp.where(c_t > 0, w_t * c_t, 0.0)
            else:
                w_i = w_t

            score, _ = sec_score(st, x, w_i, sumL, ones_m,
                                 prior_factor, scr, inv)

            phi_t = transport_section(st, score, sum0, same0, stackL)
            return _adam_update(phi_t, st_l, m_l, v_l, i)

        st0 = tuple(r[...] for r in state_refs)
        m0 = tuple(r[...] for r in m_refs)
        v0 = tuple(r[...] for r in v_refs)
        st_f, m_f, v_f = jax.lax.fori_loop(0, n_steps, body, (st0, m0, v0))
        for r, val in zip(out_state, st_f):
            r[...] = val
        for r, val in zip(out_m, m_f):
            r[...] = val
        for r, val in zip(out_v, v_f):
            r[...] = val

    return kernel


# ------------------------------------------------------------ host wrapper


@functools.partial(
    jax.jit,
    static_argnames=("K", "T", "N", "Np", "D", "hidden", "wps", "bps",
                     "n_steps", "interpret"))
def fused_svgd_bign_train_packed(packed, m_packed, v_packed, x, y_nm,
                                 mask_nm, w_t, step0, *, K, T, N, Np, D,
                                 hidden, lr, prior_factor, wps, bps, n_steps,
                                 counts_pages=None, interpret=False):
    """Run n_steps large-N SVGD iterations in one kernel launch."""
    names = state_names(len(hidden))
    counted = counts_pages is not None
    kernel = _make_kernel(K=K, T=T, N=N, Np=Np, D=D, hidden=tuple(hidden),
                          wps=wps, bps=bps, n_steps=n_steps, counted=counted)
    state_in = [packed[nm] for nm in names]
    m_in = [m_packed[nm] for nm in names]
    v_in = [v_packed[nm] for nm in names]
    scalars = jnp.stack([jnp.asarray(step0, jnp.float32),
                         jnp.asarray(lr, jnp.float32),
                         jnp.asarray(prior_factor, jnp.float32)]
                        ).reshape(1, 3)
    others = [x, y_nm, mask_nm, w_t, scalars]
    all_in = state_in + m_in + v_in + others
    if counted:
        all_in = all_in + [counts_pages]
    S = len(names)
    out_shapes = [jax.ShapeDtypeStruct(t.shape, t.dtype)
                  for t in state_in + m_in + v_in]
    scratch = bign_scratch_shapes(K, T, N)
    if counted:
        scratch += [pltpu.VMEM((-(-T // 8) * 8, 128), jnp.float32),
                    pltpu.SemaphoreType.DMA(())]
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shapes,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * S + 4)
        + [pl.BlockSpec(memory_space=pltpu.SMEM)]
        + ([pl.BlockSpec(memory_space=pl.ANY)] if counted else []),
        out_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (3 * S),
        input_output_aliases={i: i for i in range(3 * S)},
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*all_in)
    new_state = dict(zip(names, outs[:S]))
    new_m = dict(zip(names, outs[S:2 * S]))
    new_v = dict(zip(names, outs[2 * S:3 * S]))
    return new_state, new_m, new_v


class FusedSVGDBigNTrainer(FusedSVGDTrainer):
    """Large-N variant of FusedSVGDTrainer: identical host interface/state
    (pack/unpack, counted pages, staircase launches); data re-packed
    task-major and padded to Np per task."""

    def __init__(self, hyper_prior, particles, X, Y, mask, **kw):
        import numpy as np

        super().__init__(hyper_prior, particles, X, Y, mask, **kw)
        _, _, self.Np = svgd_bign_shapes(self.K, self.T, self.N)
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

    def run(self, n_steps, step0):
        from meta_learning_pacoh_tpu.ops.pallas.launch_sched import (
            staircase_launches,
            staircase_lr,
        )

        cap = self.MAX_LAUNCH if self.counted else int(n_steps)
        for s, sub in staircase_launches(step0, n_steps, cap, self.lr_decay):
            pages = (self._make_counts(self.base_key, int(s), int(sub))
                     if self.counted else None)
            self.packed, self.m, self.v = fused_svgd_bign_train_packed(
                self.packed, self.m, self.v, self.x, self.y_nm, self.mask_nm,
                self.w_t, float(s), K=self.K, T=self.T, N=self.N, Np=self.Np,
                D=self.D, hidden=self.hidden,
                lr=staircase_lr(self.lr, self.lr_decay, s),
                prior_factor=self.prior_factor,
                wps=self.wps, bps=self.bps, n_steps=int(sub),
                counts_pages=pages, interpret=self.interpret)
