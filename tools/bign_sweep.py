"""TPU attribution/tuning sweep for the fused big-N MAP kernel.

Times the raw single-launch kernel (fused_map_bign_train_packed) per
iteration at the Swissfel shape (T=5, N=200) under module-constant
overrides and section ablations, to attribute the per-iter cost between
the blocked factorization, its leaves, the jitter-escalation check, and
the non-linalg sections (gram MXU / exp / zsubst / W-assembly / Kinv /
dd2 chain / MLP backward).

Usage: python -m tools.bign_sweep [configs...]
  config syntax: name=nb:base:batch_max_g:ablate1+ablate2
  ablates: the blocked-kernel _ABLATE knobs, the bign-kernel _ABLATE_BIGN
  knobs (no_zz no_exp no_zsubst no_assemble no_kinv no_dd2 no_mlp_bwd),
  plus 'leaf_identity_batch' (identity leaves in the batch-major path),
  'factor_identity' (skip the factorization entirely — L = W = I) and
  'tp8' (re-pad the task batch to a multiple of 8, the pre-round-4 layout).
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.ops.pallas import blocked_mll_kernel as bk
from meta_learning_pacoh_tpu.ops.pallas import fused_map_bign_kernel as bg
from meta_learning_pacoh_tpu.algos.pacoh_map import GPRegressionMetaLearned
from meta_learning_pacoh_tpu.datasets import SinusoidDataset

N_STEPS = 200

_BIGN_KNOBS = frozenset({"no_zz", "no_exp", "no_zsubst", "no_assemble",
                         "no_kinv", "no_dd2", "no_mlp_bwd"})
_SPECIAL = frozenset({"leaf_identity_batch", "factor_identity", "tp8"})


def build_trainer():
    env = SinusoidDataset(random_state=np.random.RandomState(5))
    train = env.generate_meta_train_data(n_tasks=5, n_samples=200)
    m = GPRegressionMetaLearned(train, num_iter_fit=500, random_seed=1,
                                task_batch_size=-1)
    assert m._fused_path_ok()
    from meta_learning_pacoh_tpu.ops.pallas.fused_map_bign_kernel import (
        FusedMAPBigNTrainer,
    )

    cfg = m.cfg
    return FusedMAPBigNTrainer(
        m.params, m.X, m.Y, m.mask, feature_dim=cfg.feature_dim,
        mean_hidden=tuple(cfg.mean_nn_layers),
        kernel_hidden=tuple(cfg.kernel_nn_layers), lr=m.lr_params,
        weight_decay=m.weight_decay, noise_floor=cfg.noise_floor,
        interpret=False)


def run_config(name, nb, base, bmg, ablate):
    saved = (bk._NB, bg._NB, bk._BASE, bk._BATCH_MAX_G, bk._ABLATE,
             bg._ABLATE_BIGN, bk._chol_inv_batch, bg.factor_escalated,
             bg.bign_shapes)
    bk._NB = nb
    bg._NB = nb  # bg binds _NB by from-import; both must move together
    bk._BASE = base
    bk._BATCH_MAX_G = bmg
    bk._ABLATE = frozenset(a for a in ablate
                           if a not in _SPECIAL and a not in _BIGN_KNOBS)
    bg._ABLATE_BIGN = frozenset(a for a in ablate if a in _BIGN_KNOBS)
    if "tp8" in ablate:
        def _shapes8(T, N):
            np_ = max(nb, -(-N // nb) * nb)
            return -(-T // 8) * 8, np_
        bg.bign_shapes = _shapes8
    if "leaf_identity_batch" in ablate:
        def _ident_batch(D):
            s = D.shape[-1]
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, s, s), 2)
            eye = jnp.broadcast_to(jnp.where(rows == cols, 1.0, 0.0),
                                   D.shape).astype(D.dtype)
            return eye, eye
        bk._chol_inv_batch = _ident_batch
    if "factor_identity" in ablate:
        def _ident_factor(trail_ref, l_ref, wd_ref, read_kn, eye_real):
            np_ = l_ref.shape[-1]
            rows = jax.lax.broadcasted_iota(jnp.int32, (1, np_, np_), 1)
            cols = jax.lax.broadcasted_iota(jnp.int32, (1, np_, np_), 2)
            l_ref[...] = (jnp.where(rows == cols, 1.0, 0.0)
                          + 0.0 * read_kn())  # keep gram alive (no DCE)
            wd_ref[...] = l_ref[:, :, :wd_ref.shape[-1]]
        bg.factor_escalated = _ident_factor
    jax.clear_caches()
    try:
        tr = build_trainer()
        tr.lr = 0.0  # frozen state: every iteration computes identical values
        # (value-breaking ablations otherwise diverge the params and
        # contaminate timing via jitter-escalation refires / denormals)

        def launch():
            out = bg.fused_map_bign_train_packed(
                tr.packed, tr.m, tr.v, tr.x, tr.y_nm, tr.mask_nm, tr.w_t,
                0.0, T=tr.T, N=tr.N, Tp=tr.Tp, Np=tr.Np, D=tr.D, F=tr.F,
                mean_hidden=tr.mean_hidden, kernel_hidden=tr.kernel_hidden,
                lr=tr.lr, weight_decay=tr.weight_decay,
                noise_floor=tr.noise_floor, n_steps=N_STEPS)
            return float(np.asarray(out[3]))  # readback fence

        launch()  # compile
        samples = []
        for _ in range(3):
            t0 = time.time()
            launch()
            samples.append((time.time() - t0) / N_STEPS * 1e6)
        print(f"{name:36s} {min(samples):8.1f} us/iter", flush=True)
    except Exception as e:  # noqa: BLE001 — sweep survives bad configs
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:110]}",
              flush=True)
    finally:
        (bk._NB, bg._NB, bk._BASE, bk._BATCH_MAX_G, bk._ABLATE,
         bg._ABLATE_BIGN, bk._chol_inv_batch, bg.factor_escalated,
         bg.bign_shapes) = saved


if __name__ == "__main__":
    configs = []
    for arg in sys.argv[1:]:
        nm, spec = arg.split("=")
        nb, base, bmg, abl = spec.split(":")
        configs.append((nm, int(nb), int(base), int(bmg),
                        [a for a in abl.split("+") if a]))
    if not configs:
        # every config carries no_jitter_trials: a value-breaking ablation
        # must not fire the escalation refactor and pay 2x factorization
        NJ = "no_jitter_trials"
        configs = [
            ("base+nj", 64, 16, 8, [NJ]),
            ("nj+factor_identity", 64, 16, 8, [NJ, "factor_identity"]),
            ("nj+no_zz", 64, 16, 8, [NJ, "no_zz"]),
            ("nj+no_exp", 64, 16, 8, [NJ, "no_exp"]),
            ("nj+no_zsubst", 64, 16, 8, [NJ, "no_zsubst"]),
            ("nj+no_assemble", 64, 16, 8, [NJ, "no_assemble"]),
            ("nj+no_kinv", 64, 16, 8, [NJ, "no_kinv"]),
            ("nj+no_dd2", 64, 16, 8, [NJ, "no_dd2"]),
            ("nj+no_mlp_bwd", 64, 16, 8, [NJ, "no_mlp_bwd"]),
        ]
    print(f"bign sweep T=5 N=200, {N_STEPS} steps/launch, min of 3",
          flush=True)
    for nm, nb, base, bmg, abl in configs:
        run_config(nm, nb, base, bmg, abl)
