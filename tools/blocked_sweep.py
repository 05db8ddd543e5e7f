"""TPU tuning sweep for the blocked MLL kernel: G budget, base tile,
ablation knobs. Each config re-traces (jax.clear_caches) and times the
forward and value+grad at B=200/N=200.

Usage: python -m tools.blocked_sweep [configs...]
  config syntax: name=gbudget_mb:base:ablate1+ablate2[:batch_max_g]
  default set runs a curated sweep.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.ops.pallas import blocked_mll_kernel as bk


def make_inputs(B, N):
    rs = np.random.RandomState(0)
    A = rs.randn(B, N + 3, N).astype(np.float32)
    K = jnp.asarray(np.einsum("bin,bim->bnm", A, A) / N
                    + 0.5 * np.eye(N, dtype=np.float32))
    r = jnp.asarray(rs.randn(B, N).astype(np.float32))
    return K, r


def time_scanned(make_body, K, reps=20, samples=3):
    """bench.py protocol: jitted lax.scan of `reps` evals, ONE readback —
    the axon tunnel's per-dispatch latency (~10-45 ms) amortizes out."""
    import jax

    @jax.jit
    def many(K):
        def body(c, _):
            return c + make_body(K + c * 1e-30), None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    float(many(K))  # compile + fence
    out = []
    for _ in range(samples):
        t0 = time.time()
        float(many(K))
        out.append((time.time() - t0) / reps * 1e6)
    return float(np.min(out))


def run_config(name, g_budget_mb, base, ablate, K, r, batch_max_g=None,
               nb=None, pack_gp=None):
    bk._G_BUDGET = g_budget_mb * 2**20
    bk._BASE = base
    bk._ABLATE = frozenset(ablate)
    if batch_max_g is not None:
        bk._BATCH_MAX_G = batch_max_g
    if nb is not None:
        bk._NB = nb
    if pack_gp is not None:
        bk._PACK_GP = pack_gp
    jax.clear_caches()

    def fwd_body(Kc):
        q, l = bk.blocked_mll_quad_logdet(Kc, r)
        return q[0] + l[0]

    def grad_body(Kc):
        g = jax.grad(lambda k: jnp.sum(
            0.7 * bk.blocked_mll_quad_logdet(k, r)[0]
            + 0.3 * bk.blocked_mll_quad_logdet(k, r)[1]))(Kc)
        return g[0, 0, 0]

    try:
        f_us = time_scanned(fwd_body, K)
        g_us = time_scanned(grad_body, K)
        print(f"{name:32s} fwd {f_us:9.1f} us   val+grad {g_us:9.1f} us",
              flush=True)
    except Exception as e:  # noqa: BLE001 — sweep survives bad configs
        print(f"{name:32s} FAILED: {type(e).__name__}: {str(e)[:120]}",
              flush=True)


if __name__ == "__main__":
    B, N = 200, 200
    K, r = make_inputs(B, N)
    configs = []
    for arg in sys.argv[1:]:
        nm, spec = arg.split("=")
        parts = spec.split(":")
        gb, base, abl = parts[0], parts[1], parts[2]
        bmg = int(parts[3]) if len(parts) > 3 and parts[3] else None
        nb = int(parts[4]) if len(parts) > 4 and parts[4] else None
        pgp = int(parts[5]) if len(parts) > 5 and parts[5] else None
        configs.append((nm, int(gb), int(base),
                        [a for a in abl.split("+") if a], bmg, nb, pgp))
    if not configs:
        configs = [
            ("G32_base16", 8, 16, [], None, None),
            ("G64_base16", 16, 16, [], None, None),
            ("G32_base16_nozsubst", 8, 16, ["no_zsubst"], None, None),
            ("G32_base16_nojitter", 8, 16, ["no_jitter_trials"], None, None),
            ("G32_base16_nolinalg", 8, 16,
             ["no_zsubst", "no_jitter_trials"], None, None),
            ("G32_base32", 8, 32, [], None, None),
            ("G32_base8", 8, 8, [], None, None),
        ]
    print(f"sweep at B={B} N={N} (timing: min of 3 samples x 10 reps)",
          flush=True)
    for cfg in configs:
        nm, gb, base, abl, bmg, nb = cfg[:6]
        pgp = cfg[6] if len(cfg) > 6 else None
        run_config(nm, gb, base, abl, K, r, batch_max_g=bmg, nb=nb,
                   pack_gp=pgp)


def run_vmem_config(name, g_budget_mb, vmem_mb, K, r):
    bk._G_BUDGET = g_budget_mb * 2**20
    bk._VMEM_LIMIT = vmem_mb * 1024 * 1024
    jax.clear_caches()
    run_config(name, g_budget_mb, bk._BASE, [], K, r)
