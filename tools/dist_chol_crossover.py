"""Measure the distributed-Cholesky MLL tier against replicated XLA.

For each N, times one jitted value+grad of the exact-GP MLL (the training
hot op for N beyond the blocked-Pallas window) through:
  - `xla`:  the single-device fallback users get without a mesh
            (ops.gp.gp_mll -> safe_cholesky + triangular solves), and
  - `dist`: the distributed tier (parallel/dist_chol.py) over a mesh of all
            visible devices (block-cyclic factorization forward, column-
            sharded K^-1 backward).

Interpretation guide (recorded with the numbers in STATUS.md):
  - On the REAL single v5e chip a 1-device mesh measures pure orchestration
    overhead of the distributed lowering (there is nothing to parallelize).
  - On the virtual 8-device CPU mesh all "devices" share the host cores, so
    wall-clock parity (not speedup) is the best possible outcome; the
    dist/xla ratio measures collective + block-loop overhead. The crossover
    N reported is where that ratio drops below the requested threshold —
    i.e. where the overhead has amortized enough that real multi-chip
    hardware (D-way FLOP/memory split across ICI) would win.

Usage:
  JAX_PLATFORMS=cpu JAX_NUM_CPU_DEVICES=8 python tools/dist_chol_crossover.py \
      --ns 768,1024,2048 --reps 3 --json
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(n, reps, block_size, with_grad=True):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from meta_learning_pacoh_tpu.ops import gp as gp_ops
    from meta_learning_pacoh_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    rs = np.random.RandomState(n)
    a = rs.randn(n + 8, n).astype(np.float32)
    k = jnp.asarray((a.T @ a) / n + 0.5 * np.eye(n, dtype=np.float32))
    y = jnp.asarray(rs.randn(n).astype(np.float32))
    mean = jnp.zeros((n,), jnp.float32)

    def mll_xla(k_):
        return gp_ops.gp_mll(mean, k_, y, 0.1)

    def mll_dist(k_):
        with gp_ops.distributed_linalg(mesh, min_n=n, block_size=block_size):
            return gp_ops.gp_mll(mean, k_, y, 0.1)

    out = {}
    for name, fn in (("xla", mll_xla), ("dist", mll_dist)):
        f = jax.jit(jax.value_and_grad(fn)) if with_grad else jax.jit(fn)

        def run():
            r = f(k)
            v = r[0] if with_grad else r
            return float(v)  # readback fence

        run()  # compile + warm
        t0 = time.time()
        for _ in range(reps):
            run()
        out[name] = (time.time() - t0) / reps * 1e3  # ms
    out["n_devices"] = len(mesh.devices.ravel())
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ns", default="768,1024,2048")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--block_size", type=int, default=128)
    p.add_argument("--forward_only", action="store_true")
    p.add_argument("--json", action="store_true")
    args = p.parse_args()

    results = {}
    for n in (int(s) for s in args.ns.split(",")):
        r = measure(n, args.reps, args.block_size,
                    with_grad=not args.forward_only)
        r["dist_over_xla"] = round(r["dist"] / r["xla"], 3)
        results[str(n)] = {k: (round(v, 2) if isinstance(v, float) else v)
                           for k, v in r.items()}
        if not args.json:
            print(n, results[str(n)], flush=True)
    if args.json:
        print(json.dumps(results))


if __name__ == "__main__":
    main()
