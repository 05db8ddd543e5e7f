"""TPU microbench for the blocked MLL kernel: value+grad at configurable B/N.

Usage: python tools/blocked_probe.py [B] [N] [reps]
Prints per-rep microseconds for the Pallas blocked path and the XLA path.
(Measurement protocol matches bench.py: jitted scan of `reps` grad evals,
 readback fence, 3 timed samples.)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from meta_learning_pacoh_tpu.ops.pallas.blocked_mll_kernel import (
    blocked_mll_quad_logdet,
)


def make_inputs(B, N):
    rs = np.random.RandomState(0)
    A = rs.randn(B, N + 3, N).astype(np.float32)
    K = jnp.asarray(np.einsum("bin,bim->bnm", A, A) / N
                    + 0.5 * np.eye(N, dtype=np.float32))
    r = jnp.asarray(rs.randn(B, N).astype(np.float32))
    return K, r


def xla_quad_logdet(Kn, r):
    L = jnp.linalg.cholesky(Kn)
    z = jax.scipy.linalg.solve_triangular(L, r[..., None], lower=True)[..., 0]
    quad = jnp.sum(z * z, -1)
    logdet = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
    return quad, logdet


def time_grad(fn, K, r, reps):
    @jax.jit
    def many(K):
        def body(c, _):
            g = jax.grad(lambda k: jnp.sum(0.7 * fn(k, r)[0]
                                           + 0.3 * fn(k, r)[1]))(K + c * 1e-30)
            return c + g[0, 0, 0], None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    float(many(K))  # compile + fence
    samples = []
    for _ in range(3):
        t0 = time.time()
        float(many(K))
        samples.append((time.time() - t0) / reps * 1e6)
    return float(np.mean(samples)), float(np.std(samples))


def time_fwd(fn, K, r, reps):
    @jax.jit
    def many(K):
        def body(c, _):
            q, l = fn(K + c * 1e-30, r)
            return c + q[0] + l[0], None
        c, _ = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return c

    float(many(K))
    samples = []
    for _ in range(3):
        t0 = time.time()
        float(many(K))
        samples.append((time.time() - t0) / reps * 1e6)
    return float(np.mean(samples)), float(np.std(samples))


if __name__ == "__main__":
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 200
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    K, r = make_inputs(B, N)
    # parity first (guards the timing claim)
    qp, lp = blocked_mll_quad_logdet(K, r)
    qx, lx = xla_quad_logdet(K, r)
    err = max(float(jnp.max(jnp.abs(qp - qx) / jnp.abs(qx))),
              float(jnp.max(jnp.abs(lp - lx) / jnp.abs(lx))))
    print(f"parity rel err: {err:.2e}")
    fwd_us, fwd_sd = time_fwd(blocked_mll_quad_logdet, K, r, reps)
    print(f"pallas fwd : {fwd_us:9.1f} us/rep (sd {fwd_sd:.1f})")
    us, sd = time_grad(blocked_mll_quad_logdet, K, r, reps)
    print(f"pallas grad: {us:9.1f} us/rep (sd {sd:.1f})")
    xus, xsd = time_grad(xla_quad_logdet, K, r, reps)
    print(f"xla    grad: {xus:9.1f} us/rep (sd {xsd:.1f})  speedup {xus/us:.2f}x")
