"""TPU probe: is a block-diagonal-packed wide MXU contraction faster than a
G-serialized batched dot for the blocked-factorization couplings?

Measures, per variant, a kernel that repeats the panel-coupling workload
REPS times (scan-amortized, so launch overhead washes out):

  batched : X = bmm_nt(Bp, Wd)   [G, R, NB] x [G, NB, NB]  (G serial matmuls)
  packed  : scatter Bp into BD [G*R, G*NB] (G block copies) then ONE
            [G*R, G*NB] @ [G*NB, NB] matmul (G-fold FLOP waste)
  packed_syrk : adds U = BD(X) @ XT_stack with XT_stack = BD(Wd) @ BpT_stack
  batched_syrk: U = bmm_nt(X, X) per system

Usage: python tools/packed_coupling_probe.py [G] [R] [NB] [G']
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G = int(sys.argv[1]) if len(sys.argv) > 1 else 32
R = int(sys.argv[2]) if len(sys.argv) > 2 else 192
NB = int(sys.argv[3]) if len(sys.argv) > 3 else 64
GP = int(sys.argv[4]) if len(sys.argv) > 4 else 8  # packed chunk size
REPS = 50


def _bmm_nt(a, b):
    return jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def batched_kernel(bp_ref, wd_ref, out_ref):
    def body(i, acc):
        X = _bmm_nt(bp_ref[...] + acc, wd_ref[...])
        U = _bmm_nt(X, X)
        return acc + U[:, :1, :NB] * 1e-20

    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((G, 1, NB), jnp.float32))
    out_ref[...] = acc[:, :, :1]


def packed_kernel(bp_ref, wd_ref, out_ref, bd_ref, bdx_ref, bdw_ref):
    n_chunks = G // GP
    # one-time zero fill: off-block regions stay zero across all reps
    bd_ref[...] = jnp.zeros_like(bd_ref)
    bdx_ref[...] = jnp.zeros_like(bdx_ref)
    bdw_ref[...] = jnp.zeros_like(bdw_ref)

    def body(i, acc):
        accs = acc * 1e-20
        us = []
        for c in range(n_chunks):
            g0 = c * GP
            # scatter Bp chunk into block-diagonal scratch
            for g in range(GP):
                bd_ref[g * R:(g + 1) * R, g * NB:(g + 1) * NB] = (
                    bp_ref[g0 + g] + accs[g0 + g])
                bdw_ref[g * NB:(g + 1) * NB, g * NB:(g + 1) * NB] = (
                    wd_ref[g0 + g])
            # TRSM: X row-stacked [GP*R, NB]
            wdt_stack = wd_ref[g0:g0 + GP].reshape(GP * NB, NB)
            x_stack = jnp.dot(bd_ref[...], wdt_stack,
                              preferred_element_type=jnp.float32)
            # XT_stack = BD(Wd) @ BpT_stack. In the real kernel BpT comes
            # free off the symmetric trail; here a same-shape stand-in.
            bpt_flat = bp_ref[g0:g0 + GP].reshape(GP * R, NB)[:GP * NB, :]
            bpt_stand = jnp.concatenate(
                [bpt_flat, jnp.zeros((GP * NB, R - NB), jnp.float32)], axis=1
            ) if R > NB else bpt_flat[:, :R]
            xt_stack = jnp.dot(bdw_ref[...], bpt_stand,
                               preferred_element_type=jnp.float32)
            # SYRK: U = BD(X) @ XT_stack
            for g in range(GP):
                bdx_ref[g * R:(g + 1) * R, g * NB:(g + 1) * NB] = (
                    x_stack[g * R:(g + 1) * R, :])
            u_stack = jnp.dot(bdx_ref[...], xt_stack,
                              preferred_element_type=jnp.float32)
            us.append(u_stack.reshape(GP, R, R))
        u = jnp.concatenate(us, axis=0)
        return acc + u[:, :1, :NB] * 1e-20

    acc = jax.lax.fori_loop(0, REPS, body, jnp.zeros((G, 1, NB), jnp.float32))
    out_ref[...] = acc[:, :, :1]


def run(name, kernel, scratch):
    bp = jnp.asarray(np.random.RandomState(0).randn(G, R, NB), jnp.float32)
    wd = jnp.asarray(
        np.tril(np.random.RandomState(1).randn(G, NB, NB)), jnp.float32)
    f = jax.jit(lambda a, b: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((G, 1, 1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(a, b))
    out = f(bp, wd)
    np.asarray(out)  # warm
    ts = []
    for _ in range(5):
        t0 = time.time()
        np.asarray(f(bp, wd))
        ts.append((time.time() - t0) / REPS * 1e6)
    print(f"{name:14s} {min(ts):8.2f} us/rep  (G={G} R={R} NB={NB} GP={GP})",
          flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    run("batched", batched_kernel, [])
    run("packed", packed_kernel, [
        pltpu.VMEM((GP * R, GP * NB), jnp.float32),
        pltpu.VMEM((GP * R, GP * NB), jnp.float32),
        pltpu.VMEM((GP * NB, GP * NB), jnp.float32),
    ])
