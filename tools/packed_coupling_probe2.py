"""TPU probe #2: attribute the coupling cost. Variants:

  trsm      : X = bmm_nt(Bp, Wd) only                  (batched, G serial)
  syrk      : U = bmm_nt(Bp, Bp) only                  (batched, G serial)
  both      : TRSM + SYRK                              (batched)
  copies    : the BD scatter writes only (no matmuls)
  packed_mm : the packed matmuls only (stale BD scratch, no scatters)

Run at NB=64 (current) and NB=128 shapes to test the half-lane hypothesis.

Usage: python tools/packed_coupling_probe2.py [G] [R] [NB] [GP]
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
GP = int(sys.argv[4]) if len(sys.argv) > 4 else 8
REPS = 1000  # must swamp the ~25 ms tunnel dispatch+readback floor


def _bmm_nt(a, b):
    return jax.lax.dot_general(
        a, b, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )


def make_batched(mode):
    def kernel(bp_ref, wd_ref, out_ref):
        def body(i, acc):
            bp = bp_ref[...] + acc
            o = bp[:, :1, :] * 1e-3  # null floor: read + tiny op only
            if mode == "null":
                return acc + o * 1e-20
            if mode in ("trsm", "both"):
                X = _bmm_nt(bp, wd_ref[...])
                o = o + X[:, :1, :NB]
            if mode in ("syrk", "both"):
                src = X if mode == "both" else bp
                U = _bmm_nt(src, src)
                o = o + U[:, :1, :NB]
            return acc + o * 1e-20

        acc = jax.lax.fori_loop(0, REPS, body,
                                jnp.zeros((G, 1, NB), jnp.float32))
        out_ref[...] = acc[:, :, :1]
    return kernel


def make_packed(mode):
    n_chunks = G // GP

    def kernel(bp_ref, wd_ref, out_ref, bd_ref, bdw_ref):
        bd_ref[...] = jnp.zeros_like(bd_ref)
        bdw_ref[...] = jnp.zeros_like(bdw_ref)

        def body(i, acc):
            accs = acc * 1e-20
            o = jnp.zeros((G, 1, NB), jnp.float32)
            for c in range(n_chunks):
                g0 = c * GP
                if mode in ("copies", "full"):
                    for g in range(GP):
                        bd_ref[g * R:(g + 1) * R, g * NB:(g + 1) * NB] = (
                            bp_ref[g0 + g] + accs[g0 + g])
                        bdw_ref[g * NB:(g + 1) * NB,
                                g * NB:(g + 1) * NB] = wd_ref[g0 + g]
                if mode in ("packed_mm", "full"):
                    # TRSM: X row-stacked
                    wdt_stack = wd_ref[g0:g0 + GP].reshape(GP * NB, NB)
                    x_stack = jnp.dot(bd_ref[...], wdt_stack,
                                      preferred_element_type=jnp.float32)
                    # XT = BD(Wd) @ BpT ; Z = BD(Wd)^T @ XT ; U = BD(Bp) @ Z
                    # (BpT stand-in: free reshape — the real kernel reads the
                    # symmetric trail's upper slice, also a free reshape)
                    bpt = bp_ref[g0:g0 + GP, :NB, :].reshape(GP * NB, NB)
                    pad = jnp.zeros((GP * NB, R - NB), jnp.float32)
                    bpt_stack = (jnp.concatenate([bpt, pad], axis=1)
                                 if R > NB else bpt[:, :R])
                    xt_stack = jnp.dot(bdw_ref[...], bpt_stack,
                                       preferred_element_type=jnp.float32)
                    u_stack = jnp.dot(bd_ref[...], xt_stack,
                                      preferred_element_type=jnp.float32)
                    u3 = u_stack.reshape(GP, R, R)
                    x3 = x_stack.reshape(GP, R, NB)
                    upd = u3[:, :1, :NB] + x3[:, :1, :]
                    o = jnp.concatenate(
                        [o[:g0], o[g0:g0 + GP] + upd, o[g0 + GP:]], axis=0)
            return acc + o * 1e-20

        acc = jax.lax.fori_loop(0, REPS, body,
                                jnp.zeros((G, 1, NB), jnp.float32))
        out_ref[...] = acc[:, :, :1]
    return kernel


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
            vmem_limit_bytes=110 * 1024 * 1024),
    )(a, b))
    try:
        np.asarray(f(bp, wd))  # warm
        ts = []
        for _ in range(5):
            t0 = time.time()
            np.asarray(f(bp, wd))
            ts.append((time.time() - t0) / REPS * 1e6)
        print(f"{name:12s} {min(ts):8.2f} us/rep "
              f"(G={G} R={R} NB={NB} GP={GP})", flush=True)
    except Exception as e:
        print(f"{name:12s} FAILED: {type(e).__name__}: {str(e)[:160]}",
              flush=True)


if __name__ == "__main__":
    print("devices:", jax.devices(), flush=True)
    pk_scratch = [
        pltpu.VMEM((GP * R, GP * NB), jnp.float32),
        pltpu.VMEM((GP * NB, GP * NB), jnp.float32),
    ]
    modes = sys.argv[5:] or ["null", "both", "copies", "full"]
    for mode in modes:
        if mode in ("null", "trsm", "syrk", "both"):
            run(mode, make_batched(mode), [])
        else:
            run(mode, make_packed(mode), pk_scratch)
