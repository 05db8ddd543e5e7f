"""Isolate the blocked-MLL kernel's non-math cost floor at B=200/N=200.

Times, with the production BlockSpecs/grid (G systems per step):
  copy        — kn block in, L block out, single VMEM copy (pure DMA+grid)
  copy_sliced — same, but written through the production panel-slice
                pattern (NB-wide column writes) to expose half-lane-tile
                write costs
  fwd         — the production forward kernel (for the same-process anchor)

If `copy` lands near the all_off floor (~2.1 ms), the floor is DMA/grid
pipeline; if it is ~10x cheaper, the floor lives in Mosaic data-movement
ops inside the kernel body.
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from meta_learning_pacoh_tpu.ops.pallas import blocked_mll_kernel as bk


def _copy_kernel(kn_ref, l_ref):
    l_ref[...] = kn_ref[...]


def _copy_sliced_kernel(kn_ref, l_ref):
    np_ = kn_ref.shape[-1]
    nb = bk._NB
    l_ref[...] = jnp.zeros_like(l_ref)
    for p in range(np_ // nb):
        po = p * nb
        l_ref[:, po:po + nb, po:po + nb] = kn_ref[:, po:po + nb, po:po + nb]
        if p < np_ // nb - 1:
            l_ref[:, po + nb:, po:po + nb] = kn_ref[:, po + nb:, po:po + nb]


@functools.partial(jax.jit, static_argnames=("which",))
def _copy_call(kn, which):
    b, np_ = kn.shape[0], kn.shape[-1]
    g = bk._group_size(np_, b)
    body = {"copy": _copy_kernel, "copy_sliced": _copy_sliced_kernel}[which]
    return pl.pallas_call(
        body,
        grid=(pl.cdiv(b, g),),
        in_specs=[pl.BlockSpec((g, np_, np_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((g, np_, np_), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, np_, np_), kn.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=bk._VMEM_LIMIT),
    )(kn)


def timeit(fn, fence, reps=10, samples=3):
    fence(fn())  # compile+warm
    out = []
    for _ in range(samples):
        t0 = time.time()
        for _ in range(reps):
            r = fn()
        fence(r)
        out.append((time.time() - t0) / reps * 1e6)
    return float(np.min(out))


if __name__ == "__main__":
    B, N = 200, 200
    rng = np.random.RandomState(0)
    X = rng.randn(B, N, 3).astype(np.float32)
    K = np.einsum("bnd,bmd->bnm", X, X) + 3.0 * np.eye(N)[None]
    r = rng.randn(B, N).astype(np.float32)
    kn_p, r_p, np_, bp = bk._pad_systems(jnp.asarray(K, jnp.float32),
                                         jnp.asarray(r, jnp.float32))
    print("devices:", jax.devices(), " padded:", kn_p.shape, flush=True)

    for which in ("copy", "copy_sliced"):
        us = timeit(lambda: _copy_call(kn_p, which),
                    lambda o: float(np.asarray(o[0, 0, 0])))
        print(f"{which:12s} {us:9.1f} us", flush=True)

    us = timeit(lambda: bk._blocked_fwd_call(kn_p, r_p, N),
                lambda o: float(np.asarray(o[0][0, 0, 0])))
    print(f"{'fwd':12s} {us:9.1f} us", flush=True)
