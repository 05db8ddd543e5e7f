"""Vectorized bisection root-finder (for mixture-distribution quantiles).

Matches the reference's interval-shrinking method used for
`EqualWeightedMixtureDist.icdf` (reference: meta_learn/util.py:9-42,
meta_learn/models.py:136-140), rebuilt as a jittable `lax.while_loop` with a
static iteration cap and NaN on non-convergence.
"""

import jax
import jax.numpy as jnp


def find_root_by_bounding(fun, left, right, eps=1e-6, max_iter=10_000):
    """Solve fun(x) = 0 elementwise for a monotone vectorized function.

    fun must be increasing in x (true for cdf(x) - q). left/right are arrays
    bounding the roots. Returns the midpoint array; NaN where max_iter hit.
    """
    left = jnp.asarray(left, dtype=jnp.float32)
    right = jnp.asarray(right, dtype=jnp.float32)

    def cond(state):
        l, r, it = state
        err = jnp.max(jnp.abs(r - l)) / 2.0
        return jnp.logical_and(err > eps, it < max_iter)

    def body(state):
        l, r, it = state
        mid = (l + r) / 2.0
        f = fun(mid)
        left_of_zero = f < 0
        l = jnp.where(left_of_zero, mid, l)
        r = jnp.where(left_of_zero, r, mid)
        return l, r, it + 1

    l, r, it = jax.lax.while_loop(cond, body, (left, right, jnp.asarray(0)))
    mid = (l + r) / 2.0
    return jnp.where(it >= max_iter, jnp.nan, mid)
