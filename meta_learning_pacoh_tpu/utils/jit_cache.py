"""Process-level sharing of built jit callables across learner instances.

Every learner builds its jitted train-step / predict / eval functions in its
constructor. `jax.jit` caches compiled executables *per function object*, so
two learners with identical static config would otherwise re-trace and
re-compile everything from scratch — the dominant cost of test suites,
tuning sweeps, and per-task baseline fits that construct many short-lived
learners (the reference pays the analogous cost as per-instance gpytorch
module construction, meta_learn/GPR_meta_mll.py:61-74).

`shared(key, builder)` memoizes the artifact returned by `builder()` under a
hashable `key` that must capture every piece of instance state the builder
closes over (config dataclasses, learning mode, optimizer hyperparameters,
static shapes). Instances with the same key then share one function object —
and therefore one XLA compile cache entry per argument-shape/sharding combo.
"""

_CACHE = {}


def shared(key, builder):
    """Return the memoized artifact for `key`, building it on first use.

    The caller is responsible for making `key` complete: it must determine
    the built function's behavior entirely (anything else the builder closes
    over must be passed as runtime arguments instead).
    """
    try:
        return _CACHE[key]
    except KeyError:
        artifact = builder()
        _CACHE[key] = artifact
        return artifact


def cache_info():
    """(n_entries, keys) — for tests and debugging."""
    return len(_CACHE), list(_CACHE.keys())


def clear():
    _CACHE.clear()
