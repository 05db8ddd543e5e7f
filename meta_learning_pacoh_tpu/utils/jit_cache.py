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

The cache is a bounded LRU (`MAX_ENTRIES`): continuous-hyperparameter
sweeps (e.g. TPE tuning, where nearly every trial mints a fresh lr/wd key)
would otherwise grow it monotonically — and some builders close over their
first learner instance (data tensors included), which the cache would pin
alive for the life of the process. Eviction only drops the cache's
reference; learners keep working through their own `self._step_fn` handle,
they just stop donating their compile cache to future instances.
"""

from collections import OrderedDict

MAX_ENTRIES = 256

_CACHE = OrderedDict()


def shared(key, builder):
    """Return the memoized artifact for `key`, building it on first use.

    The caller is responsible for making `key` complete: it must determine
    the built function's behavior entirely (anything else the builder closes
    over must be passed as runtime arguments instead).
    """
    try:
        artifact = _CACHE[key]
        _CACHE.move_to_end(key)
        return artifact
    except KeyError:
        artifact = builder()
        try:
            # let consumers compare "same config?" by key even when LRU
            # eviction has minted distinct objects (parallel/seed_parallel)
            artifact._jit_cache_key = key
        except AttributeError:
            pass  # non-function artifacts (e.g. optax namedtuples)
        _CACHE[key] = artifact
        while len(_CACHE) > MAX_ENTRIES:
            _CACHE.popitem(last=False)
        return artifact


def cache_info():
    """(n_entries, keys) — for tests and debugging."""
    return len(_CACHE), list(_CACHE.keys())


def clear():
    _CACHE.clear()
