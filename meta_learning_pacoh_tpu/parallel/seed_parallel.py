"""Seed-parallel training: vmapped fan-out of independent learner fits.

The reference scales experiment sweeps by launching one PROCESS per
(config, seed) via Ray remote tasks or multiprocessing pools
(reference: experiments/baselines/baseline_comparison.py:65-123,
experiments/util.py:160-185, meta_learn/util.py:109-157). On TPU the
idiomatic equivalent is to make the seed axis a *tensor axis*: stack the S
learners' parameter pytrees, `vmap` the already-jitted training step over
the stack, and run all S independent trainings inside ONE compiled XLA
program — every matmul in the step gains a leading batch dimension that
feeds the MXU instead of idling S-1 processes' worth of silicon. With a
`Mesh({'seed': n})` the stacked axis shards across chips, which is
literally the Ray layer's job (independent trials on separate workers)
re-expressed as GSPMD sharding with zero inter-seed communication.

Works with any group of learners that share an identical static config
(same architecture/optimizer/task-batch config => they already share one
memoized jitted step via utils/jit_cache.shared); meta-train data may
differ per learner as long as the padded shapes match (e.g. per-seed
dataset draws in the meta-overfitting sweep).

Usage:
    models = [GPRegressionMetaLearned(data, random_seed=s) for s in seeds]
    fit_models_parallel(models, n_iter=10000)   # all S fitted in-place
"""

import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


# per-class adapter: (attribute holding the trained state,
#                     attributes passed to the step between opt_state and key)
_SPECS = {
    "GPRegressionMetaLearned": ("params", ("X", "Y", "mask")),
    "GPRegressionMetaLearnedSVGD": ("particles", ("X", "Y", "mask")),
    "GPRegressionMetaLearnedVI": ("posterior", ("X", "Y", "mask")),
    "GPRegressionMetaLearnedPAC": ("params", ("X", "Y", "mask")),
    "MAMLRegression": ("params", ("X", "Y", "mask", "_split_arr")),
    "NPRegressionMetaLearned": (
        "params", ("X", "Y", "mask", "num_context_per_task")),
}


def make_seed_mesh(n_devices=None):
    """1-D mesh with a 'seed' axis for sharding seed-parallel fits."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("seed",))


def _stack_trees(trees):
    return jax.tree.map(lambda *ls: jnp.stack(ls), *trees)


def _shard_leading(tree, mesh):
    def place(x):
        spec = P(*(("seed",) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(place, tree)


def fit_models_parallel(models, n_iter=None, log_period=5000, mesh=None,
                        verbose=False, prefer="auto"):
    """Meta-fit S same-config learners simultaneously via one vmapped step.

    models:     list of learner instances of one class, identical configs
                (checked: they must share the memoized jitted step function),
                all at the same step count; data shapes must match.
    n_iter:     iterations for every model (default: models[0].num_iter_fit).
    log_period: chunk length per device dispatch (larger = less host
                round-trip overhead; chunking never changes results — step
                keys are fold_in(base_key, global_step)).
    mesh:       optional Mesh with a 'seed' axis; the stacked seed dimension
                of every state/data tensor is sharded across its devices.
                A model count that does not divide the axis size is padded
                with throwaway replicas of the last model (they train and
                are discarded), so any S works on any mesh.
    prefer:     'auto' (default == 'vmap') | 'vmap' | 'sequential_fused'.
                'sequential_fused' runs plain per-model meta_fit loops so
                fused-window configs ride their single-launch Pallas
                kernels. MEASURED on one v5e (SVGD sin_20, 5 seeds x 10k
                iters): vmapped XLA 1.39 s vs sequential fused 2.69 s —
                the per-seed kernel speedup (1.6-3.8x) is eaten by
                per-instance trainer construction + closure jits, so
                'auto' stays with the vmapped program. The option exists
                for long fits (construction amortizes ~0.3 s/seed; the
                crossover is ~50k iters/seed) and for bit-exact
                per-seed-meta_fit semantics.

    Mutates each model in-place exactly as `model.meta_fit(n_iter=n_iter)`
    would (state, opt_state, step count, fitted flag), up to float
    reassociation from the vmapped/sharded reductions (the
    sequential-fused route is EXACTLY per-model meta_fit).
    """
    assert len(models) >= 1
    m0 = models[0]
    cls = type(m0).__name__
    assert cls in _SPECS, f"seed-parallel fit not supported for {cls}"
    state_attr, data_attrs = _SPECS[cls]

    assert all(type(m) is type(m0) for m in models)

    assert prefer in ("auto", "vmap", "sequential_fused")
    if prefer == "sequential_fused":
        fused_ok = all(
            getattr(m, "_fused_path_ok", lambda: False)() for m in models)
        assert fused_ok, (
            "sequential_fused requires every model in a fused window")
        if n_iter is None:
            n_iter = m0.num_iter_fit
        for m in models:
            m.meta_fit(verbose=verbose, log_period=log_period, n_iter=n_iter)
        return models

    def _same_step(m):
        # identity, or equal jit-cache keys (LRU eviction can mint distinct
        # function objects for the same static config)
        if m._step_fn is m0._step_fn:
            return True
        ka = getattr(m._step_fn, "_jit_cache_key", None)
        kb = getattr(m0._step_fn, "_jit_cache_key", None)
        return ka is not None and ka == kb

    assert all(_same_step(m) for m in models[1:]), (
        "all models must share an identical static config (they then share "
        "one jitted step via utils/jit_cache)"
    )
    assert all(m._step_count == m0._step_count for m in models[1:]), (
        "all models must be at the same training step"
    )
    assert all(getattr(m, "_mesh", None) is None for m in models), (
        "seed-parallel fit shards the seed axis itself; construct the "
        "learners with mesh=None"
    )
    if n_iter is None:
        n_iter = m0.num_iter_fit

    state = _stack_trees([getattr(m, state_attr) for m in models])
    opt_state = _stack_trees([m.opt_state for m in models])
    keys = jnp.stack([m._train_key for m in models])
    data = tuple(
        jnp.stack([jnp.asarray(getattr(m, attr)) for m in models])
        for attr in data_attrs
    )

    if mesh is not None:
        assert "seed" in mesh.axis_names, "mesh needs a 'seed' axis"
        n_pad = (-len(models)) % mesh.shape["seed"]
        if n_pad:
            # GSPMD needs the sharded axis divisible by the axis size: pad
            # with replicas of the last model, dropped at unstack time
            def pad(tree):
                return jax.tree.map(
                    lambda a: jnp.concatenate(
                        [a, jnp.repeat(a[-1:], n_pad, axis=0)], axis=0),
                    tree,
                )

            state, opt_state, keys = pad(state), pad(opt_state), pad(keys)
            data = tuple(pad(d) for d in data)
        state = _shard_leading(state, mesh)
        opt_state = _shard_leading(opt_state, mesh)
        keys = _shard_leading(keys, mesh)
        data = tuple(_shard_leading(d, mesh) for d in data)

    step = m0._step_fn

    # memoized on the (already config-memoized) step function so repeated
    # group fits retrace/recompile nothing
    multi_chunk = getattr(step, "_seed_parallel_multi", None)
    if multi_chunk is None:
        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def multi_chunk(state, opt_state, data, keys, start_step, n_steps):
            def one(s, o, d, k):
                out = step(s, o, *d, k, start_step, n_steps)
                return out[0], out[1]

            return jax.vmap(one)(state, opt_state, data, keys)

        step._seed_parallel_multi = multi_chunk

    t = time.time()
    remaining, itr = int(n_iter), 0
    step_count = m0._step_count
    while remaining > 0:
        chunk = int(min(log_period, remaining))
        state, opt_state = multi_chunk(
            state, opt_state, data, keys, step_count, chunk
        )
        step_count += chunk
        remaining -= chunk
        itr += chunk
        if verbose:
            jax.tree.leaves(state)[0].block_until_ready()
            m0.logger.info(
                "seed-parallel (%d models): iter %d/%d - %.2f sec"
                % (len(models), itr, n_iter, time.time() - t)
            )
            t = time.time()

    for i, m in enumerate(models):
        setattr(m, state_attr, jax.tree.map(lambda a: a[i], state))
        m.opt_state = jax.tree.map(lambda a: a[i], opt_state)
        m._step_count = step_count
        m.fitted = True
        if hasattr(m, "_fused"):
            m._fused = None  # SVGD: repack the fused-kernel state on next fit
    return models
