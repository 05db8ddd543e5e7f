"""Hyper-parallel trial execution: K tuning trials in ONE compiled program.

The reference ran tuning trials concurrently on a Ray cluster
(reference: custom_tune/trial_runner.py:80-138 — one Ray actor per trial).
The TPU-native replacement makes the TRIAL axis a tensor axis, like
parallel/seed_parallel.py does for seeds: stack K learners that differ only
in continuous optimizer hyperparameters (lr, weight_decay), move those
hyperparameters into the optimizer STATE via optax.inject_hyperparams, and
vmap the learner's own jitted training step over the stack. K trials then
share one XLA compile and one device program; on a mesh the trial axis
shards across chips with zero inter-trial communication.

Static/shape hyperparameters (feature_dim, task_batch_size, num_particles)
cannot ride a vmap — callers group suggestions by static config and batch
within each group (utils/tuning.tune_run batch_trial_fn contract).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import optax

from meta_learning_pacoh_tpu.utils.jit_cache import shared


def _inject_opt(m0):
    """m0's multi_transform(adamw) optimizer rebuilt so lr / weight_decay
    live in the optimizer STATE (vmappable) instead of the closure."""
    base = optax.inject_hyperparams(optax.adamw)(
        learning_rate=float(m0.lr_params),
        weight_decay=float(m0.weight_decay))
    return optax.multi_transform(
        {"train": base, "freeze": optax.set_to_zero()},
        m0._trainable_mask(),
    )


def _unwrap_masked(st):
    """optax.multi_transform wraps each partition in MaskedState on current
    optax; older versions store the partition state bare."""
    return (st.inner_state, True) if hasattr(st, "inner_state") and \
        type(st).__name__ == "MaskedState" else (st, False)


def _rewrap_masked(st, new_inner, wrapped):
    return st._replace(inner_state=new_inner) if wrapped else new_inner


def _set_hypers(opt_state, lr, wd):
    inner = dict(opt_state.inner_states)
    inj, wrapped = _unwrap_masked(inner["train"])
    hp = dict(inj.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    hp["weight_decay"] = jnp.asarray(wd, jnp.float32)
    inner["train"] = _rewrap_masked(inner["train"],
                                    inj._replace(hyperparams=hp), wrapped)
    return opt_state._replace(inner_states=inner)


def _stack_trees(trees):
    return jax.tree.map(lambda *ls: jnp.stack(ls), *trees)


def _assert_common(models, extra=()):
    """Static-config checks shared by every hyper-parallel fit: the stacked
    trials must share one compiled step, so everything that shapes the step
    graph has to be identical across the batch."""
    m0 = models[0]
    assert all(type(m) is type(m0) for m in models)
    assert all(m.cfg == m0.cfg for m in models)
    assert all(m.task_batch_size == m0.task_batch_size for m in models)
    assert all(m.n_tasks == m0.n_tasks for m in models)
    assert all(m._optimizer_name == "Adam" for m in models)
    assert all(m._lr_decay == 1.0 for m in models), (
        "lr_decay schedules carry per-step state; not vmapped over trials")
    assert all(m._step_count == 0 for m in models)
    assert all(m.X.shape == m0.X.shape for m in models)
    for attr in extra:
        assert all(getattr(m, attr) == getattr(m0, attr) for m in models), attr
    return m0


def _inject_adam(lr):
    """Plain Adam with the learning rate living in optimizer STATE, so a
    stack of trial opt-states can carry per-trial lrs under one vmap."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=float(lr))


def _set_lr(opt_state, lr):
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return opt_state._replace(hyperparams=hp)


def _shard_trials(mesh, trees):
    """Pad the trial axis to the mesh size and shard it (the Ray-cluster
    analog: one device slice per trial group)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis = "trial" if "trial" in mesh.axis_names else mesh.axis_names[0]
    n = jax.tree.leaves(trees[0])[0].shape[0]
    n_pad = (-n) % mesh.shape[axis]

    def pad(tree):
        if not n_pad:
            return tree
        return jax.tree.map(
            lambda a: jnp.concatenate(
                [a, jnp.repeat(a[-1:], n_pad, axis=0)], axis=0), tree)

    def place(tree):
        return jax.tree.map(
            lambda x: jax.device_put(
                x, NamedSharding(mesh, P(*((axis,) + (None,) * (x.ndim - 1))))),
            tree)

    return [place(pad(t)) for t in trees]


def fit_svgd_hyper_parallel(models, n_iter=None, log_period=5000, mesh=None):
    """Meta-fit K GPRegressionMetaLearnedSVGD models that differ only in
    lr / prior_factor / bandwidth, in one vmapped compiled program.

    bandwidth: either all None (median heuristic) or all numeric — the two
    regimes compile different kernels, so a mixed batch raises (tune_run's
    batch-failure fallback then runs the trials sequentially).
    """
    m0 = _assert_common(models, extra=("num_particles", "svgd_kernel"))
    assert type(m0).__name__ == "GPRegressionMetaLearnedSVGD"
    if n_iter is None:
        n_iter = m0.num_iter_fit

    bws = [m.bandwidth for m in models]
    if any(b is None for b in bws):
        assert all(b is None for b in bws), (
            "mixed None/numeric bandwidths cannot share one compiled step")
        bws_arr = None
    else:
        bws_arr = jnp.asarray([float(b) for b in bws], jnp.float32)
    pfs = jnp.asarray([float(m.prior_factor) for m in models], jnp.float32)

    opt = shared(("tuning_parallel.adam",), lambda: _inject_adam(m0._lr))

    def build_step():
        saved = m0._opt
        m0._opt = opt
        try:
            run_chunk = m0._build_step_fn()
        finally:
            m0._opt = saved

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def multi_chunk(particles, opt_states, X, Y, M, keys, pfs, bws,
                        start_step, n_steps):
            def one(p, o, k, pf, bw):
                out = run_chunk(p, o, X, Y, M, k, start_step, n_steps,
                                pf=pf, bw=bw)
                return out[0], out[1]

            bw_axis = None if bws is None else 0
            return jax.vmap(one, in_axes=(0, 0, 0, 0, bw_axis))(
                particles, opt_states, keys, pfs, bws)

        return multi_chunk

    multi_chunk = shared(
        ("tuning_parallel.svgd_step", m0.cfg, m0.svgd_kernel,
         bws_arr is None, m0.num_particles, m0.task_batch_size, m0.n_tasks,
         m0._weight_by_counts(), m0.X.shape),
        build_step,
    )

    particles = _stack_trees([m.particles for m in models])
    opt_states = _stack_trees([
        _set_lr(opt.init(m.particles), m._lr) for m in models])
    keys = jnp.stack([m._train_key for m in models])
    X, Y, M = (jnp.asarray(m0.X), jnp.asarray(m0.Y), jnp.asarray(m0.mask))

    if mesh is not None:
        stacked = [particles, opt_states, keys, pfs]
        if bws_arr is not None:
            stacked.append(bws_arr)
        placed = _shard_trials(mesh, stacked)
        particles, opt_states, keys, pfs = placed[:4]
        if bws_arr is not None:
            bws_arr = placed[4]

    remaining, step_count = int(n_iter), m0._step_count
    while remaining > 0:
        chunk = int(min(log_period, remaining))
        particles, opt_states = multi_chunk(
            particles, opt_states, X, Y, M, keys, pfs, bws_arr,
            step_count, chunk)
        step_count += chunk
        remaining -= chunk

    for i, m in enumerate(models):
        m.particles = jax.tree.map(lambda a: a[i], particles)
        final_i = jax.tree.map(lambda a: a[i], opt_states)
        if jax.tree.structure(final_i.inner_state) == \
                jax.tree.structure(m.opt_state):
            m.opt_state = final_i.inner_state
        m._step_count = step_count
        m.fitted = True
    return models


def fit_vi_hyper_parallel(models, n_iter=None, log_period=5000, mesh=None):
    """Meta-fit K GPRegressionMetaLearnedVI models that differ only in
    lr / prior_factor, in one vmapped compiled program."""
    m0 = _assert_common(models, extra=("svi_batch_size", "_cov_type"))
    assert type(m0).__name__ == "GPRegressionMetaLearnedVI"
    if n_iter is None:
        n_iter = m0.num_iter_fit

    pfs = jnp.asarray([float(m.prior_factor) for m in models], jnp.float32)
    opt = shared(("tuning_parallel.adam",), lambda: _inject_adam(m0._lr))

    def build_step():
        saved = m0._opt
        m0._opt = opt
        try:
            run_chunk = m0._build_step_fn()
        finally:
            m0._opt = saved

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def multi_chunk(post, opt_states, X, Y, M, keys, pfs, start_step,
                        n_steps):
            def one(p, o, k, pf):
                out = run_chunk(p, o, X, Y, M, k, start_step, n_steps, pf=pf)
                return out[0], out[1]

            return jax.vmap(one)(post, opt_states, keys, pfs)

        return multi_chunk

    multi_chunk = shared(
        ("tuning_parallel.vi_step", m0.cfg, m0.svi_batch_size, m0._cov_type,
         m0.task_batch_size, m0.n_tasks, m0._weight_by_counts(), m0.X.shape),
        build_step,
    )

    post = _stack_trees([m.posterior for m in models])
    opt_states = _stack_trees([
        _set_lr(opt.init(m.posterior), m._lr) for m in models])
    keys = jnp.stack([m._train_key for m in models])
    X, Y, M = (jnp.asarray(m0.X), jnp.asarray(m0.Y), jnp.asarray(m0.mask))

    if mesh is not None:
        post, opt_states, keys, pfs = _shard_trials(
            mesh, [post, opt_states, keys, pfs])

    remaining, step_count = int(n_iter), m0._step_count
    while remaining > 0:
        chunk = int(min(log_period, remaining))
        post, opt_states = multi_chunk(
            post, opt_states, X, Y, M, keys, pfs, step_count, chunk)
        step_count += chunk
        remaining -= chunk

    for i, m in enumerate(models):
        m.posterior = jax.tree.map(lambda a: a[i], post)
        final_i = jax.tree.map(lambda a: a[i], opt_states)
        if jax.tree.structure(final_i.inner_state) == \
                jax.tree.structure(m.opt_state):
            m.opt_state = final_i.inner_state
        m._step_count = step_count
        m.fitted = True
    return models


def fit_hyper_parallel(models, n_iter=None, log_period=5000, mesh=None):
    """Dispatch a homogeneous trial batch to the learner's hyper-parallel
    fit. Raises for learner families without one (callers fall back to
    sequential trials)."""
    name = type(models[0]).__name__
    fits = {
        "GPRegressionMetaLearned": fit_map_hyper_parallel,
        "GPRegressionMetaLearnedSVGD": fit_svgd_hyper_parallel,
        "GPRegressionMetaLearnedVI": fit_vi_hyper_parallel,
    }
    if name not in fits:
        raise NotImplementedError(
            f"hyper-parallel trials cover MAP/SVGD/VI; got {name}")
    return fits[name](models, n_iter=n_iter, log_period=log_period, mesh=mesh)


def fit_map_hyper_parallel(models, n_iter=None, log_period=5000, mesh=None):
    """Meta-fit K GPRegressionMetaLearned models that differ ONLY in
    lr_params / weight_decay, in one vmapped compiled program.

    Requirements: identical static config (cfg, learning_mode, task batch,
    data shapes), optimizer 'Adam', lr_decay == 1.0, all at step 0. The
    models' params are updated in-place (exactly as meta_fit would, up to
    vmap float reassociation); opt_state is written back in the learner's
    own adamw structure so continued meta_fit / state_dict keep working.

    mesh: optional Mesh with a 'trial' axis — the stacked trial dimension
    shards across its devices (the Ray-cluster analog).
    """
    assert len(models) >= 1
    m0 = models[0]
    assert type(m0).__name__ == "GPRegressionMetaLearned", (
        "hyper-parallel trials currently cover PACOH-MAP; other learners "
        "fall back to sequential trials")
    assert all(type(m) is type(m0) for m in models)
    assert all(m.cfg == m0.cfg for m in models)
    assert all(m.learning_mode == m0.learning_mode for m in models)
    assert all(m.task_batch_size == m0.task_batch_size for m in models)
    assert all(m.n_tasks == m0.n_tasks for m in models)
    assert all(m._optimizer_name == "Adam" for m in models)
    assert all(m._lr_decay == 1.0 for m in models), (
        "lr_decay schedules carry per-step state; not vmapped over trials")
    assert all(m._step_count == 0 for m in models)
    assert all(m.X.shape == m0.X.shape for m in models)
    if n_iter is None:
        n_iter = m0.num_iter_fit

    opt = shared(
        ("tuning_parallel.opt", m0.cfg, m0.learning_mode),
        lambda: _inject_opt(m0),
    )

    def build_step():
        saved = m0._opt
        m0._opt = opt
        try:
            run_chunk = m0._build_step_fn()
        finally:
            m0._opt = saved

        @functools.partial(jax.jit, static_argnames=("n_steps",))
        def multi_chunk(params, opt_states, X, Y, M, keys, start_step,
                        n_steps):
            def one(p, o, k):
                out = run_chunk(p, o, X, Y, M, k, start_step, n_steps)
                return out[0], out[1]

            return jax.vmap(one)(params, opt_states, keys)

        return multi_chunk

    multi_chunk = shared(
        ("tuning_parallel.step", m0.cfg, m0.learning_mode,
         m0.task_batch_size, m0.n_tasks, m0._weight_by_counts(),
         m0.X.shape),
        build_step,
    )

    params = _stack_trees([m.params for m in models])
    opt_states = _stack_trees([
        _set_hypers(opt.init(m.params), m.lr_params, m.weight_decay)
        for m in models
    ])
    keys = jnp.stack([m._train_key for m in models])
    X, Y, M = (jnp.asarray(m0.X), jnp.asarray(m0.Y), jnp.asarray(m0.mask))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        axis = "trial" if "trial" in mesh.axis_names else mesh.axis_names[0]
        n_pad = (-len(models)) % mesh.shape[axis]

        def pad(tree):
            if not n_pad:
                return tree
            return jax.tree.map(
                lambda a: jnp.concatenate(
                    [a, jnp.repeat(a[-1:], n_pad, axis=0)], axis=0), tree)

        def place(tree):
            return jax.tree.map(
                lambda x: jax.device_put(
                    x, NamedSharding(mesh, P(*((axis,) + (None,) * (x.ndim - 1))))),
                tree)

        params, opt_states = place(pad(params)), place(pad(opt_states))
        keys = place(pad(keys))

    remaining, step_count = int(n_iter), m0._step_count
    while remaining > 0:
        chunk = int(min(log_period, remaining))
        params, opt_states = multi_chunk(
            params, opt_states, X, Y, M, keys, step_count, chunk)
        step_count += chunk
        remaining -= chunk

    for i, m in enumerate(models):
        m.params = jax.tree.map(lambda a: a[i], params)
        # write the trained Adam state back in the learner's own structure
        # (inject's inner_state IS the adamw chain state)
        final_i = jax.tree.map(lambda a: a[i], opt_states)
        inner = dict(final_i.inner_states)
        inj, wrapped = _unwrap_masked(inner["train"])
        restored = final_i._replace(
            inner_states={"train": _rewrap_masked(inner["train"],
                                                  inj.inner_state, wrapped),
                          "freeze": inner["freeze"]})
        ref_struct = jax.tree.structure(m.opt_state)
        if jax.tree.structure(restored) == ref_struct:
            m.opt_state = restored
        m._step_count = step_count
        m.fitted = True
    return models


def run_trial_batch(configs, build_model_fn, eval_fn, n_iter,
                    static_keys=("feature_dim", "task_batch_size"),
                    mesh=None, log_period=5000):
    """Execute a batch of tuning trials (MAP / SVGD / VI): group configs by
    their static (shape-changing) keys, hyper-parallel-fit each group of
    size >= 2, run singletons sequentially, and return results in input
    order.

    build_model_fn(config) -> learner; eval_fn(model) -> metrics dict.
    """
    groups = {}
    for i, c in enumerate(configs):
        groups.setdefault(tuple(c.get(k) for k in static_keys),
                          []).append(i)
    results = [None] * len(configs)
    for idx in groups.values():
        models = [build_model_fn(configs[i]) for i in idx]
        if len(models) >= 2:
            fit_hyper_parallel(models, n_iter=n_iter, mesh=mesh,
                               log_period=log_period)
        else:
            models[0].meta_fit(verbose=False, log_period=n_iter,
                               n_iter=n_iter)
        for i, m in zip(idx, models):
            results[i] = eval_fn(m)
    return results


# back-compat alias (round-4 name, MAP-only era)
run_map_trial_batch = run_trial_batch
