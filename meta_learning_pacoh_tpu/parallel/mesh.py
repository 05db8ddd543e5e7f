"""Multi-chip parallelism: device meshes + sharded meta-training steps.

The reference scales out at the *process* level only (Ray / multiprocessing
fan-out of independent runs; SURVEY.md §2.5). The TPU-native equivalent is
single-program multi-chip: a `jax.sharding.Mesh` with

  - a `task` axis      — data parallelism over the meta-task batch (the
                         analog of gradient-sync DP; per-task MLLs reduce
                         with an XLA psum over ICI), and
  - a `particle` axis  — the SVGD particle / SVI sample axis (the
                         reference's "model batching", models.py:295-313).

Sharding is GSPMD-style: inputs carry `NamedSharding`s, `jax.jit` propagates
them, and XLA inserts the collectives. No NCCL/MPI translation — there is
nothing to translate (the reference never syncs gradients across processes).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from meta_learning_pacoh_tpu.models.random_gp import meta_log_prob
from meta_learning_pacoh_tpu.ops.svgd import svgd_phi


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None, local_device_ids=None):
    """Multi-host entry point: the TPU-native replacement for the reference's
    Ray cluster layer (SURVEY.md §2.5 comm backend).

    On a multi-host TPU slice, call this once per host before building any
    mesh; afterwards `jax.devices()` is the GLOBAL device list, so
    `make_mesh()` spans the slice and the same GSPMD-sharded training steps
    run unchanged — XLA routes the task/particle collectives over ICI within
    a slice and DCN across slices.

    Single-host degenerate path: with no coordinator (or num_processes <= 1)
    this is a documented no-op — `jax.devices()` already lists every local
    chip and nothing needs to rendezvous. TPU pod environments usually set
    the coordinator env vars, in which case bare
    `jax.distributed.initialize()` autodetects everything.
    """
    if coordinator_address is None and (num_processes is None or num_processes <= 1):
        return  # single host: nothing to rendezvous
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_mesh(n_devices=None, particle_parallel=False):
    """1-D task mesh, or 2-D (task, particle) mesh when asked and divisible."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if particle_parallel and n >= 4 and n % 2 == 0:
        return Mesh(np.array(devices).reshape(n // 2, 2), ("task", "particle"))
    return Mesh(np.array(devices), ("task",))


def shard_task_batch(mesh, X, Y, mask):
    """Place the padded [T, N, D] task tensors with the task axis sharded."""
    s = NamedSharding(mesh, P("task"))
    return (jax.device_put(X, s), jax.device_put(Y, s), jax.device_put(mask, s))


def build_svgd_parallel_step(hyper_prior, prior_factor, opt, mesh,
                             kernel="RBF", bandwidth=None):
    """Full-batch SVGD training step with tasks sharded over the mesh.

    Returns (step_fn, place) where `place(particles, opt_state, X, Y, mask)`
    lays out the state (particles sharded on the particle axis if the mesh
    has one, else replicated; tasks sharded on the task axis) and `step_fn`
    is the jitted update. Cross-task MLL sums and cross-particle Stein-kernel
    matmuls become XLA collectives over ICI.
    """
    has_particle_axis = "particle" in mesh.axis_names
    particle_spec = P("particle") if has_particle_axis else P()
    task_spec = P("task")

    def place(particles, opt_state, X, Y, mask):
        sp = NamedSharding(mesh, particle_spec)
        st = NamedSharding(mesh, task_spec)
        srep = NamedSharding(mesh, P())
        k = particles.shape[0]
        particles = jax.device_put(particles, sp)
        # particle-shaped optimizer moments ride the particle axis; scalar
        # counters and the like are replicated
        opt_state = jax.tree.map(
            lambda a: jax.device_put(
                a, sp if (hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == k) else srep
            ),
            opt_state,
        )
        return (particles, opt_state,
                jax.device_put(X, st), jax.device_put(Y, st), jax.device_put(mask, st))

    @jax.jit
    def step_fn(particles, opt_state, X, Y, mask):
        def total_log_prob(p):
            return jnp.sum(meta_log_prob(hyper_prior, prior_factor, p, X, Y, mask))

        score = jax.grad(total_log_prob)(particles)
        phi = svgd_phi(particles, score, kernel=kernel, bandwidth=bandwidth)
        updates, opt_state = opt.update(-phi, opt_state, particles)
        particles = optax.apply_updates(particles, updates)
        return particles, opt_state

    return step_fn, place
