"""Fused large-N PACOH-SVGD training kernel (ops/pallas/fused_svgd_bign_kernel).

Validation chain (interpret mode on CPU), mirroring test_fused_svgd.py for
the flagship algorithm in the blocked-linalg window 9 <= N <= 256:
 1. multi-step kernel trajectory == the closed-form spec
    (ops/fused_svgd_math.svgd_step_closed_form — itself pinned against
    jax.grad + the learner step in test_fused_svgd.py), ragged masks
    included, Adam moments too,
 2. learner-level dispatch + chunking determinism against the XLA scan step
    (short horizon: early Adam steps act like sign(g), so a coordinate at a
    sign boundary moves by O(lr) per step between any two f32 evaluations),
 3. counted task batching == the XLA count-weighted step on the same draws,
 4. the VMEM/shape gate.

Reference semantics guarded: GPR_meta_svgd.py:104-131 -> svgd.py:12-28 at
Swissfel-like shapes (experiments/data_sim.py:380-497).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu import GPRegressionMetaLearnedSVGD
from meta_learning_pacoh_tpu.ops import fused_svgd_math as F
from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import (
    FusedSVGDBigNTrainer,
    svgd_bign_fits,
    svgd_bign_shapes,
)
from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
    unpack_state,
)

HIDDEN = (8, 8)
PRIOR_FACTOR = 0.01
WPS, BPS = 0.5, 3.0
LR = 1e-3
N_PTS = 12  # > 8: outside the entry-tile window, Np pads to 64
K_PART = 4


def _make_tasks(n_tasks=3, n_samples=N_PTS, ragged=False, seed=26):
    env = SinusoidDataset(random_state=np.random.RandomState(seed))
    mt = env.generate_meta_train_data(n_tasks=n_tasks, n_samples=n_samples)
    if ragged:  # drop trailing points from later tasks -> padded masks
        mt = [(x[: n_samples - 2 * i] if i else x,
               y[: n_samples - 2 * i] if i else y)
              for i, (x, y) in enumerate(mt)]
    return mt


def _build(mt=None, seed=30, n_iter=100, task_batch_size=-1):
    return GPRegressionMetaLearnedSVGD(
        mt if mt is not None else _make_tasks(), num_iter_fit=n_iter,
        random_seed=seed, num_particles=K_PART, prior_factor=PRIOR_FACTOR,
        task_batch_size=task_batch_size, lr=LR,
        mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
        weight_prior_std=WPS, bias_prior_std=BPS,
    )


def test_shapes_and_gate():
    from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import _GC

    def gp(g):  # Gp rounds up to the chunk width (_GC, env-tunable)
        return -(-g // _GC) * _GC

    from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import _NBF

    def np_(n):  # points pad to the mega-kernel's pinned panel size
        return max(_NBF, -(-n // _NBF) * _NBF)

    assert svgd_bign_shapes(4, 3, 12) == (12, gp(12), np_(12))
    assert svgd_bign_shapes(10, 5, 200) == (50, gp(50), np_(200))
    assert svgd_bign_fits(10, 5, 200)
    assert svgd_bign_fits(10, 5, 100)       # Np = 128 floor
    assert not svgd_bign_fits(10, 5, 300)   # Np > 256
    assert not svgd_bign_fits(10, 5, 5)     # entry-tile window owns N <= 8
    # Np = 64 shapes compile only in interpret mode (Mosaic lane-split
    # floor); on-CPU test runs report them feasible, on-TPU they are not
    from meta_learning_pacoh_tpu import config
    assert svgd_bign_fits(10, 5, 64) == config.pallas_interpret()
    # measured dispatch policy: big-N fused SVGD/VI off unless forced
    from meta_learning_pacoh_tpu.ops.pallas.fused_svgd_bign_kernel import (
        svgd_bign_wins,
    )
    assert not svgd_bign_wins()


def _particles(m):
    return np.asarray(m.particles)


@pytest.mark.parametrize("ragged", [False, True])
def test_bign_kernel_matches_closed_form(ragged):
    """The mega-kernel trajectory (score -> transport -> Adam) against the
    closed-form spec over 3 steps, Adam moments included. The spec itself is
    pinned against jax.grad of meta_log_prob and the learner's jitted step
    in test_fused_svgd.py — this transitively anchors the blocked-linalg
    score section to the live learner objective at N=12 (Np=64)."""
    m = _build(_make_tasks(ragged=ragged))
    hp = m.hyper_prior
    n_steps = 3

    tr = FusedSVGDBigNTrainer(
        hp, m.particles, m.X, m.Y, m.mask, hidden=HIDDEN, lr=LR,
        prior_factor=PRIOR_FACTOR, weight_prior_std=WPS, bias_prior_std=BPS,
        interpret=True)
    tr.run(n_steps, 0)
    got = tr.particles()

    blocks = F.particles_to_blocks(hp, m.particles)
    mm = jax.tree.map(jnp.zeros_like, blocks)
    vv = jax.tree.map(jnp.zeros_like, blocks)
    for it in range(n_steps):
        blocks, mm, vv = F.svgd_step_closed_form(
            blocks, mm, vv, float(it), m.X, m.Y, m.mask,
            prior_factor=PRIOR_FACTOR, weight_prior_std=WPS,
            bias_prior_std=BPS, lr=LR, use_bisect_median=True)
    want = F.blocks_to_particles(hp, blocks)

    # early Adam steps act like sign(g): a coordinate whose transported
    # score sits at a sign boundary moves by O(lr) between two f32
    # evaluations of the same math (see test_fused_svgd.py)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=3e-4)

    m_flat = unpack_state(hp, tr.m, HIDDEN, K_PART)
    want_m = F.blocks_to_particles(hp, mm)
    np.testing.assert_allclose(np.asarray(m_flat), np.asarray(want_m),
                               rtol=0, atol=5e-4)


def test_learner_fused_matches_xla_and_chunking(monkeypatch):
    n_iter = 4

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    m_plain = _build(seed=31, n_iter=n_iter)
    assert not m_plain._fused_path_ok()
    m_plain.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    # big-N SVGD/VI fused dispatch is measured-off by default (svgd_bign_wins)
    monkeypatch.setenv("PACOH_TPU_FORCE_BIGN_FUSED", "1")
    m_fused = _build(seed=31, n_iter=n_iter)
    assert m_fused._fused_path_ok(), "N=12 must hit the big-N fused window"
    m_fused.meta_fit(verbose=False, log_period=n_iter, n_iter=n_iter)

    # the XLA learner path at N=12 runs the blocked Pallas MLL tier (its
    # own f32 rounding), so a handful of sign-boundary coordinates flip per
    # step between the two paths; the kernel itself is pinned to the
    # closed-form spec at 3e-4 above
    np.testing.assert_allclose(_particles(m_fused), _particles(m_plain),
                               rtol=0, atol=8e-3)

    # chunking determinism: 2 x 2 == 1 x 4 through the fused path
    m_chunked = _build(seed=31, n_iter=n_iter)
    m_chunked.meta_fit(verbose=False, log_period=2, n_iter=n_iter)
    np.testing.assert_array_equal(_particles(m_chunked), _particles(m_fused))

    # predict still works off the synced state
    x = np.linspace(-5, 5, 30)
    ctx_x = np.linspace(-4, 4, 8)
    ctx_y = np.sin(ctx_x) + 2
    mean, std = m_fused.predict(ctx_x, ctx_y, x)
    assert np.all(np.isfinite(mean)) and np.all(std > 0)


@pytest.mark.slow
def test_bign_fused_counted_matches_xla_trajectory(monkeypatch):
    """Sampled task batches through the big-N fused kernel == the XLA
    count-weighted step on the SAME fold_in/randint draws."""
    mt = _make_tasks(n_tasks=4)
    monkeypatch.setenv("PACOH_TPU_SVGD_WEIGHTED", "1")
    monkeypatch.setenv("PACOH_TPU_FORCE_PALLAS", "1")
    # big-N SVGD/VI fused dispatch is measured-off by default (svgd_bign_wins)
    monkeypatch.setenv("PACOH_TPU_FORCE_BIGN_FUSED", "1")
    m_f = _build(mt, seed=7, n_iter=6, task_batch_size=2)
    assert m_f._fused_path_ok()
    assert m_f._weight_by_counts()
    m_f.meta_fit(verbose=False, log_period=6, n_iter=6)

    monkeypatch.setenv("PACOH_TPU_DISABLE_PALLAS", "1")
    m_x = _build(mt, seed=7, n_iter=6, task_batch_size=2)
    assert not m_x._fused_path_ok()
    m_x.meta_fit(verbose=False, log_period=6, n_iter=6)
    monkeypatch.delenv("PACOH_TPU_DISABLE_PALLAS")

    np.testing.assert_allclose(_particles(m_f), _particles(m_x),
                               rtol=0, atol=1.5e-2)
