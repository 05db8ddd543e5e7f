"""Fused SVGD training step: closed-form math spec + Pallas mega-kernel.

Three layers of validation:
 1. the hand-derived block score (ops/fused_svgd_math.svgd_score_closed_form)
    against jax.grad of the live learner objective (meta_log_prob),
 2. the full closed-form step (score -> transport -> Adam) against the
    learner's own jitted scan step,
 3. the Pallas mega-kernel (ops/pallas/fused_train_kernel, interpret mode on
    CPU) against the closed-form spec over a multi-step trajectory.

Reference semantics being guarded: meta_learn/svgd.py:12-28 +
meta_learn/random_gp.py:194-222 (score of hyper-prior^prior_factor x task
MLLs, RBF median-heuristic transport, Adam on -phi).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from meta_learning_pacoh_tpu.datasets import SinusoidDataset
from meta_learning_pacoh_tpu import GPRegressionMetaLearnedSVGD
from meta_learning_pacoh_tpu.models.random_gp import meta_log_prob
from meta_learning_pacoh_tpu.ops import fused_svgd_math as F
from meta_learning_pacoh_tpu.ops.pallas.fused_train_kernel import (
    FusedSVGDTrainer,
    pack_state,
    state_names,
    unpack_state,
)

HIDDEN = (8, 8)
PRIOR_FACTOR = 0.01
WPS, BPS = 0.5, 3.0
LR = 1e-3


@pytest.fixture(scope="module")
def small_model():
    env = SinusoidDataset(random_state=np.random.RandomState(26))
    mt = env.generate_meta_train_data(n_tasks=4, n_samples=5)
    m = GPRegressionMetaLearnedSVGD(
        mt, num_iter_fit=100, num_particles=4, random_seed=30,
        prior_factor=PRIOR_FACTOR, task_batch_size=-1,
        mean_nn_layers=HIDDEN, kernel_nn_layers=HIDDEN,
        weight_prior_std=WPS, bias_prior_std=BPS, lr=LR,
    )
    return m


def test_pack_unpack_roundtrip(small_model):
    m = small_model
    packed = pack_state(m.hyper_prior, m.particles, HIDDEN)
    rt = unpack_state(m.hyper_prior, packed, HIDDEN, m.num_particles)
    np.testing.assert_allclose(np.asarray(rt), np.asarray(m.particles),
                               rtol=0, atol=0)


def test_closed_form_score_matches_jax_grad(small_model):
    m = small_model
    hp = m.hyper_prior
    blocks = F.particles_to_blocks(hp, m.particles)
    score, obj = F.svgd_score_closed_form(
        blocks, m.X, m.Y, m.mask, prior_factor=PRIOR_FACTOR,
        weight_prior_std=WPS, bias_prior_std=BPS)

    def total(p):
        return jnp.sum(meta_log_prob(hp, PRIOR_FACTOR, p, m.X, m.Y, m.mask))

    g_flat = jax.grad(total)(m.particles)
    g_blocks = F.particles_to_blocks(hp, g_flat)
    obj_want = meta_log_prob(hp, PRIOR_FACTOR, m.particles, m.X, m.Y, m.mask)

    for got, want in zip(jax.tree.leaves(score), jax.tree.leaves(g_blocks)):
        scale = max(float(jnp.max(jnp.abs(want))), 1e-3)
        # f32 noise floor: near-zero leaves (e.g. the noise_raw gradient,
        # a cancellation of alpha^2 against Kinv diagonals of magnitude ~1)
        # carry absolute rounding error independent of the leaf scale
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=0, atol=2e-4 * scale + 5e-5)
    np.testing.assert_allclose(np.asarray(obj), np.asarray(obj_want),
                               rtol=1e-4, atol=1e-4)


def test_closed_form_step_matches_learner(small_model):
    m = small_model
    hp = m.hyper_prior
    n_steps = 3

    particles, opt_state, _ = m._step_fn(
        m.particles, m.opt_state, m.X, m.Y, m.mask,
        m._train_key, 0, n_steps)

    blocks = F.particles_to_blocks(hp, m.particles)
    mm = jax.tree.map(jnp.zeros_like, blocks)
    vv = jax.tree.map(jnp.zeros_like, blocks)
    for it in range(n_steps):
        blocks, mm, vv = F.svgd_step_closed_form(
            blocks, mm, vv, float(it), m.X, m.Y, m.mask,
            prior_factor=PRIOR_FACTOR, weight_prior_std=WPS,
            bias_prior_std=BPS, lr=LR, use_bisect_median=False)
    want = F.blocks_to_particles(hp, blocks)

    # early Adam steps act like sign(g): f32 noise at a sign boundary moves
    # a coordinate by O(lr), so the tolerance is a few lr-quanta
    np.testing.assert_allclose(np.asarray(particles), np.asarray(want),
                               rtol=0, atol=3e-4)


def test_fused_kernel_matches_closed_form(small_model):
    m = small_model
    hp = m.hyper_prior
    n_steps = 3

    tr = FusedSVGDTrainer(
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

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=5e-5)

    # Adam moments round-trip through the packed layout too
    m_flat = unpack_state(hp, tr.m, HIDDEN, m.num_particles)
    want_m = F.blocks_to_particles(hp, mm)
    np.testing.assert_allclose(np.asarray(m_flat), np.asarray(want_m),
                               rtol=0, atol=5e-5)
