"""Test configuration: run everything on a virtual 8-device CPU mesh.

The TPU container's sitecustomize registers the axon TPU backend at
*interpreter startup* — before any conftest code runs — whenever
PALLAS_AXON_POOL_IPS is set, and once that happens the CPU device count can
no longer be changed. So if the environment isn't already CPU-clean, re-exec
pytest with the right variables (this is the 'fake backend' for multi-device
tests the reference never had, SURVEY.md §4).
"""

import os
import sys

_WANTED = {
    "PALLAS_AXON_POOL_IPS": "",
    "JAX_PLATFORMS": "cpu",
    "JAX_NUM_CPU_DEVICES": "8",
}


def pytest_configure(config):
    if all(os.environ.get(k) == v for k, v in _WANTED.items()):
        return
    # restore real stdout/stderr before replacing the process, so the
    # re-exec'd pytest's output is visible
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    env = dict(os.environ)
    env.update(_WANTED)
    os.execve(sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env)


# ---------------------------------------------------------------- slow tier
#
# Tests that cost >~14 s on the virtual CPU mesh (long training loops or big
# XLA CPU compiles) are marked `slow` here in one tunable place, and the
# default run deselects them (pyproject.toml addopts). Full suite:
# `python -m pytest tests/ -m ""`. Every subsystem keeps fast-tier coverage.

_SLOW = {
    # test_parallel.py — sharded==unsharded parity (full training loops x2)
    "test_sharded_mlap_matches_unsharded",
    "test_sharded_learner_matches_unsharded",
    "test_sharded_map_matches_unsharded",
    "test_sharded_map_matches_unsharded_2d_mesh",
    "test_parallel_step_builder",
    "test_dryrun_multichip",
    # test_mlap.py — 2000-iter bound fits / 3000-step meta-test inference
    "test_bound_decreases",
    "test_meta_test_inference_and_eval",
    "test_ragged_tasks_train_and_eval",
    "test_prior_mean_runs",
    "test_masked_bound_matches_unpadded",
    "test_predict_shapes_and_ci",
    # test_dist_chol.py — unrolled shard_map compiles ([72-16] stays fast)
    "test_distributed_cholesky_matches_xla[256-32]",
    "test_distributed_mll_gradient_matches_xla_autodiff",
    "test_distributed_mll_matches_closed_form",
    "test_batched_distributed_mll_and_dispatch_match_xla",
    "test_map_learner_routes_large_n_through_distributed_tier",
    # test_learners.py — full training loops
    "test_full_cov_trains_finite",
    "test_elbo_decreases_diag",
    "test_state_dict_roundtrip_and_training_stays_in_sync[NN-NN]",
    "test_state_dict_roundtrip_and_training_stays_in_sync[constant-SE]",
    "test_seed_determinism_and_modes",
    "test_learning_improves_eval",
    "test_imq_kernel_runs",
    "test_confidence_intervals_ordered",
    "TestPACOHSVGD::test_seed_determinism",  # MAP's stays fast
    "test_meta_learning_beats_per_task_gp",
    "test_more_meta_train_tasks_improve_eval",
    # test_fused_map.py — fused-vs-XLA learner runs (kernel-level gradient/
    # loss/trajectory parity stays in the fast tier)
    "test_learner_fused_matches_xla_and_resumes",
    # test_multihost.py — spawns 2 real jax.distributed processes
    "test_two_process_global_mesh_matches_single_process",
    # test_fused_vi.py — fused-vs-XLA learner runs (spec/kernel/gate parity
    # stays in the fast tier)
    "test_vi_fused_learner_matches_xla_trajectory",
    "test_vi_fused_resume_and_chunking_deterministic",
    # test_fused_mlap.py — 3x 100-step learner fits / 4 fused learner fits
    "test_mlap_fused_learner_close_to_xla_within_chaos_bound",
    "test_mlap_fused_resume_and_chunking_deterministic",
    # test_fused_map_bign.py — heavy interpret-mode blocked-linalg runs
    # (loss/gradient/gate parity stays in the fast tier)
    "test_bign_kernel_trajectory_matches_xla_step",
    "test_multi_panel_gradient_matches_jax_grad",
    "test_bign_fused_counted_matches_xla_trajectory",
    # test_counted_batching.py — fused counted trajectories (the XLA
    # counted==gather equivalences stay fast)
    "test_svgd_fused_counted_matches_xla_trajectory",
    "test_vi_fused_counted_matches_xla_trajectory",
    # test_tuning_parallel.py — multi-fit continuation check
    "test_opt_state_writeback_supports_continued_training",
    # test_seed_parallel.py — vmapped multi-seed fits (big stacked compiles;
    # svgd/vi/maml/per-seed-data variants keep the fast-tier coverage)
    "test_seed_mesh_sharded_matches_unsharded",
    "test_seed_mesh_pads_non_divisible_model_count",
    "test_np_parallel_runs_and_matches",
    "test_map_parallel_matches_sequential",
    "test_mlap_parallel_matches_sequential",
    # test_ops.py — large masked-MLL grad sweep
    "test_grad_finite_and_masked_grad_matches",
    # module-grid sweeps / hyper-prior statistics / image NP trainer
    "test_meta_log_prob_prefactor",
    "test_mll_and_predict_run_all_module_combos",
    "test_trainer_reduces_loss_and_inpaints",
    "test_fit_improves_and_finite",
    "test_pacoh_map_training_golden",
    # test_reference_parity.py — float64 mirror across module grid
    "test_predict_matches_reference_math[NN-NN-both]",
    "test_predict_matches_reference_math[constant-SE-learn_kernel]",
    "test_single_particle_predictive_matches_randomgp_math",
    "test_confidence_intervals_match_normal_quantiles",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        cls = getattr(item, "cls", None)
        qualified = f"{cls.__name__}::{item.name}" if cls else item.name
        if item.name in _SLOW or qualified in _SLOW:
            item.add_marker(pytest.mark.slow)
