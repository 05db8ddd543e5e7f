#!/usr/bin/env bash
# Reproducer for the full-suite single-process XLA:CPU segfault.
#
# Running every test tier in ONE process crashes near the end of the run
# (observed ~95% through, inside test_seed_parallel) with the fault inside
# XLA:CPU compilation (jax/_src/compiler.py backend_compile_and_load).
# Evidence it is a long-process XLA:CPU issue rather than a test bug:
#   - every test before the crash point passes in the same run;
#   - the crashing test passes standalone (~15 s) and in a 3-file tail
#     subset (test_parallel + test_reference_parity + test_seed_parallel);
#   - the per-file runner (tools/run_all_tests.sh) is fully green.
#
# This script re-runs the crashing configuration with faulthandler enabled
# so the native stack is dumped on SIGSEGV. Expect it to take ~25 min and
# (on affected containers) to die with a Python-level traceback of every
# thread. If it exits 0, the environment does not reproduce the issue.
set -u
cd "$(dirname "$0")/.."

export PALLAS_AXON_POOL_IPS=""
export JAX_PLATFORMS=cpu
export JAX_NUM_CPU_DEVICES="${JAX_NUM_CPU_DEVICES:-8}"
export PYTHONFAULTHANDLER=1

exec python -m pytest tests/ -m "" -q
