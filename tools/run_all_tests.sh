#!/usr/bin/env bash
# ONE command that runs the ENTIRE test suite (fast + slow tiers) green.
#
#   bash tools/run_all_tests.sh
#
# Why not plain `pytest tests/ -m ""`: running every tier in a single
# process segfaults near the end of the run inside XLA:CPU compilation
# (jax/_src/compiler.py backend_compile_and_load) — a long-process XLA:CPU
# issue, not a test bug: each crashing test passes standalone and in small
# subsets (see tools/repro_xla_cpu_crash.sh for the reproducer and
# STATUS.md for the full diagnosis). This wrapper is the supported CI
# entrypoint (reference analog: one-command Travis run,
# /root/reference/.travis.yml:14):
#   1. fast tier (default deselection) in one process — known stable;
#   2. slow tier per-file in fresh processes, so no single process
#      accumulates enough XLA:CPU compilations to hit the crash.
#
# Exits 0 iff every tier is green. Env is forced CPU-clean up front so the
# conftest re-exec never fires (the axon TPU plugin grabs the process at
# interpreter startup otherwise).
set -u
cd "$(dirname "$0")/.."

export PALLAS_AXON_POOL_IPS=""
export JAX_PLATFORMS=cpu
export JAX_NUM_CPU_DEVICES="${JAX_NUM_CPU_DEVICES:-8}"

fail=0

echo "=== fast tier: pytest tests/ (one process) ==="
python -m pytest tests/ -q || fail=1

echo
echo "=== slow tier: per-file fresh processes (-m slow) ==="
for f in tests/test_*.py; do
    python -m pytest "$f" -q -m slow
    rc=$?
    # pytest exit 5 = "no tests collected": file has no slow tests — fine.
    if [ "$rc" -ne 0 ] && [ "$rc" -ne 5 ]; then
        echo "FAILED: $f (exit $rc)"
        fail=1
    fi
done

echo
if [ "$fail" -eq 0 ]; then
    echo "ALL TIERS GREEN"
else
    echo "SUITE FAILED"
fi
exit "$fail"
