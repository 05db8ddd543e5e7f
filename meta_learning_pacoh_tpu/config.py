"""Global runtime configuration for the TPU-native PACOH framework.

The reference pins a module-global torch device (reference: config.py:1-4).
Here the analogue is backend-dispatch policy: whether the hand-written Pallas
TPU kernels are used for the hot ops, or the plain XLA lowering. Tests on CPU
exercise the Pallas kernels in interpreter mode through the same switches.
"""

import os

import jax

# GP numerics (Gram construction, Cholesky backward, triangular solves) need
# true-f32 accumulation: TPU MXU's default bf16 matmul passes destroy the
# conditioning of N x N covariance matrices and NaN the factorization.
# The matrices here are small, so the f32 throughput cost is irrelevant.
jax.config.update("jax_default_matmul_precision", "highest")

# Default compute dtype for the GP core. The reference is float32 throughout
# (reference: meta_learn/abstract.py:109); Cholesky stability also wants f32.
DTYPE = "float32"

# Persistent XLA compilation cache: on tunneled/remote-compile TPU runtimes a
# single jit compile costs 20-260 s, so executables are cached on disk and
# survive process restarts (sweep trials, CLI reruns, bench). Only compiles
# above jax's default time threshold are written. TPU-only, and the gate
# FAILS CLOSED: XLA:CPU AOT artifacts embed host machine features and
# warn/SIGILL when reloaded on a different host, so the cache turns on only
# when a TPU runtime is positively detected (libtpu installed or
# JAX_PLATFORMS names tpu) — without initializing backends at import time.
# Override the location with PACOH_TPU_COMPILE_CACHE=<dir>, disable with
# PACOH_TPU_COMPILE_CACHE=off.
def _tpu_runtime_present():
    import importlib.util

    plat = os.environ.get("JAX_PLATFORMS", "").lower().strip()
    if plat:
        # Gate on the PRIMARY (first) requested platform: 'tpu,cpu' caches,
        # 'cpu' / 'cpu,tpu' does not. 'axon' is the tunneled-TPU plugin whose
        # client still reports platform 'tpu'.
        return plat.split(",")[0].strip() in ("tpu", "axon")
    if importlib.util.find_spec("libtpu") is None:
        return False
    # libtpu is importable but TPU init can still fail and silently fall back
    # to XLA:CPU, whose AOT artifacts are host-specific — resolve the
    # actually-selected backend before enabling the cache. (This initializes
    # backends at import time only in the ambiguous no-JAX_PLATFORMS +
    # libtpu-present case, where the process is about to use the TPU anyway;
    # CPU subprocesses set JAX_PLATFORMS=cpu and short-circuit above.)
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


_cache_dir = os.environ.get(
    "PACOH_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/pacoh_tpu_xla"))
if (_cache_dir and _cache_dir.lower() not in ("0", "off", "none", "false")
        and _tpu_runtime_present()):
    try:
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
    except (OSError, AttributeError):  # read-only FS / very old jax: run uncached
        pass

# Matrix-edge window where the Pallas Cholesky kernels beat XLA's
# factorization (measured on v5e: below 32 the per-call kernel-launch cost
# loses to XLA's inlined op inside compiled scans; above 64 the lane-parallel
# [N, N, 128] working set outgrows VMEM).
PALLAS_CHOL_MIN_N = 32
PALLAS_CHOL_MAX_N = 64


def _env_flag(name, default=False):
    val = os.environ.get(name)
    if val is None:
        return default
    return val.lower() not in ("0", "false", "no", "")


# Pallas kernels on: by default only when running on real TPU hardware.
# PACOH_TPU_FORCE_PALLAS=1 runs them in interpreter mode elsewhere (tests).
# PACOH_TPU_DISABLE_PALLAS=1 forces the pure-XLA path everywhere.
def pallas_enabled():
    if _env_flag("PACOH_TPU_DISABLE_PALLAS"):
        return False
    if _env_flag("PACOH_TPU_FORCE_PALLAS"):
        return True
    return jax.default_backend() == "tpu"


# PACOH_TPU_DISABLE_FUSED=1 turns off only the single-launch fused
# TRAINING mega-kernels (MAP/SVGD/VI/MLAP) while keeping the scoped
# linalg kernels (entry-tile MLL, blocked Cholesky/MLL) inside the XLA
# scan step — the round-3 default path. bench.py uses it to keep the
# blocked-in-scan continuity line next to the fused number.
def fused_enabled():
    return pallas_enabled() and not _env_flag("PACOH_TPU_DISABLE_FUSED")


def pallas_interpret():
    """Whether pallas_call should run in interpreter mode (non-TPU backends)."""
    return jax.default_backend() != "tpu"
