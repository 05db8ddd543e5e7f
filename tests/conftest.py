"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must run before jax initializes — this is the 'fake backend' for
multi-device tests the reference never had (SURVEY.md §4).

Note: the axon TPU sitecustomize force-registers the TPU backend whenever
PALLAS_AXON_POOL_IPS is set; clearing it lets JAX_PLATFORMS=cpu win.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

try:
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:
    # backend already initialized (e.g. pytest plugin imported jax first)
    pass
