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
