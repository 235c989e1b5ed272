"""Test configuration.

Unit tests run on a virtual 8-device CPU mesh so sharding/collective code is
exercised without TPU hardware (the driver's multichip dry-run does the same).
Must run before the first `import jax` anywhere in the test process.
"""

import os

# The axon sitecustomize (PYTHONPATH=/root/.axon_site) imports jax at
# interpreter startup, so env vars like JAX_PLATFORMS/XLA_FLAGS are already
# frozen; jax.config updates still work.  Select an 8-device virtual CPU mesh.
# Subprocesses spawned by tests (CLI integration tests) get the cleaned env.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)  # stops sitecustomize TPU grab in children
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent
REFERENCE = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def testdata_dir():
    d = REFERENCE / "data" / "testdata"
    if not d.exists():
        pytest.skip("reference testdata not available")
    return d


@pytest.fixture(scope="session")
def goldens_dir():
    d = REPO / "tests" / "goldens"
    if not d.exists():
        pytest.skip("golden fixtures not generated (run tools/make_goldens.py)")
    return d
