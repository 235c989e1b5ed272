"""Test configuration.

Unit tests run on a virtual 8-device CPU mesh so sharding/collective code is
exercised without TPU hardware (the driver's multichip dry-run does the same).
Must run before the first `import jax` anywhere in the test process.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

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
