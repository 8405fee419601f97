"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding is validated on a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8), per the multi-device
test strategy — real TPU topology is unavailable in CI.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The machine's sitecustomize registers the axon TPU backend and force-sets
# jax_platforms at interpreter boot; override it in-process so tests run on
# the 8-device virtual CPU mesh (fast compiles, deterministic).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib

import pytest

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def reference_data_dir():
    """The upstream repo's data directory (real CSV/GeoJSON fixtures).

    Tests using it validate against the reference's actual data artifacts;
    they skip when the reference checkout is not mounted.
    """
    d = REFERENCE_ROOT / "data"
    if not d.exists():
        pytest.skip("reference data not available")
    return d


@pytest.fixture(scope="session")
def reference_output_dir():
    d = REFERENCE_ROOT / "output"
    if not d.exists():
        pytest.skip("reference output not available")
    return d
