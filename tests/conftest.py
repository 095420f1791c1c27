"""Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware."""

import os

# Force CPU: the harness env pins JAX_PLATFORMS=axon (one real TPU via a
# tunnel), which is slow for eager test code and uses reduced-precision f32
# matmuls.  PALLAS_AXON_POOL_IPS must be cleared BEFORE interpreter start for
# the sitecustomize hook, so also drop the axon plugin registration guard.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Some pytest plugin imports jax before this conftest runs, freezing the
# env-var reads -- override through the config API as well.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REFERENCE = pathlib.Path("/root/reference")

sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def reference_dir():
    """Path to the PyTorch reference repo (oracle for parity tests)."""
    if not REFERENCE.exists():
        pytest.skip("reference repo not available")
    return REFERENCE
