"""Test harness: force genuine CPU with 8 virtual devices so tests are
hermetic and multi-chip sharding tests run without TPU hardware.

NOTE the container's sitecustomize imports jax and pins jax_platforms to the
'axon' TPU-tunnel backend in every python process; setting JAX_PLATFORMS in
the environment here is too late. The authoritative override is the config
update below (config beats env once jax is imported)."""
import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"  # for any subprocesses tests may spawn

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

REFERENCE = "/root/reference"

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def reference_path():
    """Make the reference PyTorch implementation importable (read-only; used
    only as a numerical oracle in parity tests)."""
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    return REFERENCE
