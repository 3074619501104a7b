"""Test harness configuration.

All tests run in the parity regime: CPU backend (so float64/complex128 are
LAPACK-exact, matching the reference's numpy/scipy numerics for the 1e-10
fidelity-parity bar) with 8 virtual devices so the multi-chip sharding path
(`jax.sharding.Mesh` + shard_map) is exercised without TPU hardware.
"""

import os

# Must be set before the first CPU client is created.  Note: this container
# ships an axon sitecustomize that force-registers the remote-TPU platform in
# every interpreter; `jax.config.update("jax_platforms", ...)` below takes
# precedence over it (plain JAX_PLATFORMS env does not).
os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
