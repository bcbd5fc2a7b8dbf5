"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding (data-parallel training, sync-BN psum, sharded
stitch) is validated on a virtual 8-device CPU backend — the same
mechanism the driver uses for dryrun_multichip — so the suite runs
anywhere without TPUs.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# This image preloads jax with an 'axon' (tunneled TPU) platform via
# sitecustomize and pins JAX_PLATFORMS=axon in the env; running the unit
# suite over the tunnel is ~100x slower than local CPU.  jax is imported
# but the backend is not yet initialized here, so the config update wins.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
