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

# Persistent XLA compilation cache (VERDICT r4 item 6): repeated jit
# compiles dominate suite wall-clock on a 1-core host; a warm cache cuts
# the model-compile tests ~3x.  Per-host-fingerprint subdir makes the
# CPU AOT-code cache safe (see compcache._host_fingerprint); kill-switch
# is PYLC_COMPILATION_CACHE=off.  Worker subprocesses (mp_train_worker,
# CLI legs) inherit the cache through PYLC_COMPILATION_CACHE so they
# warm/reuse the same directory.
from pylc_tpu.utils.compcache import enable_compilation_cache  # noqa: E402

_cache_dir = enable_compilation_cache(allow_cpu=True)
if _cache_dir is not None:
    os.environ.setdefault("PYLC_COMPILATION_CACHE", os.path.dirname(
        _cache_dir) if os.path.basename(_cache_dir).startswith("cpu-")
        else _cache_dir)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
