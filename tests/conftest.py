"""Test configuration: run all tests on a virtual 8-device CPU mesh.

The axon sitecustomize registers a TPU backend at interpreter start; tests
override to CPU (fast, deterministic, and lets us emulate an 8-device mesh
via --xla_force_host_platform_device_count).
"""

import os

# Must be set before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache (VERDICT r4 #8: the slow e2e files spend
# minutes re-compiling the same megastep graphs on this 2-core box;
# the cache cuts warm-run compile time to near zero). Keyed on backend
# + jaxlib version + HLO, so CPU test entries coexist with the TPU
# bench entries in the same directory.
import dynamic_vins_tpu  # noqa: E402

dynamic_vins_tpu.enable_compile_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
