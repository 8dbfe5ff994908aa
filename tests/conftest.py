"""Test harness config: CPU backend with a virtual 8-device mesh.

Must run before jax is imported anywhere: forces the CPU platform (tests
never need the real TPU) and fakes 8 devices so multi-chip sharding paths
compile+execute without a pod — the JAX-native "multi-node without a
cluster" strategy (SURVEY.md §4).  Also enables the persistent compilation
cache: this host has a single CPU core, so re-compiles dominate test time
otherwise.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize overrides JAX_PLATFORMS via
# jax.config at interpreter start; config beats env, so force CPU the
# same way (otherwise every "CPU" test silently runs on the tunneled TPU).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax-med-tpu-tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_key():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="session")
def np_rng():
    return np.random.RandomState(0)
