"""Test configuration: force CPU with 8 virtual devices for mesh tests.

Must set env vars before the first jax import anywhere in the test session.
"""

import os

# Tests must never grab the (single-client, tunneled) TPU. The axon
# sitecustomize hard-sets jax.config jax_platforms at interpreter start,
# so the env var alone is not enough — override the config knob too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
