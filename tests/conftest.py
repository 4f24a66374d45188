"""Test configuration: force CPU with 8 virtual devices so sharding tests can
exercise a multi-chip mesh without TPU hardware.

Note: this image's sitecustomize force-registers the axon TPU platform when
``PALLAS_AXON_POOL_IPS`` is set; clear it so JAX_PLATFORMS=cpu actually takes
effect (otherwise tests silently run on the single real TPU chip).
"""
import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# persistent XLA compilation cache: first run pays compile, reruns are fast
import jax

# sitecustomize may have force-registered the axon TPU platform (and set
# jax_platforms) before this conftest ran — override it explicitly
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu():
    assert jax.devices()[0].platform == "cpu", jax.devices()
