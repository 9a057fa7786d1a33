"""Test harness: force an 8-device virtual CPU platform BEFORE jax imports.

This is the TPU-native answer to fake distributed backends (SURVEY.md §4
item 5): the same pjit/shard_map code runs on a host-only 8-device mesh and
we assert sharded == single-device outputs.
"""

import os

# Force CPU even when the session env preselects a TPU platform (JAX_PLATFORMS
# =axon); set AVSUM_TEST_TPU=1 to run the suite on real hardware instead.
if not os.environ.get("AVSUM_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

if not os.environ.get("AVSUM_TEST_TPU"):
    # The axon TPU plugin ignores the env var; force the platform explicitly.
    jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the suite: the long tail of suite wall time
# is XLA compiles, and the CPU backend serializes executables, so repeat
# runs skip nearly all of it (a cold suite is ~2x a warm one on this host).
if not os.environ.get("AVSUM_TEST_NO_CACHE"):
    from avsum_tpu.utils.jaxcache import enable_compilation_cache

    enable_compilation_cache(
        os.path.join(os.path.dirname(__file__), os.pardir, ".cache", "xla_test")
    )
    # suite programs are small; persist even fast compiles — they are many
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)


@pytest.fixture(scope="session")
def mesh8():
    from avsum_tpu.parallel import MeshConfig, build_mesh

    return build_mesh(MeshConfig(data=4, seq=2, model=1, auto_data=False))


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    assert jax.default_backend() == "cpu", "tests must run on the CPU platform"
    assert len(jax.devices()) >= 8, "expected 8 virtual CPU devices"
