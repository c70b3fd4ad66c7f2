"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
logic is exercised without TPU hardware.

Note: this image boots an ``axon`` TPU PJRT plugin from sitecustomize and
exports JAX_PLATFORMS=axon, so plain env vars are not enough — the platform
is forced through jax.config before any backend initializes.
"""

import os

# no persistent XLA compile cache by default under tests: the suite
# compiles hundreds of tiny throwaway programs (test_compile_cache.py
# exercises the cache explicitly, in subprocesses with their own dir)
os.environ.setdefault("AVCER_COMPILE_CACHE", "0")

platform = os.environ.get("AVCER_TEST_PLATFORM", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0)
