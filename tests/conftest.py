"""Test harness: force an 8-virtual-device CPU backend before JAX initializes.

Multi-chip sharding tests (tests/test_parallel.py) need several devices; the
CI/dev box has at most one real chip, so every test runs on a virtual CPU mesh
(the same mechanism the driver uses for dryrun_multichip). NOTE: this box
pre-registers an 'axon' TPU plugin that ignores the JAX_PLATFORMS env var, so
the platform must also be pinned via jax.config before first backend use.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
# suite-private compile cache: CLI entry points under test call
# utils.profiling.enable_compile_cache(), and tests must never write the
# production .jax_cache concurrently with live TPU jobs (observed segfault
# in jax's cache serializer under concurrent same-dir writes)
os.environ.setdefault("IRRL_CACHE_DIR", ".jax_cache_tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
