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
# suite-private compile cache dir, kept away from the production .jax_cache
# (CLI entry points under test call utils.profiling.enable_compile_cache())
os.environ.setdefault("IRRL_CACHE_DIR", ".jax_cache_tests")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent-cache WRITES are disabled outright for the suite: serializing
# the receding-horizon MPC executable on the CPU backend segfaults inside
# jax's cache serializer (deterministic, test_srb::test_receding_horizon_
# mpc_trots, reproduced twice at isolated cache dirs — so NOT write
# contention). Tests recompile every run anyway; correctness needs no cache.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
