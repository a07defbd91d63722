"""Test harness: force an 8-virtual-device CPU backend before JAX loads.

Multi-chip sharding tests (tests/test_parallel.py) need several devices; the
CI/dev box has at most one real chip, so every test runs on a virtual CPU mesh
(the same mechanism the driver uses for dryrun_multichip).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override (the box pre-sets axon/TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
