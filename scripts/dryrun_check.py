"""Local runner for __graft_entry__.dryrun_multichip on the 8-virtual-device
CPU mesh — exactly the driver's validation environment (conftest.py uses the
same mechanism). Prints per-shape wall time so the entry docstring's numbers
stay honest.

Usage: python scripts/dryrun_check.py [n_devices]
"""

import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
                               f" --xla_force_host_platform_device_count={n}")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import __graft_entry__ as ge  # noqa: E402


def main():
    t0 = time.time()
    ge._dryrun_one(n, envs_per_device=2, n_steps=4, nminibatches=2,
                   n_lstm=(8, 8), srb_horizon=4)
    t1 = time.time()
    print(f"toy shape ok in {t1 - t0:.0f}s", flush=True)
    ge._dryrun_one(n, envs_per_device=64, n_steps=25, nminibatches=4,
                   n_lstm=(48, 48), srb_horizon=50)
    print(f"production-like shape ok in {time.time() - t1:.0f}s", flush=True)


if __name__ == "__main__":
    main()
