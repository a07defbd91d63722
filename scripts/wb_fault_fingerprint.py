"""Minimal-repro characterization of the round-4 TPU kernel fault
(docs/evidence/wb_push_r4.md) — WITHOUT re-triggering it.

The faulting program is the monolithic `runtime.wb_mpc_rollout` scan at
horizon >= 20 x 2500 control steps (3/3 crashes); h16 x 2500 and
h24 x <= 1200 run clean. This script LOWERS (traces, host-side only —
never executes) the faulting and nearest non-faulting programs and prints
each module's StableHLO size, op histogram heads, and a content
fingerprint, so the fault can be reported/bisected against the toolchain
without crashing a worker.

Usage: python scripts/wb_fault_fingerprint.py   (CPU-pinned; safe anywhere)
"""

import hashlib
import os
import sys
from collections import Counter

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config  # noqa: E402
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime, trot  # noqa: E402


def mk_mpc(h):
    return trot.MPCConfig(horizon=h, n_iter=2, model_substeps=2,
                          linearize_chunk=4, n_alphas=4, relin_every=1,
                          linearizer="frozen")


def fingerprint(h, n_steps):
    cfg = config.test_default().replace(terrain=False, crucial=False,
                                        period=0.12, lam=0.42,
                                        manual=True, obs_noise=0.0,
                                        action_noise=0.0,
                                        stochastic_dynamics=False)
    # the faulting program is the single n_steps-length RH scan — today
    # that is exactly one `_wb_mpc_chunk` dispatch (wb_mpc_rollout is the
    # eager-init wrapper around it since the init-path unification)
    carry = runtime._wb_init_carry(cfg, mk_mpc(h), jnp.array([5.0, 0.0, 0.0]),
                                   jax.random.PRNGKey(0))
    lowered = runtime._wb_mpc_chunk.lower(
        cfg, mk_mpc(h), jnp.array([5.0, 0.0, 0.0]), carry, n_steps)
    text = lowered.as_text()
    ops = Counter(line.strip().split(" ", 2)[2].split("(")[0].strip('= "')
                  for line in text.splitlines()
                  if " = " in line and not line.strip().startswith("//"))
    top = ", ".join(f"{k}:{v}" for k, v in ops.most_common(8))
    sha = hashlib.sha256(text.encode()).hexdigest()[:16]
    status = "FAULTS" if (h >= 20 and n_steps >= 2500) else "clean"
    print(f"h={h:2d} n={n_steps:4d} [{status:6s}]: stablehlo "
          f"{len(text):>9,} B, sha256/16 {sha}, top ops {top}", flush=True)


def main():
    for h, n in ((16, 2500), (24, 1200), (20, 2500), (24, 2500)):
        fingerprint(h, n)


if __name__ == "__main__":
    main()
