"""SRB trot-MPC throughput vs batch size: the headline solver's scaling
curve on one chip (solves/s at batch 256..8192, horizon 50).

The north star is >=1024 solves/s/chip (BASELINE.json); round 1 measured
12.8k at batch 1024. This sweep shows where the per-chip curve saturates —
the number that sets how many chips a production fleet of receding-horizon
controllers actually needs.

Usage: python scripts/bench_srb_sweep.py [horizon] [batch,batch,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import srb
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def main():
    horizon = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    cfg = config.test_default()
    scfg = srb.SRBConfig(horizon=horizon)
    batches = (tuple(int(b) for b in sys.argv[2].split(","))
               if len(sys.argv) > 2 else (256, 1024, 4096, 8192))
    for batch in batches:
        cmds = jnp.stack([jnp.array([1.0 + 4.0 * (i % 17) / 16.0, 0.0, 0.0])
                          for i in range(batch)])
        t0s = jnp.arange(batch) * 0.003
        probs = jax.vmap(lambda c, t: srb.standing_problem(cfg, c, t))(cmds, t0s)
        solve = jax.jit(lambda p: srb.batched_solve(cfg, scfg, p).cost)
        t0 = time.time()
        cost = solve(probs)
        jax.block_until_ready(cost)
        compile_s = time.time() - t0
        n = 10
        t0 = time.time()
        for _ in range(n):
            cost = solve(probs)
        jax.block_until_ready(cost)
        dt = (time.time() - t0) / n
        print(f"batch {batch:5d}: compile {compile_s:5.0f}s  "
              f"run {dt*1e3:7.2f} ms  {batch/dt:9.0f} solves/s  "
              f"mean cost {float(cost.mean()):.3f}", flush=True)


if __name__ == "__main__":
    main()
