"""Whole-body MPC sustained solve rate in the PRODUCTION configuration.

Cold-start batch solves (scripts/bench_ilqr_vmap.py: 8 iterations, h50, from
a joint-reference guess) measure the wrong workload for the whole-body
engine: deployed MPC is receding-horizon — each control step warm-starts
from the previous plan and needs only 1-2 iterations at a short horizon
(runtime.wb_mpc_rollout, h16/it2: 0.93-4.66 m/s closed loop post terminal-knot re-tune, zero falls).
This benches a FLEET of those loops (runtime.wb_mpc_rollout_batch): one
chip serving B robots' MPC controllers in lock-step, reporting sustained
solves/s = B x steps / wall.

Usage: python scripts/bench_wb_rh.py [batch] [n_steps] [n_alphas] [n_iter] [chunk] [relin]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime, trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    n_alphas = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_iter = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    chunk = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    relin = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    cfg = config.test_default().replace(terrain=False, crucial=False)
    mc = trot.MPCConfig(horizon=16, n_iter=n_iter, model_substeps=2,
                        linearize_chunk=chunk, n_alphas=n_alphas,
                        relin_every=relin, linearizer="frozen")

    cmds = jnp.stack([jnp.array([0.5 + 2.5 * (i % 8) / 7.0, 0.0, 0.0])
                      for i in range(B)])
    keys = jax.random.split(jax.random.PRNGKey(0), B)

    t0 = time.time()
    logs = runtime.wb_mpc_rollout_batch(cfg, mc, cmds, keys, n_steps)
    jax.block_until_ready(logs.reward)
    compile_s = time.time() - t0
    t0 = time.time()
    logs = runtime.wb_mpc_rollout_batch(cfg, mc, cmds, keys, n_steps)
    jax.block_until_ready(logs.reward)
    dt = time.time() - t0
    rate = B * n_steps / dt
    falls = int(np.asarray(logs.done).sum())
    print(f"wb-RH fleet B={B} h16 it{n_iter} a{n_alphas} c{chunk} r{relin}: compile "
          f"{compile_s:.0f}s, {dt*1e3:.0f} ms for {n_steps} steps "
          f"({dt/n_steps*1e3:.1f} ms/control-step) = {rate:.0f} "
          f"warm-started solves/s; falls {falls}; mean cost "
          f"{float(np.asarray(logs.solve_cost).mean()):.2f}", flush=True)
    if (B, n_steps, n_alphas, n_iter, chunk, relin) == (128, 100, 4, 2, 16, 2):
        # exact config bench.py's wb-RH extra replays: mark the cache warm
        open(os.path.join(os.path.dirname(__file__), "..", ".wb_rh_ok"),
             "w").write(f"{rate:.0f}\n")


if __name__ == "__main__":
    main()
