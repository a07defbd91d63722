"""Confirm cmd 4 under the round-5 cmd-5 winner's duty factor.

The fine sweep found T=0.12/lam=0.44/h24 -> 5.03 m/s at cmd 5 (2500-step
protocol, runs/r5_wb_push5.log). Before shipping lam=0.44 for the whole
vx>=3.5 schedule band, measure cmd 4 at the same config (command is a
traced argument — the compiled rollout is reused).

Usage: python scripts/wb_confirm4_r5.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime, trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def main():
    cfg = config.test_default().replace(terrain=False, crucial=False,
                                        period=0.12, lam=0.44)
    mc = trot.MPCConfig(horizon=24, n_iter=2, model_substeps=2,
                        linearize_chunk=4, n_alphas=4, relin_every=1,
                        linearizer="frozen")
    for cmd in (4.0, 5.0):
        t0 = time.time()
        log = runtime.wb_mpc_rollout_chunked(
            cfg, mc, jnp.array([cmd, 0.0, 0.0]), jax.random.PRNGKey(0),
            2500, chunk=500)
        vb = np.asarray(ev.body_velocity(log))
        v = float(vb[1500:, 0].mean())
        falls = int(np.asarray(log.done).sum())
        cost = float(np.asarray(log.solve_cost)[-100:].mean())
        print(f"  cmd {cmd:.1f} T=0.12 lam=0.44 h=24 n=2500: v={v:+.2f} "
              f"falls={falls} cost~{cost:.2f} ({time.time()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
