"""Close the wb-MPC cmd-3 hole + confirm the speed-scheduled table.

wb_mpc_eval measured (runs/wb_mpc.log): the whole-body receding-horizon
iLQR holds cmd 1/2/4/5 (0.92/1.86/3.95/4.72 m/s, zero falls; cmd 5 at
T=0.14) but dips at cmd 3 with the default T=0.20 (0.40 m/s, 2 falls) — the
same transition-regime zone the reference's own relaxation training struggled
with (PARITY round-1 cmd-3 hole). Stage A sweeps the gait period at cmd 3;
the final stage re-runs the full speed-scheduled table with longer rollouts.

Usage: python scripts/wb_mpc_followup.py [n_steps_sweep] [n_steps_final]
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


def run(cfg, mc, cmd, n_steps):
    t0 = time.time()
    log = runtime.wb_mpc_rollout(cfg, mc, jnp.array([cmd, 0.0, 0.0]),
                                 jax.random.PRNGKey(0), n_steps)
    vb = ev.body_velocity(log)
    v = float(vb[int(n_steps * 0.6):, 0].mean())
    falls = int(np.asarray(log.done).sum())
    print(f"  cmd {cmd:.1f} T={cfg.period:.2f}: v={v:+.2f} falls={falls} "
          f"cost~{float(np.asarray(log.solve_cost)[-100:].mean()):.2f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return v, falls


def main():
    n_sweep = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    n_final = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    base = config.test_default().replace(terrain=False, crucial=False)
    mc = trot.MPCConfig(horizon=16, n_iter=2, model_substeps=2,
                        linearize_chunk=4, n_alphas=4, relin_every=1,
                        linearizer="frozen")

    print("=== stage A: gait period at cmd 3 (the T=0.20 dip) ===", flush=True)
    best = (None, -1e9)
    for period in (0.18, 0.16, 0.14):
        cfg = base.replace(period=period)
        v, falls = run(cfg, mc, 3.0, n_sweep)
        score = v - 100.0 * (falls > 0)
        if score > best[1]:
            best = (period, score)
    p3 = best[0]
    print(f"stage A best cmd-3 period: {p3}", flush=True)

    print("=== final: speed-scheduled wb-MPC table (5 s) ===", flush=True)
    sched = {1.0: 0.20, 2.0: 0.20, 3.0: p3, 4.0: 0.20, 5.0: 0.14}
    for cmd, period in sched.items():
        run(base.replace(period=period), mc, cmd, n_final)


if __name__ == "__main__":
    main()
