"""Re-measure the speed-scheduled whole-body receding-horizon table.

Validates the closed-loop cmd 1-5 numbers after MPC-engine changes (e.g.
the terminal-knot reference fix: term_fn now tracks refs[T] instead of the
one-knot-stale refs[T-1]). Prints one line per command; compare against the
README table (0.93 / 1.86 / 2.88 / 3.94 / 4.66 m/s, zero falls —
round-3 post-terminal-knot-fix re-measure, scripts/wb_retune.py).

Usage: python scripts/wb_sched_eval.py [n_steps]
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
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    base = config.test_default()
    print("=== speed-scheduled whole-body RH iLQR, cmd 1-5 ===", flush=True)
    vs = []
    for cmd in (1.0, 2.0, 3.0, 4.0, 5.0):
        env_cfg, mc = runtime.wb_speed_schedule(base, cmd)
        t0 = time.time()
        log = runtime.wb_mpc_rollout(env_cfg, mc, jnp.array([cmd, 0.0, 0.0]),
                                     jax.random.PRNGKey(0), n_steps)
        vb = ev.body_velocity(log)
        v = float(vb[int(n_steps * 0.6):, 0].mean())
        falls = int(np.asarray(log.done).sum())
        cost = float(np.asarray(log.solve_cost)[-100:].mean())
        print(f"  cmd {cmd:.0f} T={env_cfg.period:.2f}: v={v:+.2f} "
              f"falls={falls} cost~{cost:.2f} ({time.time()-t0:.0f}s)",
              flush=True)
        vs.append(v)
    print("table: " + " / ".join(f"{v:.2f}" for v in vs), flush=True)


if __name__ == "__main__":
    main()
