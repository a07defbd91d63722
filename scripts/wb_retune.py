"""Re-tune the whole-body receding-horizon speed schedule post terminal-knot fix.

The 538befb terminal-knot fix (mpc/trot.make_problem: joint_ref_T = gait
reference at knot T, not T-1) shifted the MPC cost landscape; the previously
published cmd-4 schedule (T=0.20) now falls (runs/wb_sched.log before the
round-2 reset: cmd 4 -> 0.88 m/s, 2 falls). This script sweeps gait period
(and duty factor / iteration count where the period sweep alone is not
enough) at the broken commands, then re-measures the full cmd 1-5 table at
2500 steps (5 s) with the best schedule.

Usage: python scripts/wb_retune.py [n_sweep] [n_final]
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


def mk_mpc(n_iter=2):
    return trot.MPCConfig(horizon=16, n_iter=n_iter, model_substeps=2,
                          linearize_chunk=4, n_alphas=4, relin_every=1,
                          linearizer="frozen")


def run(cfg, mc, cmd, n_steps, tag=""):
    t0 = time.time()
    log = runtime.wb_mpc_rollout(cfg, mc, jnp.array([cmd, 0.0, 0.0]),
                                 jax.random.PRNGKey(0), n_steps)
    vb = ev.body_velocity(log)
    v = float(vb[int(n_steps * 0.6):, 0].mean())
    falls = int(np.asarray(log.done).sum())
    cost = float(np.asarray(log.solve_cost)[-100:].mean())
    print(f"  cmd {cmd:.1f} T={cfg.period:.2f} lam={cfg.lam:.2f} "
          f"it={mc.n_iter}{tag}: v={v:+.2f} falls={falls} cost~{cost:.2f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return v, falls


def main():
    n_sweep = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    n_final = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    base = config.test_default().replace(terrain=False, crucial=False)
    mc = mk_mpc()

    print("=== stage A: cmd-4 period x duty sweep (post-fix regression) ===",
          flush=True)
    results = {}
    for period, lam in ((0.20, 0.5), (0.16, 0.5), (0.14, 0.5), (0.12, 0.5),
                        (0.16, 0.42), (0.14, 0.42), (0.12, 0.42)):
        cfg = base.replace(period=period, lam=lam)
        v, falls = run(cfg, mc, 4.0, n_sweep)
        results[(period, lam, 2)] = (v, falls)

    best = max(results.items(),
               key=lambda kv: kv[1][0] - 100.0 * (kv[1][1] > 0))
    print(f"stage A best: T={best[0][0]} lam={best[0][1]} "
          f"v={best[1][0]:.2f} falls={best[1][1]}", flush=True)

    if best[1][0] < 3.5 or best[1][1] > 0:
        print("=== stage B: n_iter=3 at the two best configs ===", flush=True)
        top2 = sorted(results.items(),
                      key=lambda kv: -(kv[1][0] - 100.0 * (kv[1][1] > 0)))[:2]
        mc3 = mk_mpc(n_iter=3)
        for (period, lam, _), _ in top2:
            cfg = base.replace(period=period, lam=lam)
            v, falls = run(cfg, mc3, 4.0, n_sweep)
            results[(period, lam, 3)] = (v, falls)
        best = max(results.items(),
                   key=lambda kv: kv[1][0] - 100.0 * (kv[1][1] > 0))
        print(f"stage B best: T={best[0][0]} lam={best[0][1]} "
              f"it={best[0][2]} v={best[1][0]:.2f}", flush=True)

    (p4, l4, it4) = best[0]

    print("=== stage C: cmd-5 confirm (post-fix) ===", flush=True)
    c5 = {}
    for period, lam in ((0.14, 0.5), (0.12, 0.5), (0.12, 0.35)):
        cfg = base.replace(period=period, lam=lam)
        v, falls = run(cfg, mk_mpc(it4), 5.0, n_sweep)
        c5[(period, lam)] = (v, falls)
    (p5, l5) = max(c5, key=lambda k: c5[k][0] - 100.0 * (c5[k][1] > 0))
    print(f"stage C best cmd-5: T={p5} lam={l5} v={c5[(p5, l5)][0]:.2f}",
          flush=True)

    print("=== final: full speed-scheduled table (5 s) ===", flush=True)
    sched = {1.0: (0.20, 0.5, 2), 2.0: (0.20, 0.5, 2), 3.0: (0.14, 0.5, 2),
             4.0: (p4, l4, it4), 5.0: (p5, l5, it4)}
    vs = []
    for cmd, (period, lam, it) in sched.items():
        v, falls = run(base.replace(period=period, lam=lam), mk_mpc(it),
                       cmd, n_final, tag=" FINAL")
        vs.append((v, falls))
    print("schedule: " + str(sched), flush=True)
    print("table: " + " / ".join(f"{v:.2f}({f})" for v, f in vs), flush=True)


if __name__ == "__main__":
    main()
