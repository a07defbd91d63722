"""Push the whole-body receding-horizon controller to >=4.8 m/s at cmd 5
(round-4 VERDICT item 6).

Round-3 schedule (wb_speed_schedule): T=0.14, lam=0.5, h16/2-iter frozen —
0.93/1.86/2.88/3.94/4.66 at cmd 1-5 zero falls. 4.66 = 93% of command; the
SRB engine closed the same regime with duty-factor scheduling (lam 0.42 /
0.35 at cmd 4-5, mpc/runtime.speed_schedule) and Raibert foothold
correction (srb.SRBConfig.raibert_gain) — both now available on the
whole-body side (trot.make_problem xy_shift, runtime.wb_mpc_rollout
raibert_gain).

Stage A sweeps (lam, raibert_gain, period) at cmd 5; stage B tries horizon
20/24 on the two best; stage C re-measures the full cmd 1-5 table at 2500
steps with the winner + the unchanged low-speed schedule.

Usage: python scripts/wb_push45.py [n_sweep] [n_final]
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


def mk_mpc(horizon=16, n_iter=2):
    return trot.MPCConfig(horizon=horizon, n_iter=n_iter, model_substeps=2,
                          linearize_chunk=4, n_alphas=4, relin_every=1,
                          linearizer="frozen")


def run(cfg, mc, cmd, n_steps, raibert=0.0):
    t0 = time.time()
    log = runtime.wb_mpc_rollout(cfg, mc, jnp.array([cmd, 0.0, 0.0]),
                                 jax.random.PRNGKey(0), n_steps,
                                 raibert_gain=raibert)
    vb = ev.body_velocity(log)
    v = float(vb[int(n_steps * 0.6):, 0].mean())
    falls = int(np.asarray(log.done).sum())
    cost = float(np.asarray(log.solve_cost)[-100:].mean())
    print(f"  cmd {cmd:.1f} T={cfg.period:.2f} lam={cfg.lam:.2f} "
          f"h={mc.horizon} rg={raibert:.2f}: v={v:+.2f} falls={falls} "
          f"cost~{cost:.2f} ({time.time()-t0:.0f}s)", flush=True)
    return v, falls


def score(v, falls):
    return v - 100.0 * (falls > 0)


def main():
    n_sweep = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    n_final = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    base = config.test_default().replace(terrain=False, crucial=False)

    print("=== stage A: cmd-5 (lam, raibert, period) sweep at h16 ===",
          flush=True)
    results = {}
    grid = [
        (0.14, 0.50, 0.00),   # round-3 shipped point (control)
        (0.14, 0.42, 0.00),
        (0.14, 0.35, 0.00),
        (0.14, 0.50, 0.03),
        (0.14, 0.42, 0.03),
        (0.12, 0.42, 0.00),
        (0.12, 0.35, 0.00),
        (0.12, 0.42, 0.03),
    ]
    mc = mk_mpc()
    for period, lam, rg in grid:
        cfg = base.replace(period=period, lam=lam)
        results[(period, lam, rg, 16)] = run(cfg, mc, 5.0, n_sweep, rg)

    top2 = sorted(results.items(), key=lambda kv: -score(*kv[1]))[:2]
    print(f"stage A top2: {[k for k, _ in top2]}", flush=True)

    print("=== stage B: horizon 20/24 on the top-2 ===", flush=True)
    for (period, lam, rg, _), _ in top2:
        for h in (20, 24):
            cfg = base.replace(period=period, lam=lam)
            results[(period, lam, rg, h)] = run(cfg, mk_mpc(h), 5.0,
                                                n_sweep, rg)

    best_key, best = max(results.items(), key=lambda kv: score(*kv[1]))
    period, lam, rg, h = best_key
    print(f"best cmd-5 config: T={period} lam={lam} rg={rg} h={h} "
          f"v={best[0]:.2f} falls={best[1]}", flush=True)

    print(f"=== stage C: full cmd 1-5 table at {n_final} steps ===",
          flush=True)
    for cmd in (1.0, 2.0, 3.0, 4.0, 5.0):
        if cmd < 2.5:
            cfg, mc_f, rg_f = base.replace(period=0.20, lam=0.5), mk_mpc(), 0.0
        elif cmd < 3.5:
            cfg, mc_f, rg_f = base.replace(period=0.14, lam=0.5), mk_mpc(), 0.0
        else:
            cfg = base.replace(period=period, lam=lam)
            mc_f, rg_f = mk_mpc(h), rg
        run(cfg, mc_f, cmd, n_final, rg_f)


if __name__ == "__main__":
    main()
