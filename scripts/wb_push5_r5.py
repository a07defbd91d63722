"""Round-5 stretch: push the verified cmd-5 whole-body number past 4.94.

Fine sweep around the verified winner (T=0.12, lam=0.42, h=24 -> 4.94 at
2500 steps, docs/evidence/wb_table_r5.md): neighboring periods/duty
factors and a longer horizon, 1200-step screening rows, then the best
config (if it beats the incumbent's 1200-step reading of 4.90) re-measured
at the 2500-step protocol on the chunked harness.

Usage: python scripts/wb_push5_r5.py [n_screen] [n_final]
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


def mk_mpc(horizon, n_iter=2):
    return trot.MPCConfig(horizon=horizon, n_iter=n_iter, model_substeps=2,
                          linearize_chunk=4, n_alphas=4, relin_every=1,
                          linearizer="frozen")


def run(cfg, mc, n_steps):
    t0 = time.time()
    log = runtime.wb_mpc_rollout_chunked(
        cfg, mc, jnp.array([5.0, 0.0, 0.0]), jax.random.PRNGKey(0),
        n_steps, chunk=min(500, n_steps))
    vb = np.asarray(ev.body_velocity(log))
    v = float(vb[int(n_steps * 0.6):, 0].mean())
    falls = int(np.asarray(log.done).sum())
    cost = float(np.asarray(log.solve_cost)[-100:].mean())
    print(f"  T={cfg.period:.2f} lam={cfg.lam:.2f} h={mc.horizon} "
          f"n={n_steps}: v={v:+.2f} falls={falls} cost~{cost:.2f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return v, falls


def score(v, falls):
    return v - 100.0 * (falls > 0)


def main():
    n_screen = int(sys.argv[1]) if len(sys.argv) > 1 else 1200
    n_final = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    base = config.test_default().replace(terrain=False, crucial=False)

    grid = [
        (0.12, 0.42, 24),   # incumbent (verified 4.94 @ 2500)
        (0.11, 0.42, 24),
        (0.13, 0.42, 24),
        (0.12, 0.40, 24),
        (0.12, 0.44, 24),
        (0.12, 0.38, 24),
        (0.12, 0.42, 28),
        (0.11, 0.40, 24),
        (0.12, 0.40, 28),
    ]
    print(f"=== cmd-5 fine sweep ({n_screen}-step screens) ===", flush=True)
    results = {}
    for T, lam, h in grid:
        cfg = base.replace(period=T, lam=lam)
        results[(T, lam, h)] = run(cfg, mk_mpc(h), n_screen)

    (T, lam, h), best = max(results.items(), key=lambda kv: score(*kv[1]))
    print(f"best screen: T={T} lam={lam} h={h} v={best[0]:.2f} "
          f"falls={best[1]}", flush=True)
    if (T, lam, h) == (0.12, 0.42, 24):
        print("incumbent wins the screen; verified table stands", flush=True)
        return
    print(f"=== confirm at {n_final} steps (chunked) ===", flush=True)
    run(base.replace(period=T, lam=lam), mk_mpc(h), n_final)


if __name__ == "__main__":
    main()
