"""Push the closed-loop SRB-MPC past cmd 3 (round-2 known gap: falls at 4-5).

Hypothesis under test: the stance stride the schedule demands is
``v * lam * period`` (robot/gait.py:74) = 0.40 m at cmd 4 with the default
0.2 s gait period — beyond the ~0.43 m leg's horizontal reach at stand
height, so the gait skids/falls no matter what the force plan does. The
learned policy solves this implicitly; for the MPC the classic fix is
stride-frequency scaling (shorter period at speed), exactly what fast
quadrupeds do.

Stage A sweeps the gait period at cmd 4; stage B refines sweep_gain x
stand_height at cmd 4 and 5 with the best period; the winner gets a full
cmd 1-5 table for PARITY.

Usage: python scripts/mpc45.py [n_steps_sweep] [n_steps_final]
"""

import dataclasses
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

KEY = jax.random.PRNGKey(0)


def run(env_cfg, scfg, kwargs, cmd, n_steps):
    t0 = time.time()
    log = runtime.mpc_rollout(env_cfg, scfg, jnp.array([cmd, 0.0, 0.0]), KEY,
                              n_steps, **kwargs)
    vb = ev.body_velocity(log)
    v = float(vb[int(n_steps * 0.6):, 0].mean())
    falls = int(np.asarray(log.done).sum())
    print(f"  cmd {cmd:.0f} T={env_cfg.period:.2f} lam={env_cfg.lam:.2f} "
          f"h={env_cfg.stand_height:.2f} "
          f"gain={scfg.sweep_gain:.2f} -> v={v:+.2f} falls={falls} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return v, falls


def main():
    n_sweep = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    n_final = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    base_cfg, base_scfg, kwargs = runtime.high_speed_setup(config.test_default())

    print("=== stage A: gait period at cmd 4 ===", flush=True)
    best = (None, -1e9)
    for period in (0.20, 0.16, 0.14, 0.12, 0.10):
        ec = base_cfg.replace(period=period)
        v, falls = run(ec, base_scfg, kwargs, 4.0, n_sweep)
        score = v - 100.0 * (falls > 0)
        if score > best[1]:
            best = (period, score)
    period = best[0]
    print(f"stage A best period: {period}", flush=True)

    print("=== stage A2: duty factor (lam) at cmd 4 ===", flush=True)
    # lam < 0.5 inserts flight phases into the trot schedule: stance length
    # v*lam*period shrinks below the leg's reach AND the swing leg gets a
    # bigger fraction of the cycle to recirculate — what running quadrupeds
    # actually do past ~3.5 m/s. stance_mask/toe_targets both key off
    # cfg.lam, so the force schedule and the swing profile stay consistent.
    bestL = (0.5, -1e9)
    for lam in (0.5, 0.42, 0.35):
        ec = base_cfg.replace(period=period, lam=lam)
        v, falls = run(ec, base_scfg, kwargs, 4.0, n_sweep)
        score = v - 100.0 * (falls > 0)
        if score > bestL[1]:
            bestL = (lam, score)
    lam = bestL[0]
    print(f"stage A2 best lam: {lam}", flush=True)

    print("=== stage B: sweep_gain x stand_height at cmd 4/5 ===", flush=True)
    bestB = (None, -1e9)
    for gain in (1.15, 1.3, 1.45):
        for h in (0.26, 0.28):
            ec = base_cfg.replace(period=period, lam=lam, stand_height=h)
            sc = dataclasses.replace(base_scfg, sweep_gain=gain)
            v4, f4 = run(ec, sc, kwargs, 4.0, n_sweep)
            v5, f5 = run(ec, sc, kwargs, 5.0, n_sweep)
            score = v4 + v5 - 100.0 * (f4 > 0) - 100.0 * (f5 > 0)
            if score > bestB[1]:
                bestB = ((gain, h), score)
    gain, h = bestB[0]
    print(f"stage B best: gain={gain} stand_height={h}", flush=True)

    print("=== final: cmd 1-5 table ===", flush=True)
    ec = base_cfg.replace(period=period, lam=lam, stand_height=h)
    sc = dataclasses.replace(base_scfg, sweep_gain=gain)
    for cmd in (1.0, 2.0, 3.0, 4.0, 5.0):
        run(ec, sc, kwargs, cmd, n_final)


if __name__ == "__main__":
    main()
