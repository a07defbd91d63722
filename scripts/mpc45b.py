"""Round-2 follow-up to scripts/mpc45.py: cmd-5 refinement + the
speed-scheduled final table.

mpc45 findings (runs/mpc45.log): stride-frequency + duty scheduling unlocks
cmd 4 — T=0.12 s, lam=0.42, h=0.30 reaches 2.95 m/s with zero falls (vs 0.74
and 4 falls at the default T=0.20 trot) — but (a) the greedy stage-B sweep
dropped stand_height to 0.26 and lost ground, and (b) no config tried holds
cmd 5. Real quadruped stacks don't run one gait config at all speeds; they
schedule stride frequency with commanded speed. So:

  stage C: cmd-5-focused grid around the cmd-4 winner;
  final:   per-command best-known configs (the speed-scheduled controller),
           5 s rollouts, reported as the PARITY table.

Usage: python scripts/mpc45b.py [n_steps_sweep] [n_steps_final]
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
          f"h={env_cfg.stand_height:.2f} gain={scfg.sweep_gain:.2f} "
          f"-> v={v:+.2f} falls={falls} ({time.time()-t0:.0f}s)", flush=True)
    return v, falls


def main():
    n_sweep = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    n_final = int(sys.argv[2]) if len(sys.argv) > 2 else 2500
    base_cfg, base_scfg, kwargs = runtime.high_speed_setup(config.test_default())

    print("=== stage C: cmd-5 grid around the cmd-4 winner ===", flush=True)
    bestC = (None, -1e9)
    for period, lam in ((0.12, 0.42), (0.10, 0.42), (0.12, 0.35), (0.10, 0.35)):
        for h in (0.30, 0.28):
            for gain in (1.0, 1.15, 1.3):
                ec = base_cfg.replace(period=period, lam=lam, stand_height=h)
                sc = dataclasses.replace(base_scfg, sweep_gain=gain)
                v5, f5 = run(ec, sc, kwargs, 5.0, n_sweep)
                score = v5 - 100.0 * (f5 > 0)
                if score > bestC[1]:
                    bestC = ((period, lam, h, gain), score)
    period, lam, h, gain = bestC[0]
    print(f"stage C best: T={period} lam={lam} h={h} gain={gain}", flush=True)

    # per-command schedule: defaults (cmd<=3) -> cmd-4 winner -> cmd-5 winner
    print("=== final: speed-scheduled cmd 1-5 table (5 s rollouts) ===",
          flush=True)
    cmd4_cfg = (base_cfg.replace(period=0.12, lam=0.42, stand_height=0.30),
                dataclasses.replace(base_scfg, sweep_gain=1.3))
    cmd5_cfg = (base_cfg.replace(period=period, lam=lam, stand_height=h),
                dataclasses.replace(base_scfg, sweep_gain=gain))
    sched = {1.0: (base_cfg, base_scfg), 2.0: (base_cfg, base_scfg),
             3.0: (base_cfg, base_scfg), 4.0: cmd4_cfg, 5.0: cmd5_cfg}
    for cmd, (ec, sc) in sched.items():
        run(ec, sc, kwargs, cmd, n_final)


if __name__ == "__main__":
    main()
