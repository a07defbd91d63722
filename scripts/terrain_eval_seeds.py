"""Multi-seed terrain tracking eval (round-4 VERDICT item 3 confirm).

The single-seed terrain numbers are segment-dependent — the rollout start
and heading pick a different stretch of the 500x20 m fractal heightmap per
PRNG key (sweep@key0 read 3.19 m/s at cmd 3 where the confirm@cli-key read
2.28), so the honest capability number is a seed ensemble: per command,
mean +- std over K independent rollouts, clean deployment physics
(manual command, no obs/action noise, no DR), trailing-40% window.

Usage: python scripts/terrain_eval_seeds.py [model_dir] [n_steps] [K] [cmds]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling

profiling.enable_compile_cache()

CFG = ("high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/"
       "bp5_relax_terrain.yaml")


def main():
    model = (sys.argv[1] if len(sys.argv) > 1
             else "artifacts/irrl_tpu_terrain_relaxed")
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    cmds = [float(c) for c in (sys.argv[4].split(",") if len(sys.argv) > 4
                               else ("1", "2", "3", "4"))]
    params = mio.load_bp5_csv(model)
    cfg = config.from_yaml(CFG).replace(
        manual=True, obs_noise=0.0, action_noise=0.0,
        stochastic_dynamics=False, crucial=False)
    sign = -1.0 if cfg.wildcat else 1.0
    skip = int(n_steps * 0.6)

    print(f"terrain seed-ensemble: {model}, {n_steps} steps, K={K}, "
          f"cmds {cmds}", flush=True)
    for vx in cmds:
        vs, falls = [], 0
        for k in range(K):
            log = ev.policy_rollout(cfg, params, jnp.array([vx, 0.0, 0.0]),
                                    jax.random.PRNGKey(k), n_steps)
            vb = sign * np.asarray(ev.body_velocity(log))[skip:, 0]
            vs.append(float(vb.mean()))
            falls += int(np.asarray(log.done).sum())
        vs = np.asarray(vs)
        print(f"cmd {vx:.1f}: v {vs.mean():.2f} +- {vs.std():.2f} "
              f"(min {vs.min():.2f}, max {vs.max():.2f}), falls={falls}/{K}",
              flush=True)


if __name__ == "__main__":
    main()
