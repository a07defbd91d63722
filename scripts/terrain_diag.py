"""Terrain speed-ceiling diagnosis (round-4 VERDICT item 3).

Round 3 measured the terrain-imitation policy at 0.63/1.12/1.12 m/s for
cmd 1/2/3 with ep_len ~400/750 — a plateau from cmd 2 up. This classifies
WHY episodes end on the heightmap: each done step is attributed to the
reference's three termination causes (gc_z < 0.15 | gc_z > 0.65 |
R_zz < 0.5, Environment.hpp:1553-1578 — all ABSOLUTE-z, exactly like the
reference, so low ground + body drop trips the floor term), plus the local
terrain height under the base at the moment of termination and the speed
profile between resets.

Usage: python scripts/terrain_diag.py <model_dir> [n_steps] [cmds]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as tr
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.rotation import (
    quat_to_matrix,
)

profiling.enable_compile_cache()

CFG = ("high_speed_quadrupedal_locomotion_by_irrl_tpu/configs/"
       "bp5_imitation_terrain.yaml")


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "artifacts/irrl_tpu_terrain_imitation"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 1500
    cmds = [float(c) for c in (sys.argv[3].split(",") if len(sys.argv) > 3
                               else ("1", "2", "3"))]
    params = mio.load_bp5_csv(model)
    cfg = config.from_yaml(CFG).replace(
        manual=True, obs_noise=0.0, action_noise=0.0,
        stochastic_dynamics=False, crucial=False)
    key = jax.random.PRNGKey(0)
    terrain = bp.env_init(cfg, key).terrain  # same key => the eval terrain

    for vx in cmds:
        log = ev.policy_rollout(cfg, params, jnp.array([vx, 0.0, 0.0]),
                                key, n_steps)
        gc = np.asarray(log.gc)
        done = np.asarray(log.done).astype(bool)
        z = gc[:, 2]
        hloc = np.asarray(jax.vmap(
            lambda x, y: tr.height(terrain, x, y))(jnp.asarray(gc[:, 0]),
                                                   jnp.asarray(gc[:, 1])))
        R = np.asarray(jax.vmap(quat_to_matrix)(jnp.asarray(gc[:, 3:7])))
        rzz = R[:, 2, 2]
        # terrain policies train with WILDCAT vx mirroring (the config sets
        # WILDCAT: True): forward progress is -x, like hard_contact_eval
        sign = -1.0 if cfg.wildcat else 1.0
        vb = sign * ev.body_velocity(log)[:, 0]
        idx = np.nonzero(done)[0]
        # termination state = the step BEFORE the auto-reset wrote new gc
        cause = {"z_low": 0, "z_high": 0, "posture": 0}
        det = []
        for i in idx:
            j = max(i - 1, 0)
            c = ("z_low" if z[j] < 0.17 else
                 "z_high" if z[j] > 0.6 else
                 "posture" if rzz[j] < 0.55 else "posture")
            cause[c] += 1
            det.append((int(i), round(float(z[j]), 3),
                        round(float(hloc[j]), 3), round(float(rzz[j]), 2),
                        round(float(vb[j]), 2)))
        seg_v = float(vb[int(n_steps * 0.6):].mean())
        print(f"cmd {vx:.1f}: v_tail={seg_v:+.2f} m/s, episodes ended "
              f"{len(idx)} (causes {cause}); terrain under path "
              f"[{hloc.min():+.2f}, {hloc.max():+.2f}] m; rel height "
              f"z-h in [{(z-hloc).min():.2f}, {(z-hloc).max():.2f}]",
              flush=True)
        for row in det[:10]:
            print(f"    done@t={row[0]} z={row[1]} h_loc={row[2]} "
                  f"Rzz={row[3]} vx={row[4]}", flush=True)


if __name__ == "__main__":
    main()
