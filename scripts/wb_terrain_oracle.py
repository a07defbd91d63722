"""Oracle elevation-mapped wb-MPC on the fractal heightmap (round-5).

The flat-internal-model wb-RH controller fails on the 0.1-amplitude
training terrain (docs/evidence/wb_terrain_r5.md). This probe runs the
identified fix path: `terrain_model=True` passes the env's OWN heightmap
into the MPC model and the frozen linearizer (trot.make_dynamics /
linearize.make_frozen_linearizer terrain parameter) — the sim analogue of
the elevation-mapped MPC every hardware stack deploys. Same protocol as
the flat-model probe: 2500-step chunked rollouts, 3 seeds/cmd.

Usage: python scripts/wb_terrain_oracle.py [n_steps] [cmds] [z_scale]
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

CHUNK = 500


def mk_mpc(horizon=16, n_iter=2):
    return trot.MPCConfig(horizon=horizon, n_iter=n_iter, model_substeps=2,
                          linearize_chunk=4, n_alphas=4, relin_every=1,
                          linearizer="frozen")


def run(cfg, mc, cmd, n_steps, key):
    t0 = time.time()
    log = runtime.wb_mpc_rollout_chunked(
        cfg, mc, jnp.array([cmd, 0.0, 0.0]), key, n_steps, chunk=CHUNK,
        terrain_model=True)
    vb = np.asarray(ev.body_velocity(log))
    v = float(vb[int(n_steps * 0.6):, 0].mean())
    falls = int(np.asarray(log.done).sum())
    cost = float(np.asarray(log.solve_cost)[-100:].mean())
    print(f"  cmd {cmd:.1f} T={cfg.period:.2f} lam={cfg.lam:.2f} "
          f"h={mc.horizon} seed={int(jax.random.key_data(key)[-1])}: "
          f"v={v:+.2f} falls={falls} cost~{cost:.2f} "
          f"({time.time()-t0:.0f}s)", flush=True)
    return v, falls


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 2500
    cmds = [float(c) for c in (sys.argv[2].split(",") if len(sys.argv) > 2
                               else ("1", "2", "3"))]
    z = float(sys.argv[3]) if len(sys.argv) > 3 else 0.1
    base = config.test_default().replace(terrain=True, crucial=False,
                                         terrain_z_scale=z)

    print(f"=== ORACLE terrain-model wb-RH MPC (z_scale={z}), {n_steps} "
          f"steps (chunked x{CHUNK}), 3 seeds/cmd ===", flush=True)
    for cmd in cmds:
        if cmd < 2.5:
            cfg, mc = base.replace(period=0.20, lam=0.5), mk_mpc()
        elif cmd < 3.5:
            cfg, mc = base.replace(period=0.14, lam=0.5), mk_mpc()
        else:
            # the shipped high-speed schedule (lam=0.44 since the round-5
            # fine sweep; the first oracle cmd-4/5 capture predates it and
            # ran lam=0.42 — each row prints its own lam)
            cfg, mc = base.replace(period=0.12, lam=0.44), mk_mpc(24)
        for seed in (0, 1, 2):
            run(cfg, mc, cmd, n_steps, jax.random.PRNGKey(seed))


if __name__ == "__main__":
    main()
