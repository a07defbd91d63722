"""Closed-loop MPC driver: run the model-based controllers in the env.

The reference repo has no trajectory-optimization controller at all (its
Convert2Torque hook, Environment.hpp:1629, is declared but never
implemented); this CLI drives the two engines this framework adds, with the
speed-scheduled gait configurations measured in round 2
(mpc/runtime.speed_schedule / wb_speed_schedule):

    irrl-mpc --engine srb --vx 3            # convex SRB trot-MPC loop
    irrl-mpc --engine wb  --vx 5            # whole-body receding-horizon iLQR
    irrl-mpc --engine wb --vx 4 --viewer out.html   # interactive 3D playback
    irrl-mpc --engine srb --commands 1,2,3,4,5      # tracking table

Prints the steady-state body velocity, fall count, and mean solve cost per
command; optionally exports the interactive viewer or the reference-format
robot-info CSV (--dump-info, readable by the paper's own figure scripts).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import runtime
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import profiling


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        prog="irrl-mpc", description="closed-loop MPC control in the "
        "BlackPanther env (SRB trot-MPC or whole-body iLQR)")
    p.add_argument("--engine", choices=("srb", "wb"), default="srb")
    p.add_argument("--vx", type=float, default=None,
                   help="single forward-velocity command [m/s]")
    p.add_argument("--commands", type=str, default=None,
                   help="comma-separated commands for a tracking table")
    p.add_argument("--steps", type=int, default=2500,
                   help="control steps per rollout (500 Hz)")
    p.add_argument("--cfg", type=str, default=None,
                   help="reference-format YAML (default: test config)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--viewer", type=str, default=None, metavar="OUT.html",
                   help="export interactive 3D playback of the last rollout")
    p.add_argument("--dump-info", type=str, default=None, metavar="OUT.csv",
                   help="export the last rollout in the reference's "
                   "info_trot CSV format")
    return p.parse_args(argv)


def _rollout(cfg, engine, vx, key, n_steps):
    cmd = jnp.array([vx, 0.0, 0.0])
    if engine == "srb":
        env_cfg, scfg, kwargs = runtime.speed_schedule(cfg, vx)
        log = runtime.mpc_rollout(env_cfg, scfg, cmd, key, n_steps, **kwargs)
    else:
        env_cfg, mpc_cfg = runtime.wb_speed_schedule(cfg, vx)
        if n_steps > 1200:
            # long rollouts go through the crash-safe chunked harness:
            # the h24 high-speed schedule hits the documented h>=20 x 2500
            # TPU trip-count fault as one monolithic scan
            # (docs/evidence/wb_table_r5.md; physics bit-identical)
            log = runtime.wb_mpc_rollout_chunked(env_cfg, mpc_cfg, cmd, key,
                                                 n_steps, chunk=500)
        else:
            log = runtime.wb_mpc_rollout(env_cfg, mpc_cfg, cmd, key, n_steps)
    return env_cfg, log


def main(argv=None):
    args = parse_args(argv)
    profiling.enable_compile_cache()
    cfg = (config.from_yaml(args.cfg) if args.cfg else config.test_default())

    if args.commands:
        cmds = [float(c) for c in args.commands.split(",")]
    else:
        cmds = [args.vx if args.vx is not None else 1.0]

    key = jax.random.PRNGKey(args.seed)
    env_cfg = log = None
    print(f"engine={args.engine} steps={args.steps} (500 Hz control)")
    for vx in cmds:
        env_cfg, log = _rollout(cfg, args.engine, vx, key, args.steps)
        vb = ev.body_velocity(log)
        skip = int(args.steps * 0.6)
        v = float(vb[skip:, 0].mean())
        falls = int(np.asarray(log.done).sum())
        cost = float(np.asarray(log.solve_cost)[-100:].mean())
        print(f"  cmd {vx:4.1f} m/s -> v {v:+5.2f} m/s  falls {falls}  "
              f"solve cost ~{cost:.2f}  (T={env_cfg.period:.2f}s "
              f"lam={env_cfg.lam:.2f})", flush=True)

    if args.viewer and log is not None:
        from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import viewer
        print(f"viewer: {viewer.write_html(env_cfg, log, args.viewer)}")
    if args.dump_info and log is not None:
        from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import rawdata
        from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import (
            dynamics as dyn,
            model as mdl,
        )
        gc, gv = np.asarray(log.gc), np.asarray(log.gv)
        tau = np.asarray(getattr(log, "torque", np.zeros((gc.shape[0], 12))))
        # MPC logs carry no contact flags; recover them from toe height
        params = mdl.nominal_params(env_cfg)
        kin = jax.jit(jax.vmap(lambda g: dyn.fk(params, g)))(jnp.asarray(gc))
        contact = (np.asarray(kin.toe_pos)[..., 2]
                   < mdl.TOE_RADIUS + 1e-3).astype(float)
        rawdata.dump_robot_info(args.dump_info, gc, gv, tau, contact)
        print(f"robot-info CSV: {args.dump_info}")


if __name__ == "__main__":
    main()
