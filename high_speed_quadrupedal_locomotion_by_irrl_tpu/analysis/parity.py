"""Control-sequence parity vs the shipped bp5_155 controller.

BASELINE.json's north star asks the trot-MPC to match the reference
controller's control sequence over the same horizon (<1e-2 MAE target).
This module measures that: run the bp5_155 LSTM closed-loop in this
framework's physics, take a mid-gait state, solve the trot-MPC from the same
state/command/gait-clock, and report the mean absolute error between the two
normalized control sequences (both are PD-target offsets in [-1, 1]).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import trot
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl


class ParityResult(NamedTuple):
    mae: float                  # mean |u_mpc - u_bp5| over horizon x 12
    torque_mae: float           # same in torque space, normalized by limits
    bp5_actions: np.ndarray     # (T, 12)
    mpc_actions: np.ndarray     # (T, 12)


def mpc_vs_bp5(cfg: EnvConfig, params, command_vx: float = 1.0,
               horizon: int = 50, warmup: int = 200,
               mpc_cfg: trot.MPCConfig | None = None,
               n_steps: int | None = None) -> ParityResult:
    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    mpc_cfg = mpc_cfg or trot.MPCConfig(horizon=horizon)
    n_steps = n_steps or (warmup + horizon + 1)
    command = jnp.array([command_vx, 0.0, 0.0])
    log = ev.policy_rollout(cfg, params, command, jax.random.PRNGKey(0), n_steps)

    gc0 = log.gc[warmup - 1]
    gv0 = log.gv[warmup - 1]
    t0 = jnp.asarray(warmup * cfg.control_dt)  # gait clock of the next action
    prob = trot.make_problem(cfg, gc0, gv0, command, t0, mpc_cfg.horizon)
    res = trot.solve(cfg, mpc_cfg, mdl.nominal_params(cfg), prob)

    bp5_u = np.asarray(log.action[warmup:warmup + mpc_cfg.horizon])
    mpc_u = np.clip(np.asarray(res.us), -1.0, 1.0)
    mae = float(np.abs(mpc_u - bp5_u).mean())

    # (torque-space block below uses the iLQR trajectory)

    # torque-space comparison via the shared PD law on the MPC's trajectory
    stand = np.asarray(mdl.stand_gc(cfg.abad)[7:])
    xs = np.asarray(res.xs)
    tau_mpc = cfg.stiffness * (mpc_u + stand - xs[:-1, 7:19]) - cfg.damping * xs[:-1, 19 + 6:]
    q_bp5 = np.asarray(log.gc[warmup:warmup + mpc_cfg.horizon, 7:])
    qd_bp5 = np.asarray(log.gv[warmup:warmup + mpc_cfg.horizon, 6:])
    tau_bp5 = cfg.stiffness * (bp5_u + stand - q_bp5) - cfg.damping * qd_bp5
    lim = np.asarray(mdl.TORQUE_LIMIT_J)
    torque_mae = float((np.abs(tau_mpc - tau_bp5) / lim).mean())
    return ParityResult(mae=mae, torque_mae=torque_mae,
                        bp5_actions=bp5_u, mpc_actions=mpc_u)


def srb_vs_bp5(cfg: EnvConfig, params, command_vx: float = 1.0,
               horizon: int = 50, warmup: int = 200) -> dict:
    """Same comparison with the high-rate convex SRB engine (mpc/srb.py):
    run bp5_155 closed-loop, take a mid-gait state, solve the SRB trot-MPC
    from it, compare the normalized control sequences over the horizon."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import srb

    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    command = jnp.array([command_vx, 0.0, 0.0])
    log = ev.policy_rollout(cfg, params, command, jax.random.PRNGKey(0),
                            warmup + horizon + 1)
    gc0 = log.gc[warmup - 1]
    gv0 = log.gv[warmup - 1]
    t0 = jnp.asarray(warmup * cfg.control_dt)
    prob = srb.make_problem(cfg, gc0, gv0, command, t0)
    res = srb.solve(cfg, srb.SRBConfig(horizon=horizon), prob)

    bp5_u = np.asarray(log.action[warmup:warmup + horizon])
    srb_u = np.clip(np.asarray(res.us), -1.0, 1.0)
    # per-leg swing/stance split: the SRB swing targets are the imitation
    # reference itself, so swing MAE isolates how far the POLICY strays
    # from the reference while stance MAE adds the force-admittance offset
    sm = np.stack([np.asarray(srb.stance_mask(cfg, t0 + i * cfg.control_dt))
                   for i in range(horizon)])                     # (T,4)
    mask = np.repeat(sm, 3, axis=1)                              # (T,12)
    diff = np.abs(srb_u - bp5_u)
    return {
        "mae": float(diff.mean()),
        "mae_stance": float(diff[mask > 0.5].mean()),
        "mae_swing": float(diff[mask < 0.5].mean()),
        "srb_actions": srb_u,
        "bp5_actions": bp5_u,
    }
