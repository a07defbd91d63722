"""Differentiable trajectory costs derived from the IRRL reward terms.

The DeepMimic product-of-exponentials rewards (Environment.hpp:1444-1548)
shape an RL objective; for trajectory optimization the same tracking terms are
expressed as smooth quadratics (the exp(-k e^2) rewards are monotone in the
same errors, so minimizing these costs maximizes those rewards):

    joint mimic      ||q - q_ref(t)||^2              <- JointReward
    joint-rate mimic ||qd - qd_ref(t)||^2            <- JointDotReward
    height           (z - stand_height)^2            <- BodyCenterReward
    attitude         ||rot_z[0:2]||^2                <- BodyAttitudeReward
    velocity         ||v_body - v_cmd||^2 + ||w - w_cmd||^2   <- VelocityReward
    torque (relax)   ||tau_pd / tau_limit||^2        <- TorqueReward
    control smooth   ||u_t - u_{t-1}||^2 (approximated by ||u|| around ref)

The imitation phase weights the mimic terms; the relaxation phase re-weights
toward velocity+torque — the same two-phase IRRL workflow (readme.md:64-75),
now as MPC cost presets.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.rotation import quat_to_matrix


@dataclasses.dataclass(frozen=True)
class CostWeights:
    joint: float = 10.0
    joint_dot: float = 0.02
    height: float = 40.0
    attitude: float = 20.0
    velocity: float = 2.0
    angular_velocity: float = 1.0
    torque: float = 0.02
    control: float = 0.1


def imitation_weights() -> CostWeights:
    """Imitation phase: mimic-dominated (JointRewardCoeff high)."""
    return CostWeights()


def relaxation_weights() -> CostWeights:
    """Relaxation phase: velocity/torque-dominated (readme.md:71-75 workflow)."""
    return CostWeights(joint=1.0, joint_dot=0.005, velocity=10.0,
                       angular_velocity=2.0, torque=0.2, control=0.2)


def stage_cost(cfg: EnvConfig, w: CostWeights, x: jnp.ndarray, u: jnp.ndarray,
               joint_ref: jnp.ndarray, joint_dot_ref: jnp.ndarray,
               command: jnp.ndarray) -> jnp.ndarray:
    """x = [gc(19); gv(18)], u = normalized action (PD target offset)."""
    gc, gv = x[:19], x[19:]
    q, qd = gc[7:], gv[6:]
    R = quat_to_matrix(gc[3:7])
    v_body = R.T @ gv[:3]
    w_body = R.T @ gv[3:6]
    v_ref = jnp.array([command[0], command[1], 0.0])
    w_ref = jnp.array([0.0, 0.0, command[2]])

    ptarget = u + mdl.stand_gc(cfg.abad)[7:]
    tau = cfg.stiffness * (ptarget - q) - cfg.damping * qd
    tau_n = tau / mdl.TORQUE_LIMIT_J

    c = (w.joint * jnp.sum((q - joint_ref) ** 2)
         + w.joint_dot * jnp.sum((qd - joint_dot_ref) ** 2)
         + w.height * (gc[2] - cfg.stand_height) ** 2
         + w.attitude * jnp.sum(R[2, :2] ** 2)
         + w.velocity * jnp.sum((v_body - v_ref) ** 2)
         + w.angular_velocity * jnp.sum((w_body - w_ref) ** 2)
         + w.torque * jnp.sum(tau_n ** 2)
         + w.control * jnp.sum(u ** 2))
    return c


def terminal_cost(cfg: EnvConfig, w: CostWeights, x: jnp.ndarray,
                  joint_ref: jnp.ndarray, command: jnp.ndarray) -> jnp.ndarray:
    gc, gv = x[:19], x[19:]
    R = quat_to_matrix(gc[3:7])
    v_body = R.T @ gv[:3]
    v_ref = jnp.array([command[0], command[1], 0.0])
    return (w.joint * jnp.sum((gc[7:] - joint_ref) ** 2)
            + w.height * (gc[2] - cfg.stand_height) ** 2
            + w.attitude * jnp.sum(R[2, :2] ** 2)
            + w.velocity * jnp.sum((v_body - v_ref) ** 2))
