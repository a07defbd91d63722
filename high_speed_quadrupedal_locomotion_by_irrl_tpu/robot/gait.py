"""Bezier gait reference generation (the ManualTraj mode).

Pure-jnp re-expression of ``gait_generator_manual`` (Environment.hpp:1756-1890)
and its trajectory-shaping helpers (cubicBezier :86-91, gauss :96-99,
Bezier2 :104-113): per-leg phase offsets, a stance sweep between symmetric
Bezier endpoints at -stand_height, a swing arc with a Gaussian apex, and
analytic IK into joint references. Branch-free (`where` selects stance/swing)
so the whole generator lives inside the jitted env step and vmaps over
environments and commands.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys.model import EE_OFFSET_J, L_HIP
from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot.kinematics import legs_ik

# front legs sweep (+), hind legs (-) for the yaw component (Environment.hpp:1848)
_ANTI_FLAG = jnp.asarray(np.array([1.0, 1.0, -1.0, -1.0]))


class GaitRef(NamedTuple):
    joint_ref: jnp.ndarray  # (12,)
    toe: jnp.ndarray        # (4,3) toe targets in hip frames (pre hip-offset)
    ee_ref: jnp.ndarray     # (12,) end-effector reference relative to body center


def _bezier_blend(phase: jnp.ndarray) -> jnp.ndarray:
    """cubicBezier's smooth blend: phi^3 + 3 phi^2 (1-phi)."""
    return phase ** 3 + 3.0 * phase ** 2 * (1.0 - phase)


def _gauss(x: jnp.ndarray, width: float, height: jnp.ndarray) -> jnp.ndarray:
    s = width / 6.0
    return height * jnp.exp(-((x - width / 2) ** 2) / (2 * s * s))


def swing_up_height(cfg: EnvConfig, command: jnp.ndarray) -> jnp.ndarray:
    """HeightVariable scaling of the swing apex (Environment.hpp:1779-1792)."""
    if not cfg.height_variable:
        return jnp.asarray(cfg.up_height)
    ratio = jnp.abs(command[0]) / cfg.vx_max
    if cfg.vy_max > 0:
        ratio = jnp.maximum(ratio, jnp.abs(command[1]) / cfg.vy_max)
    if cfg.omega_max > 0:
        ratio = jnp.maximum(ratio, jnp.abs(command[2] / cfg.omega_max))
    return jnp.where(ratio > 0.1, cfg.up_height, ratio * cfg.up_height)


def toe_targets(cfg: EnvConfig, command: jnp.ndarray, t: jnp.ndarray,
                touchdown_match: bool = False) -> jnp.ndarray:
    """(4,3) toe positions in the hip frames at absolute gait time t.

    touchdown_match=False is the reference's generator exactly
    (gait_generator_manual, Environment.hpp:1756-1890): cubic-Bezier stance
    sweep with ease-in/out and a swing arc whose relative velocity is zero
    at touchdown. That profile makes every touchdown skid at ~body speed
    (the foot lands moving with the body, and the eased stance start delays
    the backward sweep) — the learned policy compensates by deviating from
    the reference, but a model-based controller tracking it is
    friction-limited near 2 m/s.

    touchdown_match=True is the MPC-grade profile: a *linear* stance sweep
    (constant backward rate = ground-speed-matched when paced at the body
    velocity) and a late-swing retraction that brings the foot's relative
    velocity to the stance rate at touchdown (classic swing-leg retraction).
    Only the MPC runtime uses it; the env's imitation reference is untouched.
    """
    gait_step = command[0] * cfg.lam * cfg.period
    if cfg.wildcat:
        gait_step = -gait_step
    side_step = command[1] * cfg.lam * cfg.period
    rot_step = command[2] * cfg.period * 0.4
    up = swing_up_height(cfg, command)

    phase = jnp.mod(t + jnp.asarray(cfg.phase_offsets) * cfg.period, cfg.period) / cfg.period
    half = jnp.stack([
        jnp.broadcast_to(gait_step / 2.0, (4,)),
        side_step / 2.0 + _ANTI_FLAG * rot_step / 2.0,
        jnp.full((4,), -cfg.stand_height),
    ], axis=-1)                                        # (4,3) "forward" endpoint
    p_fwd = half
    p_back = jnp.stack([-half[:, 0], -half[:, 1], half[:, 2]], axis=-1)

    in_stance = phase < cfg.lam
    r_st = phase / cfg.lam
    r_sw = (phase - cfg.lam) / (1.0 - cfg.lam)
    # stance: fwd -> back; swing: back -> fwd with gaussian apex in z
    if touchdown_match:
        b_st = jnp.clip(r_st, 0.0, 1.0)[:, None]       # linear, constant rate
    else:
        b_st = _bezier_blend(r_st)[:, None]
    toe_st = p_fwd + b_st * (p_back - p_fwd)
    b_sw = _bezier_blend(r_sw)[:, None]
    toe_sw_xy = p_back[:, :2] + b_sw * (p_fwd[:, :2] - p_back[:, :2])
    if touchdown_match:
        # late-swing retraction: parabolic offset over the last 20% of swing
        # whose d/dphase at touchdown equals the stance sweep's phase rate
        # -(p_fwd - p_back)*(1-lam)/lam, so the foot arrives already moving
        # with the ground (position shift at touchdown: half that * 0.2)
        u = jnp.clip((r_sw - 0.8) / 0.2, 0.0, 1.0)[:, None]
        rate = (p_fwd[:, :2] - p_back[:, :2]) * (1.0 - cfg.lam) / cfg.lam
        toe_sw_xy = toe_sw_xy - 0.5 * 0.2 * rate * u ** 2
    toe_sw_z = p_back[:, 2] + _gauss(r_sw, 1.0, up)
    toe_sw = jnp.concatenate([toe_sw_xy, toe_sw_z[:, None]], axis=-1)
    return jnp.where(in_stance[:, None], toe_st, toe_sw)


def raibert_weight(cfg: EnvConfig, t: jnp.ndarray,
                   touchdown_match: bool = False) -> jnp.ndarray:
    """(4,) continuous per-leg weight for a Raibert foothold shift.

    Multiplying a horizontal shift by this weight is EXACTLY "shift the
    Bezier touchdown endpoint": during swing the xy arc is
    ``p_back + b_sw * (p_fwd - p_back)``, so weighting the shift by the
    same blend b_sw moves only the touchdown endpoint ``p_fwd`` — the foot
    converges to the corrected foothold and arrives there with the nominal
    touchdown velocity. During stance the sweep is
    ``p_fwd + b_st * (p_back - p_fwd)``; the decaying weight (1 - b_st)
    starts the sweep from the shifted endpoint the foot actually landed on
    and returns to the nominal rear endpoint by lift-off. The weight is
    continuous through both transitions (1 at touchdown, 0 at lift-off on
    both sides), so finite-difference joint-velocity references stay
    bounded — unlike the round-4 binary swing mask, whose full-shift jump
    at every mask flip injected (delta_q / control_dt) spikes into the
    velocity-tracking cost (measured cost 7.1e3/2.4e4 with 4-6 falls at
    cmd 5, docs/evidence/wb_push_r4.md)."""
    phase = jnp.mod(t + jnp.asarray(cfg.phase_offsets) * cfg.period,
                    cfg.period) / cfg.period
    in_stance = phase < cfg.lam
    r_st = jnp.clip(phase / cfg.lam, 0.0, 1.0)
    r_sw = jnp.clip((phase - cfg.lam) / (1.0 - cfg.lam), 0.0, 1.0)
    b_st = r_st if touchdown_match else _bezier_blend(r_st)
    return jnp.where(in_stance, 1.0 - b_st, _bezier_blend(r_sw))


def hip_y_offsets(cfg: EnvConfig) -> jnp.ndarray:
    """temp_offset (Environment.hpp:1794-1798)."""
    return jnp.asarray(np.array([
        -L_HIP + cfg.lean_front, L_HIP - cfg.lean_front,
        -L_HIP + cfg.lean_hind, L_HIP - cfg.lean_hind,
    ]))


def gait_reference(cfg: EnvConfig, command: jnp.ndarray, t: jnp.ndarray,
                   xy_shift: jnp.ndarray | None = None,
                   touchdown_match: bool = False) -> GaitRef:
    """Joint + end-effector reference at absolute time t for filtered command.

    xy_shift: optional horizontal Raibert foothold correction — (2,) applies
    one offset to every toe target (the SRB runtime's form), (4, 2) applies
    a per-leg offset (the whole-body runtime weights the shift by
    :func:`raibert_weight`, which makes it a continuous Bezier-endpoint
    shift — a planted stance foot cannot follow a jumped IK target, and
    binary masking measured as harmful as no masking,
    docs/evidence/wb_push_r4.md). The learned policy's imitation reference
    never shifts. touchdown_match: the MPC-grade profile (see toe_targets)."""
    toe = toe_targets(cfg, command, t, touchdown_match)
    if xy_shift is not None:
        shift = jnp.broadcast_to(jnp.asarray(xy_shift), (4, 2))
        toe = toe.at[:, :2].add(shift)
    ik_in = toe.at[:, 1].add(hip_y_offsets(cfg))
    joint_ref = legs_ik(ik_in)
    ee_ref = (toe + EE_OFFSET_J).reshape(-1)
    return GaitRef(joint_ref=joint_ref, toe=toe, ee_ref=ee_ref)
