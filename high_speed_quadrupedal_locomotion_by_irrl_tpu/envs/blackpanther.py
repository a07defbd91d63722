"""The BlackPanther trot-imitation MDP as a pure function.

Functional re-design of the reference task environment
(``BlackPanther_V55/Environment.hpp``): the whole ``reset -> step -> observe``
surface, the 8-term DeepMimic reward (:1444-1548), termination (:1553-1578),
obs layout/normalization (:360-393), the PD-to-torque pipeline with the
speed-dependent motor envelope (:692-809, :1273-1312), online command
resampling + Bezier gait references (:1010-1109, :1756-1890), domain
randomization (:435-477) and force disturbances (:866-940) — all expressed
over an :class:`EnvState` pytree so a single ``vmap`` replaces the OpenMP
fan-out at VectorizedEnvironment.hpp:273 and the auto-reset-with-terminal-
reward contract of perAgentStep (:352-372) is a branchless ``where`` merge.

Reference quirks intentionally preserved (the shipped bp5_155 policy was
trained against them):
- the inner-loop torque smoothing mixes 1% of the *normalized* torque from the
  previous control step (Environment.hpp:764 + :1511-1515 store order);
- the "stop" command bucket is a no-op (the C++ range-for at :1041 copies);
- Vx_min is never loaded from YAML and stays 0;
- reward mimic targets lag the integrated state by one control step
  (command_obs_update runs after DeepMimicRewardUpdate, :778-785).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import dynamics as dyn
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as tr
from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import gait
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.rotation import quat_to_matrix

OBS_DIM = 35
ACT_DIM = 12
_TWO_PI = 2.0 * np.pi


class EnvState(NamedTuple):
    # physics
    gc: jnp.ndarray                 # (19,)
    gv: jnp.ndarray                 # (18,)
    params: mdl.RobotParams         # per-env dynamics (fixed across auto-resets)
    terrain: tr.TerrainParams
    key: jax.Array                  # per-env PRNG key (threads all stochasticity)
    # control pipeline
    ptarget_last: jnp.ndarray       # (12,) pTarget12Last_
    torque_norm_last: jnp.ndarray   # (12,) normalized torque (see module notes)
    torque_applied: jnp.ndarray     # (12,) last substep's clamped torque [Nm]
    base_wrench: jnp.ndarray        # (6,) active disturbance wrench [f; n_base]
    # references
    command: jnp.ndarray            # (3,) raw command (persists across resets)
    command_filtered: jnp.ndarray   # (3,)
    joint_ref: jnp.ndarray          # (12,)
    joint_ref_last: jnp.ndarray     # (12,)
    joint_dot_ref: jnp.ndarray      # (12,)
    ee_ref: jnp.ndarray             # (12,)
    # timing
    current_time: jnp.ndarray       # () time of the NEXT state (see step order)
    frame_idx: jnp.ndarray          # () int32
    # contact bookkeeping
    contact_filtered: jnp.ndarray   # (4,)
    contact_force_norm: jnp.ndarray  # (4,)
    contact_vel_norm: jnp.ndarray   # (4,)
    # observation
    obs_double: jnp.ndarray         # (35,) unnormalized obs (with noise)
    obs_last: jnp.ndarray           # (35,) previous obs (ObsFilter)
    # episode bookkeeping
    done: jnp.ndarray               # () bool — this step terminated
    ep_return: jnp.ndarray          # ()
    ep_len: jnp.ndarray             # () int32
    reward_terms: jnp.ndarray       # (8,) [EE, BodyPos, BodyAtti, J, Jdot, Vel, Torque, Contact]
    # meteorite-attack curriculum (crucial learning, Environment.hpp:815-861);
    # zero-size arrays when cfg.crucial is off
    cube_pos: jnp.ndarray           # (C, 3)
    cube_vel: jnp.ndarray           # (C, 3)
    cube_radius: jnp.ndarray        # ()
    cube_mass: jnp.ndarray          # ()
    cube_active: jnp.ndarray        # () bool — spheres are dynamic (attacking)


class StepOut(NamedTuple):
    state: EnvState
    obs: jnp.ndarray        # (35,) normalized
    reward: jnp.ndarray     # ()
    done: jnp.ndarray       # () bool
    info: dict              # extraInfo parity (updateExtraInfo, Environment.hpp:942-950)


# --- observation statistics (Environment.hpp:374-393) -----------------------

def obs_mean(cfg: EnvConfig) -> jnp.ndarray:
    return jnp.concatenate([
        jnp.array([(cfg.vx_max + cfg.vx_min) / 2,
                   (cfg.vy_max + cfg.vy_min) / 2,
                   (cfg.omega_max + cfg.omega_min) / 2]),
        jnp.zeros(2),
        mdl.stand_gc(cfg.abad)[7:],
        jnp.zeros(12),
        jnp.array([0.0, 0.0, 1.0]),
        jnp.zeros(3),
    ])


def obs_std(cfg: EnvConfig) -> jnp.ndarray:
    return jnp.concatenate([
        jnp.ones(3), jnp.ones(2), jnp.ones(12),
        jnp.tile(jnp.array([5.0, 35.0, 40.0]), 4),
        jnp.full(3, 0.7), jnp.full(3, 3.0),
    ])


def action_mean(cfg: EnvConfig) -> jnp.ndarray:
    return mdl.stand_gc(cfg.abad)[7:]


# --- torque clamp (Environment.hpp:1273-1312) --------------------------------

_KNEE_RATIO_VEC = jnp.asarray(np.array([1.0, 1.0, mdl.KNEE_RATIO] * 4))


def torque_clamp(cfg: EnvConfig, torque: jnp.ndarray, qd: jnp.ndarray) -> jnp.ndarray:
    """Speed-dependent motor-envelope clamp on the 12 joint torques."""
    tm, cs, ms = cfg.motor_max_torque, cfg.motor_critical_speed, cfg.motor_max_speed
    r = tm / (ms - cs)
    w = qd * _KNEE_RATIO_VEC
    up = jnp.where(w > cs, tm - (w - cs) * r, tm) * _KNEE_RATIO_VEC
    low = jnp.where(w < -cs, (-ms - w) / (-ms + cs) * -tm, -tm) * _KNEE_RATIO_VEC
    return jnp.clip(torque, low, up)


# --- electrical motor model (RealTorque, Environment.hpp:161-208) ------------

_MOTOR_KT, _MOTOR_R, _MOTOR_TAU_MAX, _MOTOR_BATTERY_V = 0.05, 0.173, 3.0, 24.0
_MOTOR_DAMPING, _MOTOR_FRICTION = 0.01, 0.2
_GEAR = jnp.asarray(np.asarray(mdl.GEAR_RATIO))


def real_torque(torque: jnp.ndarray, qd: jnp.ndarray,
                friction: bool = True) -> jnp.ndarray:
    """Simplified electrical motor model: current/back-EMF/battery-voltage
    saturation + Coulomb friction (MotorDynamics flag). The reference's final
    clamp is an evident typo (fmin(fmin(-tau_max, x), tau_max) pins the torque
    at -tau_max); the intended symmetric clamp is implemented."""
    tau_motor = torque / _GEAR
    i_des = tau_motor / (_MOTOR_KT * 1.5)
    bemf = qd * _GEAR * _MOTOR_KT * 2.0
    v_des = i_des * _MOTOR_R + bemf
    v_act = jnp.clip(v_des, -_MOTOR_BATTERY_V, _MOTOR_BATTERY_V)
    tau_act = 1.5 * _MOTOR_KT * (v_act - bemf) / _MOTOR_R
    out = _GEAR * jnp.clip(tau_act, -_MOTOR_TAU_MAX, _MOTOR_TAU_MAX)
    if friction:
        out = out - _MOTOR_DAMPING * qd - _MOTOR_FRICTION * jnp.sign(qd)
    return out


# --- phase-shaped contact windows (Environment.hpp:118-156) ------------------

def smooth_function(phase: jnp.ndarray, slope: float, lam: float) -> jnp.ndarray:
    ph = jnp.mod(phase, 1.0)
    t = jnp.where(ph < lam,
                  jnp.sin(ph / lam * _TWO_PI) * slope + 0.5,
                  -jnp.sin((ph - lam) / (1.0 - lam) * _TWO_PI) * slope + 0.5)
    return jnp.clip(t, 0.0, 1.0)


def smooth_function2(phase: jnp.ndarray, slope: float, lam: float) -> jnp.ndarray:
    ph = jnp.mod(phase, 1.0)
    t = jnp.where(ph < lam,
                  jnp.sin(ph / lam * _TWO_PI) * slope + 0.5,
                  -jnp.sin((ph - lam) / (1.0 - lam) * _TWO_PI) * slope + 0.5)
    return jnp.where(t > 1.0, 0.0, jnp.where(t < 0.0, 1.0, 1.0 - t))


# --- command resampling (command_obs_update, Environment.hpp:1010-1109) ------

def _resample_command(cfg: EnvConfig, key: jax.Array, command: jnp.ndarray,
                      force: jnp.ndarray) -> jnp.ndarray:
    k1, k2, k3 = jax.random.split(key, 3)
    trigger = jnp.logical_or(
        jax.random.uniform(k1) < 0.5 / (cfg.max_time / cfg.control_dt), force)
    bucket = jax.random.uniform(k2)
    u = jax.random.uniform(k3)
    new = command
    # 0.2<u<=0.7: vx;  0.7<u<=0.85: vy;  u>0.85: omega;  u<=0.2: no-op (ref bug kept)
    new = jnp.where((bucket > 0.2) & (bucket <= 0.7),
                    new.at[0].set(u * cfg.vx_max + (1 - u) * cfg.vx_min), new)
    new = jnp.where((bucket > 0.7) & (bucket <= 0.85),
                    new.at[1].set(u * cfg.vy_max + (1 - u) * cfg.vy_min), new)
    new = jnp.where(bucket > 0.85,
                    new.at[2].set(u * cfg.omega_max + (1 - u) * cfg.omega_min), new)
    return jnp.where(trigger, new, command)


class RefUpdate(NamedTuple):
    command: jnp.ndarray
    command_filtered: jnp.ndarray
    joint_ref: jnp.ndarray
    joint_dot_ref: jnp.ndarray
    ee_ref: jnp.ndarray
    phase: jnp.ndarray | None   # (2,) table-provided phase obs, or None


def _update_references(cfg: EnvConfig, key: jax.Array, command: jnp.ndarray,
                       command_filtered: jnp.ndarray, joint_ref_prev: jnp.ndarray,
                       joint_dot_prev: jnp.ndarray, t: jnp.ndarray,
                       frame_idx: jnp.ndarray, is_reset: bool,
                       ref_table: jnp.ndarray | None = None) -> RefUpdate:
    """command_obs_update(flag_reset): online Bezier references (ManualTraj,
    Environment.hpp:1024-1099) or table lookup (RefTraj mode, :1100-1107
    with gait_generator :1664-1682 — theta 0:12 | theta_dot 12:24 | z 24 |
    phase 25:27 | cmd 27:30)."""
    if cfg.manual:
        # manual mode: commands injected by the driver; references frozen
        return RefUpdate(command, command_filtered, joint_ref_prev,
                         joint_dot_prev, jnp.zeros(12), None)

    if not cfg.manual_traj and ref_table is not None:
        row = ref_table[jnp.clip(frame_idx, 0, ref_table.shape[0] - 1)]
        return RefUpdate(command=command, command_filtered=row[27:30],
                         joint_ref=row[0:12], joint_dot_ref=row[12:24],
                         ee_ref=jnp.zeros(12), phase=row[25:27])

    command = _resample_command(cfg, key, command, jnp.asarray(is_reset))
    if is_reset:
        command_filtered = command
    else:
        command_filtered = (command_filtered * cfg.cmd_update_param
                            + command * (1.0 - cfg.cmd_update_param))
    ref = gait.gait_reference(cfg, command_filtered, t)
    if is_reset:
        # jointRefLast from t - dt so jointDotRef is well-defined at reset
        joint_ref_last = gait.gait_reference(cfg, command_filtered,
                                             t - cfg.control_dt).joint_ref
    else:
        joint_ref_last = joint_ref_prev
    joint_dot_ref = (ref.joint_ref - joint_ref_last) / cfg.control_dt
    return RefUpdate(command, command_filtered, ref.joint_ref, joint_dot_ref,
                     ref.ee_ref, None)


# --- observation (updateObservation, Environment.hpp:956-1004) ---------------

def _raw_observation(cfg: EnvConfig, key: jax.Array, gc: jnp.ndarray, gv: jnp.ndarray,
                     command_filtered: jnp.ndarray, t: jnp.ndarray,
                     phase_override: jnp.ndarray | None = None):
    """Unnormalized 35-d obs with sensor noise; also returns body-frame vels."""
    kj, kv, kp, kw = jax.random.split(key, 4)
    nf = cfg.obs_noise
    if phase_override is not None:  # RefTraj table phase (Environment.hpp:972)
        phase = phase_override
    else:
        phase = jnp.array([jnp.sin(_TWO_PI * t / cfg.period),
                           jnp.cos(_TWO_PI * t / cfg.period)])
    joints = gc[7:] + jax.random.uniform(kj, (12,), minval=-1.0, maxval=1.0) * cfg.joint_noise * nf
    joint_vel = gv[6:] + jax.random.uniform(kv, (12,), minval=-1.0, maxval=1.0) * cfg.joint_velocity_noise * nf
    R = quat_to_matrix(gc[3:7])
    posture = R[2, :] + jax.random.normal(kp, (3,)) * cfg.posture_noise_std * nf
    v_body = R.T @ gv[:3]
    w_body = R.T @ gv[3:6]
    omega = w_body + jax.random.normal(kw, (3,)) * cfg.omega_noise_std * nf
    obs = jnp.concatenate([command_filtered, phase, joints, joint_vel, posture, omega])
    return obs, v_body, w_body, R


def normalize_obs(cfg: EnvConfig, obs_double: jnp.ndarray) -> jnp.ndarray:
    return (obs_double - obs_mean(cfg)) / obs_std(cfg)


# --- reward (DeepMimicRewardUpdate, Environment.hpp:1444-1548) ----------------

class _RewardOut(NamedTuple):
    total: jnp.ndarray
    terms: jnp.ndarray            # (8,)
    torque_norm: jnp.ndarray      # (12,) for the next step's smoothing


def deep_mimic_reward(cfg: EnvConfig, t: jnp.ndarray, gc: jnp.ndarray, gv: jnp.ndarray,
                      obs_double: jnp.ndarray, v_body: jnp.ndarray, w_body: jnp.ndarray,
                      R: jnp.ndarray, toe_pos: jnp.ndarray, joint_ref: jnp.ndarray,
                      joint_dot_ref: jnp.ndarray, ee_ref: jnp.ndarray,
                      command_filtered: jnp.ndarray, torque_applied: jnp.ndarray,
                      torque_norm_last: jnp.ndarray, contact_vel_norm: jnp.ndarray,
                      contact_force_norm: jnp.ndarray) -> _RewardOut:
    ee = (jnp.einsum("ji,bj->bi", R, toe_pos - gc[:3])).reshape(-1)
    r_ee = cfg.ee_coeff * jnp.exp(-40.0 * jnp.sum((ee - ee_ref) ** 2))

    r_h = cfg.body_pos_coeff * jnp.exp(-80.0 * (gc[2] - cfg.stand_height) ** 2)
    r_att = cfg.body_atti_coeff * jnp.exp(-80.0 * jnp.sum(obs_double[29:31] ** 2))

    r_j = cfg.joint_mimic_coeff * 0.25 * jnp.exp(-2.0 * jnp.sum((joint_ref - gc[7:]) ** 2))
    r_jd = cfg.joint_mimic_coeff * 0.75 * jnp.exp(
        -cfg.control_dt * jnp.sum((joint_dot_ref - gv[6:]) ** 2))

    v_ref = jnp.array([jnp.where(cfg.wildcat, -command_filtered[0], command_filtered[0]),
                       command_filtered[1], 0.0])
    w_ref = jnp.array([0.0, 0.0, command_filtered[2]])
    r_vel = (cfg.vel_keep_coeff / 2 * jnp.exp(-2.0 * jnp.sum((v_body - v_ref) ** 2))
             + cfg.vel_keep_coeff / 2 * jnp.exp(-2.0 * jnp.sum((w_body - w_ref) ** 2)))

    torque_norm = torque_applied / mdl.TORQUE_LIMIT_J
    r_tau = (cfg.torque_coeff / 2 * jnp.exp(-0.1 * jnp.sum(torque_norm ** 2))
             + cfg.torque_coeff / 2 * jnp.exp(
                 -0.1 / cfg.control_dt * jnp.sum((torque_norm - torque_norm_last) ** 2)))

    phase = jnp.mod(t + jnp.asarray(cfg.phase_offsets) * cfg.period, cfg.period) / cfg.period
    slip = 4.0 * contact_vel_norm ** 2 * smooth_function(phase, 2.0, cfg.lam)
    impact = 2.0 * (contact_force_norm / 12.5) ** 2 * smooth_function2(phase, 2.0, cfg.lam)
    r_ct = cfg.contact_coeff * jnp.exp(-2.0 * jnp.sum(slip + impact))

    terms = jnp.stack([r_ee, r_h, r_att, r_j, r_jd, r_vel, r_tau, r_ct])
    return _RewardOut(total=jnp.sum(terms), terms=terms, torque_norm=torque_norm)


# --- disturbances (Environment.hpp:866-940) ----------------------------------

def _circle_place(radius: float, num: int) -> jnp.ndarray:
    """(num, 3) ring positions at z=1 (circle_place, Environment.hpp:61-66)."""
    idx = np.arange(num)
    ang = idx / max(num, 1) * 2.0 * np.pi
    return jnp.asarray(np.stack([radius * np.sin(ang), radius * np.cos(ang),
                                 np.ones(num)], axis=-1))


def _cube_ring_reset(cfg: EnvConfig, gc: jnp.ndarray, t: jnp.ndarray):
    """Re-spawn the attack spheres around the robot; size/mass grow with
    episode time (meteoriteAttack reset branch, Environment.hpp:827-841)."""
    pos = _circle_place(cfg.cube_place_radius, cfg.num_cube)
    pos = pos + jnp.array([gc[0] + 0.05, gc[1], gc[2]])
    radius = (t / 5.0 + 1.0) * cfg.cube_len
    mass = t / 5.0 + 0.2
    return pos, jnp.zeros((cfg.num_cube, 3)), radius, mass


SHANK_CAPSULE_RADIUS = 0.016  # visual shank mesh thickness (black_panther.urdf shank .dae)


def _sphere_robot_forces(cfg: EnvConfig, params, gc: jnp.ndarray, cube_pos,
                         cube_vel, radius, mass, tp):
    """Attack-sphere contact with ground, body box and all four shank
    capsules (knee->toe segments). The reference's Raisim world resolves
    sphere<->every-link collisions (meteoriteAttack, Environment.hpp:815-861);
    here the legs are capsules and the reaction is returned as per-body
    world-origin wrenches to feed forward_dynamics(f_ext_extra=...).

    Returns (sphere accelerations (C,3), robot wrenches (13, 6))."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import contact as _ct
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import spatial as _sp
    kn, dn = 5e4, 100.0
    # ground contact
    f_ground, _ = _ct.point_contact_force(cube_pos, cube_vel, radius, tp,
                                          kn, dn, 0.6, cfg.contact_slip_vel)
    # body-box contact: closest point on the box (body frame) to sphere center
    R = quat_to_matrix(gc[3:7])
    rel = jnp.einsum("ji,cj->ci", R, cube_pos - gc[:3])
    half = jnp.asarray(mdl.BODY_BOX_HALF)
    closest = jnp.clip(rel, -half, half)
    delta = rel - closest
    dist = jnp.linalg.norm(delta, axis=-1)
    pen = jnp.maximum(radius - dist, 0.0)
    n_body = delta / jnp.maximum(dist, 1e-6)[:, None]
    n_world = jnp.einsum("ij,cj->ci", R, n_body)
    f_box = (kn * pen)[:, None] * n_world            # on the sphere, world frame
    box_contact_w = gc[:3] + jnp.einsum("ij,cj->ci", R, closest)

    # shank-capsule contact: segment knee->toe per leg vs each sphere
    kin = dyn.fk(params, gc)
    seg_a = kin.p[mdl.SHANK_BODY_IDX]                 # (4,3) knee anchors
    seg_b = kin.toe_pos                               # (4,3) toe centers
    ab = seg_b - seg_a                                # (4,3)
    ab_len2 = jnp.maximum(jnp.sum(ab * ab, axis=-1), 1e-9)
    # closest point on each segment to each sphere center: (C,4)
    ap = cube_pos[:, None, :] - seg_a[None, :, :]     # (C,4,3)
    s = jnp.clip(jnp.einsum("cli,li->cl", ap, ab) / ab_len2, 0.0, 1.0)
    closest_seg = seg_a[None] + s[..., None] * ab[None]          # (C,4,3)
    d_seg = cube_pos[:, None, :] - closest_seg                   # (C,4,3)
    dist_seg = jnp.linalg.norm(d_seg, axis=-1)                   # (C,4)
    pen_seg = jnp.maximum(radius + SHANK_CAPSULE_RADIUS - dist_seg, 0.0)
    n_seg = d_seg / jnp.maximum(dist_seg, 1e-6)[..., None]
    f_shank = (kn * pen_seg)[..., None] * n_seg       # (C,4,3) on the sphere

    f_total = f_ground + f_box + jnp.sum(f_shank, axis=1)
    acc = f_total / jnp.maximum(mass, 1e-6) + jnp.array([0.0, 0.0, -9.81])

    # reaction wrenches on the robot (world-origin spatial forces)
    f_ext = jnp.zeros((mdl.NUM_BODIES, 6))
    f_ext = f_ext.at[0].add(jnp.sum(_sp.force_at_point(-f_box, box_contact_w), axis=0))
    shank_wrench = _sp.force_at_point(
        -f_shank.reshape(-1, 3), closest_seg.reshape(-1, 3)).reshape(-1, 4, 6)
    f_ext = f_ext.at[mdl.SHANK_BODY_IDX].add(jnp.sum(shank_wrench, axis=0))
    return acc, f_ext


def _force_attack(cfg: EnvConfig, key: jax.Array) -> jnp.ndarray:
    """Random base wrench, ~2 impulses per episode when enabled.

    The reference draws `random() < 2*control_dt/max_time` where random()
    is an integer — an evident bug that makes the branch near-impossible;
    implemented here with the intended probability.
    """
    kp, kf = jax.random.split(key)
    trigger = jax.random.uniform(kp) < 2.0 * cfg.control_dt / cfg.max_time
    ff = jax.random.uniform(kf, (6,), minval=-1.0, maxval=1.0)
    wrench = jnp.array([0.0, 0.0, ff[2] * 2000.0, ff[3] * 400.0, ff[4] * 400.0, 0.0])
    return jnp.where(trigger, wrench, jnp.zeros(6))


# --- reset --------------------------------------------------------------------

def env_init(cfg: EnvConfig, key: jax.Array,
             ref_table: jnp.ndarray | None = None) -> EnvState:
    """Construction-time state: domain randomization + terrain + first reset.

    Mirrors the ENVIRONMENT constructor followed by reset()
    (VectorizedEnvironment.hpp:172-182). ref_table: optional (N, 30) RefTraj
    table shared by all envs (broadcast under vmap as a closed-over constant,
    the analog of VectorizedEnvironment::set_ref, :158-182).
    """
    k_dr, k_tr, k_reset = jax.random.split(key, 3)
    params = (mdl.randomize(k_dr, cfg) if cfg.stochastic_dynamics
              else mdl.nominal_params(cfg))
    if cfg.terrain:
        terrain = (tr.sampled_fractal(k_tr, cfg.terrain_z_scale)
                   if cfg.terrain_sampled
                   else tr.fractal(k_tr, cfg.terrain_z_scale))
    else:
        terrain = tr.flat()
    zero = jnp.zeros(())
    blank = EnvState(
        gc=mdl.stand_gc(cfg.abad), gv=jnp.zeros(18), params=params, terrain=terrain,
        key=k_reset, ptarget_last=jnp.zeros(12), torque_norm_last=jnp.zeros(12),
        torque_applied=jnp.zeros(12), base_wrench=jnp.zeros(6),
        command=jnp.zeros(3), command_filtered=jnp.zeros(3),
        joint_ref=_init_joint_ref(cfg), joint_ref_last=_init_joint_ref(cfg),
        joint_dot_ref=jnp.zeros(12), ee_ref=jnp.zeros(12),
        current_time=zero, frame_idx=jnp.zeros((), jnp.int32),
        contact_filtered=jnp.zeros(4), contact_force_norm=jnp.zeros(4),
        contact_vel_norm=jnp.zeros(4),
        obs_double=jnp.zeros(OBS_DIM), obs_last=jnp.zeros(OBS_DIM),
        done=jnp.zeros((), bool), ep_return=zero, ep_len=jnp.zeros((), jnp.int32),
        reward_terms=jnp.zeros(8),
        cube_pos=jnp.zeros((cfg.num_cube if cfg.crucial else 0, 3)),
        cube_vel=jnp.zeros((cfg.num_cube if cfg.crucial else 0, 3)),
        cube_radius=jnp.asarray(cfg.cube_len), cube_mass=jnp.asarray(cfg.cube_mass),
        cube_active=jnp.zeros((), bool),
    )
    return reset(cfg, blank, ref_table)


def _init_joint_ref(cfg: EnvConfig) -> jnp.ndarray:
    sign = jnp.asarray(np.array([-1.0, 0, 0, 1.0, 0, 0, -1.0, 0, 0, 1.0, 0, 0]))
    return sign * cfg.abad


def _sampling_reshape(ratio: jnp.ndarray) -> jnp.ndarray:
    """Density-reshaped episode-start sampling (Environment.hpp:71-81)."""
    return jnp.where((ratio < 0.5) & (ratio > 0.0),
                     ratio * 4.0 / 3.0, (2.0 * ratio + 1.0) / 3.0)


def reset(cfg: EnvConfig, state: EnvState,
          ref_table: jnp.ndarray | None = None) -> EnvState:
    """reset() (Environment.hpp:547-635): random phase start, command resample,
    joint pose/vel perturbed +-30% around the gait reference, base velocity
    seeded from the command +-20%, random xy +-5 m. Dynamics params and the raw
    command persist across resets (reference semantics)."""
    key, k_t, k_cmd, k_jp, k_jv, k_bv, k_xy, k_obs = jax.random.split(state.key, 8)

    t0 = jnp.where(cfg.manual, 0.0, jax.random.uniform(k_t))
    if ref_table is not None and not cfg.manual_traj:
        frame_max = ref_table.shape[0]
        frame_len = cfg.episode_len
        f0 = ((frame_max - frame_len - 10)
              * _sampling_reshape(jax.random.uniform(k_t))).astype(jnp.int32)
        frame0 = jnp.where(cfg.manual, 0, jnp.maximum(f0, 0))
    else:
        frame0 = jnp.zeros((), jnp.int32)

    upd = _update_references(
        cfg, k_cmd, state.command, jnp.zeros(3), state.joint_ref,
        state.joint_dot_ref, t0, frame0, is_reset=True, ref_table=ref_table)
    command, command_filtered = upd.command, upd.command_filtered

    jp_noise = jax.random.uniform(k_jp, (12,), minval=-1.0, maxval=1.0)
    jv_noise = jax.random.uniform(k_jv, (12,), minval=-1.0, maxval=1.0)
    bv_noise = jax.random.uniform(k_bv, (3,), minval=-1.0, maxval=1.0)
    q0 = upd.joint_ref * (1.0 + 0.3 * jp_noise)
    qd0 = upd.joint_dot_ref * (1.0 + 0.3 * jv_noise)
    vx = command_filtered[0] * (0.2 * bv_noise[0] + 1.0)
    vx = jnp.where(cfg.wildcat, -vx, vx)
    vy = command_filtered[1] * (0.2 * bv_noise[1] + 1.0)
    wz = command_filtered[2] * (0.2 * bv_noise[2] + 1.0)
    xy = jnp.where(cfg.manual, jnp.zeros(2),
                   jax.random.uniform(k_xy, (2,), minval=-5.0, maxval=5.0))

    stand = mdl.stand_gc(cfg.abad)
    z0 = stand[2:3]
    if cfg.terrain:  # spawn stand-height above the local ground surface
        z0 = z0 + tr.height(state.terrain, xy[0], xy[1])
    gc = jnp.concatenate([xy, z0, stand[3:7],
                          jnp.where(cfg.manual, stand[7:], q0)])
    gv = jnp.concatenate([jnp.array([vx, vy, 0.0, 0.0, 0.0, wz]), qd0])
    gv = jnp.where(cfg.manual, jnp.zeros(18), gv)

    obs, v_body, w_body, R = _raw_observation(cfg, k_obs, gc, gv, command_filtered,
                                              t0, upd.phase)

    # post-obs reference regeneration (command_obs_update(false) at reset tail)
    key, k_cmd2 = jax.random.split(key)
    upd2 = _update_references(
        cfg, k_cmd2, command, command_filtered, upd.joint_ref, upd.joint_dot_ref,
        t0, frame0, is_reset=False, ref_table=ref_table)
    command, command_filtered = upd2.command, upd2.command_filtered
    obs = obs.at[:3].set(command_filtered)

    if cfg.crucial:  # re-spawn the attack ring (meteoriteAttack(true), :608-612)
        cube_pos, cube_vel, cube_radius, cube_mass = _cube_ring_reset(cfg, gc, t0)
        state = state._replace(cube_pos=cube_pos, cube_vel=cube_vel,
                               cube_radius=cube_radius, cube_mass=cube_mass,
                               cube_active=jnp.zeros((), bool))

    return state._replace(
        gc=gc, gv=gv, key=key,
        torque_norm_last=jnp.zeros(12), torque_applied=jnp.zeros(12),
        base_wrench=jnp.zeros(6),
        command=command, command_filtered=command_filtered,
        joint_ref=upd2.joint_ref, joint_ref_last=upd2.joint_ref,
        joint_dot_ref=upd2.joint_dot_ref, ee_ref=upd2.ee_ref,
        current_time=t0 + cfg.control_dt, frame_idx=frame0 + 1,
        contact_filtered=jnp.zeros(4), contact_force_norm=jnp.zeros(4),
        contact_vel_norm=jnp.zeros(4),
        obs_double=obs, obs_last=obs,
        done=jnp.zeros((), bool), ep_return=jnp.zeros(()), ep_len=jnp.zeros((), jnp.int32),
        reward_terms=jnp.zeros(8),
    )


# --- step ----------------------------------------------------------------------

class _PreOut(NamedTuple):
    gc: jnp.ndarray
    gv: jnp.ndarray
    ptarget: jnp.ndarray
    base_wrench: jnp.ndarray
    cube_pos: jnp.ndarray
    cube_vel: jnp.ndarray
    cube_radius: jnp.ndarray
    cube_mass: jnp.ndarray
    cube_active: jnp.ndarray


def _pre_substeps(cfg: EnvConfig, state: EnvState, action: jnp.ndarray,
                  k_act: jax.Array, k_attack: jax.Array):
    """Everything before the physics substeps: action pipeline, disturbances,
    attack-sphere update. Returns (_PreOut, f_ext_extra or None)."""
    # -- action scaling + filtering + multiplicative action noise (:700-705)
    ptarget = action * 1.0 + action_mean(cfg)
    fp = cfg.filter_para
    ptarget = (1.0 - fp) * ptarget + fp * state.ptarget_last
    a_noise = jax.random.uniform(k_act, (12,), minval=-1.0, maxval=1.0)
    ptarget = ptarget * (1.0 + cfg.action_noise * a_noise)

    # -- disturbances
    if cfg.force_disturbance and not cfg.manual:
        base_wrench = _force_attack(cfg, k_attack)
    else:
        base_wrench = jnp.zeros(6)

    # -- manual-mode state kicks (state_disturbance, Environment.hpp:912-940)
    state_gc, state_gv = state.gc, state.gv
    if cfg.force_disturbance and cfg.manual:
        period_frames = max(int(cfg.period / cfg.control_dt * 10), 1)
        kick = (state.frame_idx % period_frames) == 0
        kn_pos = jax.random.uniform(k_attack, (7,), minval=-1.0, maxval=1.0)
        kn_vel = jax.random.uniform(jax.random.fold_in(k_attack, 1), (6,),
                                    minval=-1.0, maxval=1.0)
        ratio = 0.5
        gc_k = state_gc.at[2].add(0.03 * kn_pos[2] * ratio)
        gc_k = gc_k.at[3:7].add(0.1 * kn_pos[3:7] * ratio)
        gc_k = gc_k.at[3:7].set(gc_k[3:7] / jnp.linalg.norm(gc_k[3:7]))
        gv_k = state_gv.at[2].add(0.1 * kn_vel[2] * ratio)
        gv_k = gv_k.at[3:5].add(0.3 * kn_vel[3:5] * ratio)
        state_gc = jnp.where(kick, gc_k, state_gc)
        state_gv = jnp.where(kick, gv_k, state_gv)

    # -- meteorite-attack curriculum (crucial learning, Environment.hpp:717-741)
    cube_pos, cube_vel = state.cube_pos, state.cube_vel
    cube_radius, cube_mass = state.cube_radius, state.cube_mass
    cube_active = state.cube_active
    if cfg.crucial:
        ring_frames = max(int(5 * cfg.period / cfg.control_dt), 1)
        respawn = (state.frame_idx % ring_frames) == 0
        pos_r, vel_r, rad_r, mass_r = _cube_ring_reset(cfg, state_gc, state.current_time)
        launch_vel = jnp.concatenate(
            [jnp.broadcast_to(state_gv[:2], (cfg.num_cube, 2)),
             jnp.full((cfg.num_cube, 1), -5.0)], axis=-1)
        do_launch = jnp.logical_not(respawn) & jnp.logical_not(cube_active)
        cube_pos = jnp.where(respawn, pos_r, cube_pos)
        cube_vel = jnp.where(respawn, vel_r,
                             jnp.where(do_launch, launch_vel, cube_vel))
        cube_radius = jnp.where(respawn, rad_r, cube_radius)
        cube_mass = jnp.where(respawn, mass_r, cube_mass)
        cube_active = jnp.logical_not(respawn)
        # integrate the spheres over the control step; their contact
        # reaction (body box + shank capsules) loads the robot during the
        # substeps below as per-body external wrenches
        acc, reaction = _sphere_robot_forces(cfg, state.params, state_gc,
                                             cube_pos, cube_vel,
                                             cube_radius, cube_mass, state.terrain)
        dyn_mask = cube_active.astype(jnp.float32)
        cube_vel = cube_vel + cfg.control_dt * acc * dyn_mask
        cube_pos = cube_pos + cfg.control_dt * cube_vel * dyn_mask
        f_ext_extra = reaction * dyn_mask
    else:
        f_ext_extra = None
    return _PreOut(gc=state_gc, gv=state_gv, ptarget=ptarget,
                   base_wrench=base_wrench, cube_pos=cube_pos,
                   cube_vel=cube_vel, cube_radius=cube_radius,
                   cube_mass=cube_mass, cube_active=cube_active), f_ext_extra


def _pd_torque(cfg: EnvConfig, ptarget, torque_norm_last, gc_joints, gv_joints,
               tau_ff=None, pd_scale=None):
    """Per-substep PD -> smoothing-quirk -> motor model -> envelope clamp.

    Elementwise over trailing (12,), so it works per-env and batched (B, 12).

    ``tau_ff``/``pd_scale`` implement the Convert2Torque capability the
    reference declares but never defines (Environment.hpp:1629, 2024): a
    direct joint-torque feedforward (e.g. GRF-mapped stance torques from the
    MPC) added after the PD smoothing quirk, with the PD feedback scaled by
    ``pd_scale`` (0 = pure torque control, 1 = the default PD path). The
    motor envelope clamp applies to the sum, so feedforward torques obey the
    same actuator limits the policy faces."""
    gain_pattern = jnp.asarray(np.array([cfg.abad_ratio, 1.0, 1.0] * 4))
    kp_vec = cfg.stiffness * gain_pattern
    kd_vec = cfg.damping * gain_pattern
    tau = kp_vec * (ptarget - gc_joints) - kd_vec * gv_joints
    if pd_scale is not None:
        tau = tau * pd_scale
    tau = 0.99 * tau + 0.01 * torque_norm_last  # reference quirk, see notes
    if tau_ff is not None:
        tau = tau + tau_ff
    if cfg.motor_dynamics:
        tau = real_torque(tau, gv_joints)
    return torque_clamp(cfg, tau, gv_joints)


def step(cfg: EnvConfig, state: EnvState, action: jnp.ndarray,
         ref_table: jnp.ndarray | None = None,
         tau_ff: jnp.ndarray | None = None,
         pd_scale: jnp.ndarray | None = None) -> StepOut:
    """One control step (= cfg.substeps physics substeps) with auto-reset.

    ``tau_ff``/``pd_scale`` (both (12,), optional) expose the Convert2Torque
    actuation path (see _pd_torque) — held constant over the control step's
    substeps, the way an MPC running at the control rate commands a
    lower-level torque loop."""
    key, k_act, k_cmd, k_obs, k_attack, k_reset = jax.random.split(state.key, 6)

    pre, f_ext_extra = _pre_substeps(cfg, state, action, k_act, k_attack)
    ptarget, base_wrench = pre.ptarget, pre.base_wrench

    # -- 8 physics substeps, PD torque recomputed from fresh state (:758-774)
    def substep(carry, _):
        if cfg.hard_contact:
            gc, gv, lam = carry
        else:
            gc, gv = carry
        tau = _pd_torque(cfg, ptarget, state.torque_norm_last, gc[7:], gv[6:],
                         tau_ff=tau_ff, pd_scale=pd_scale)
        if cfg.hard_contact:
            # impulse-level toe contact (phys/hard_contact.py): the
            # Raisim-solver-class model the reference actually trains in;
            # impulses warm-start the next substep's PGS
            gc2, gv2, diag, lam2 = dyn.substep_hard(
                state.params, gc, gv, tau, base_wrench, state.terrain,
                cfg.simulation_dt, f_ext_extra=f_ext_extra,
                n_iter=cfg.hard_contact_iters, lam0=lam)
            return (gc2, gv2, lam2), (tau, diag)
        qdd, diag = dyn.forward_dynamics(state.params, gc, gv, tau, base_wrench,
                                         state.terrain, cfg.contact_slip_vel,
                                         f_ext_extra=f_ext_extra,
                                         impulse_scale=cfg.contact_impulse_mass
                                         / cfg.simulation_dt)
        gc2, gv2 = dyn.integrate(gc, gv, qdd, cfg.simulation_dt)
        return (gc2, gv2), (tau, diag)

    init = ((pre.gc, pre.gv, jnp.zeros((4, 3))) if cfg.hard_contact
            else (pre.gc, pre.gv))
    carry_out, (taus, diags) = jax.lax.scan(
        substep, init, None, length=cfg.substeps)
    gc, gv = carry_out[0], carry_out[1]
    torque_applied = taus[-1]
    last_diag = jax.tree.map(lambda x: x[-1], diags)
    return _post_substeps(cfg, state, (key, k_cmd, k_obs, k_reset), gc, gv,
                          torque_applied, last_diag, pre, ref_table)


def _post_substeps(cfg: EnvConfig, state: EnvState, keys, gc, gv,
                   torque_applied, last_diag, pre: _PreOut,
                   ref_table) -> StepOut:
    """Everything after the physics substeps: observation, reward, reference
    update, termination, auto-reset. Shared by step() and step_batch()."""
    key, k_cmd, k_obs, k_reset = keys
    ptarget, base_wrench = pre.ptarget, pre.base_wrench
    cube_pos, cube_vel = pre.cube_pos, pre.cube_vel
    cube_radius, cube_mass, cube_active = (pre.cube_radius, pre.cube_mass,
                                           pre.cube_active)

    # -- observation at the new state (time = state.current_time)
    t = state.current_time
    if ref_table is not None and not cfg.manual_traj and not cfg.manual:
        phase_now = ref_table[jnp.clip(state.frame_idx, 0, ref_table.shape[0] - 1),
                              25:27]
    else:
        phase_now = None
    obs, v_body, w_body, R = _raw_observation(cfg, k_obs, gc, gv,
                                              state.command_filtered, t, phase_now)

    # -- contact information (impulse-scaled force norm, see SURVEY notes)
    contact_force_norm = last_diag.toe_force_norm * (cfg.simulation_dt / cfg.control_dt)
    contact_vel_norm = jnp.linalg.norm(last_diag.toe_vel, axis=-1)
    if cfg.time_based_contact:
        # phase-scheduled contact flags (contact_obs_update, Environment.hpp:1169-1193)
        ph = jnp.mod(t + jnp.asarray(cfg.phase_offsets) * cfg.period,
                     cfg.period) / cfg.period
        contact_flag = (ph < cfg.lam).astype(jnp.float32)
    else:
        contact_flag = (last_diag.toe_normal_force > 0.0).astype(jnp.float32)

    # -- reward against the references generated last step
    rew = deep_mimic_reward(
        cfg, t, gc, gv, obs, v_body, w_body, R, last_diag.toe_pos,
        state.joint_ref, state.joint_dot_ref, state.ee_ref, state.command_filtered,
        torque_applied, state.torque_norm_last, contact_vel_norm, contact_force_norm)

    # -- next references (command_obs_update(false) after reward, :784)
    upd = _update_references(
        cfg, k_cmd, state.command, state.command_filtered, state.joint_ref,
        state.joint_dot_ref, t, state.frame_idx, is_reset=False,
        ref_table=ref_table)
    command, command_filtered = upd.command, upd.command_filtered
    obs = obs.at[:3].set(command_filtered)

    # -- obs low-pass (observe(), Environment.hpp:1251-1256)
    if cfg.obs_filter:
        alpha = cfg.obs_filter_alpha
        tail = obs[5:] * alpha + state.obs_last[5:] * (1.0 - alpha)
        obs = obs.at[5:].set(tail)

    # -- termination (isTerminalState, :1553-1578) with the noisy posture obs
    done = (gc[2] < 0.15) | (gc[2] > 0.65) | (obs[31] < 0.5)
    reward = rew.total + jnp.where(done, cfg.terminal_reward, 0.0)

    new_state = state._replace(
        gc=gc, gv=gv, key=key,
        ptarget_last=ptarget, torque_norm_last=rew.torque_norm,
        torque_applied=torque_applied, base_wrench=base_wrench,
        command=command, command_filtered=command_filtered,
        joint_ref=upd.joint_ref, joint_ref_last=upd.joint_ref,
        joint_dot_ref=upd.joint_dot_ref, ee_ref=upd.ee_ref,
        current_time=t + cfg.control_dt, frame_idx=state.frame_idx + 1,
        contact_filtered=contact_flag, contact_force_norm=contact_force_norm,
        contact_vel_norm=contact_vel_norm,
        obs_double=obs, obs_last=obs,
        done=done, ep_return=state.ep_return + reward, ep_len=state.ep_len + 1,
        reward_terms=rew.terms,
        cube_pos=cube_pos, cube_vel=cube_vel, cube_radius=cube_radius,
        cube_mass=cube_mass, cube_active=cube_active,
    )

    # -- auto-reset with terminal reward (perAgentStep, VectorizedEnvironment.hpp:352-372)
    reset_state = reset(cfg, new_state._replace(key=k_reset), ref_table)
    out_state = jax.tree.map(lambda a, b: jnp.where(done, a, b), reset_state, new_state)
    # keep episode stats of the finished episode visible in info
    info = {
        "reward_terms": rew.terms,
        "ep_return": new_state.ep_return,
        "ep_len": new_state.ep_len,
        "base_height": gc[2],
        "contact": contact_flag,
    }
    obs_out = normalize_obs(cfg, out_state.obs_double)
    return StepOut(state=out_state, obs=obs_out, reward=reward, done=done, info=info)


def step_batch(cfg: EnvConfig, states: EnvState, actions: jnp.ndarray,
               ref_table: jnp.ndarray | None = None) -> StepOut:
    """Whole-batch control step on the batch-in-lanes physics path.

    Semantically identical to ``vmap(step)`` (same per-env key splits, same
    pre/post logic) but the 8 physics substeps run through
    ops/phys_lanes.substep — every scalar of the dynamics batches into TPU
    lanes, ~4x the vmap path's throughput (184k vs 47k env-steps/s per v5e
    chip at batch 8k). Costs a long first-time XLA compile; enable the
    persistent compilation cache (utils.profiling.enable_compile_cache) for
    production runs.

    Fast-path restrictions (asserted): no meteorite spheres. Terrain is
    supported through a per-lane ground-height lookup (vertical-normal
    approximation, ops/phys_lanes._contact_point notes).
    """
    assert not cfg.crucial, \
        "step_batch supports the no-attack fast path; use vmap(step)"
    assert not cfg.hard_contact, \
        "hard contact runs on the vmap path only; use vmap(step)"
    keys = jax.vmap(lambda k: jax.random.split(k, 6))(states.key)  # (B,6,2)
    key, k_act, k_cmd, k_obs, k_attack, k_reset = (keys[:, i] for i in range(6))

    pre, _ = jax.vmap(lambda s, a, ka, kt: _pre_substeps(cfg, s, a, ka, kt))(
        states, actions, k_act, k_attack)

    from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import phys_lanes as _lanes

    P = _lanes.params_to_lanes(states.params)
    impulse_scale = cfg.contact_impulse_mass / cfg.simulation_dt
    bwT = pre.base_wrench.T
    if cfg.terrain:
        terr = states.terrain  # batched leaves; tr.height broadcasts (B,)
        ground_fn = lambda x, y: tr.height(terr, x, y)  # noqa: E731
    else:
        ground_fn = None

    def substep(carry, _):
        gcT, gvT = carry
        tau = _pd_torque(cfg, pre.ptarget, states.torque_norm_last,
                         gcT[7:].T, gvT[6:].T)               # (B,12)
        out = _lanes.substep(P, gcT, gvT, tau.T, bwT, cfg.contact_slip_vel,
                             impulse_scale, cfg.simulation_dt,
                             ground_fn=ground_fn)
        gc2T, gv2T, toe, toe_vel, fnorm, fnormal = out
        return (gc2T, gv2T), (tau, toe, toe_vel, fnorm, fnormal)

    (gcT, gvT), (taus, toes, toe_vels, fnorms, fnormals) = jax.lax.scan(
        substep, (pre.gc.T, pre.gv.T), None, length=cfg.substeps)

    torque_applied = taus[-1]                                # (B,12)
    last_diag = dyn.StepDiagnostics(
        toe_pos=jnp.moveaxis(toes[-1], -1, 0),               # (B,4,3)
        toe_vel=jnp.moveaxis(toe_vels[-1], -1, 0),
        toe_force_norm=fnorms[-1].T, toe_normal_force=fnormals[-1].T,
        torque=torque_applied)

    return jax.vmap(lambda s, k1, k2, k3, k4, gc, gv, ta, ld, pr:
                    _post_substeps(cfg, s, (k1, k2, k3, k4), gc, gv, ta, ld,
                                   pr, ref_table))(
        states, key, k_cmd, k_obs, k_reset, gcT.T, gvT.T,
        torque_applied, last_diag, pre)


def observe(cfg: EnvConfig, state: EnvState) -> jnp.ndarray:
    return normalize_obs(cfg, state.obs_double)


# --- introspection parity (Environment.hpp:1317-1402) -------------------------

def origin_state(state: EnvState) -> jnp.ndarray:
    """gc(19) + gv(18) + contact(4) = 41 floats (OriginState)."""
    return jnp.concatenate([state.gc, state.gv, state.contact_filtered])


def reference_state(state: EnvState) -> jnp.ndarray:
    return jnp.concatenate([state.joint_ref, state.joint_dot_ref])


def joint_effort(state: EnvState) -> jnp.ndarray:
    return state.torque_applied


def generalized_force(state: EnvState) -> jnp.ndarray:
    """Applied generalized force [base wrench(6); joint torques(12)]
    (GetGeneralizedForce, Environment.hpp:1363-1370)."""
    return jnp.concatenate([state.base_wrench, state.torque_applied])


def inverse_mass_matrix(state: EnvState) -> jnp.ndarray:
    return dyn.inverse_mass_matrix(state.params, state.gc)


def nonlinear(state: EnvState) -> jnp.ndarray:
    return dyn.nonlinearities(state.params, state.gc, state.gv)


def sphere_info(state: EnvState) -> jnp.ndarray:
    """First attack sphere [x, y, z, radius] (GetSphereInfo, Environment.hpp:1423-1436)."""
    return jnp.concatenate([state.cube_pos[0], state.cube_radius[None]])
