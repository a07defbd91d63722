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


def _update_references(cfg: EnvConfig, key: jax.Array, command: jnp.ndarray,
                       command_filtered: jnp.ndarray, joint_ref_prev: jnp.ndarray,
                       t: jnp.ndarray, is_reset: bool):
    """command_obs_update(flag_reset) for the ManualTraj mode.

    Returns (command, command_filtered, GaitRef, joint_ref_last_for_dot).
    """
    if cfg.manual:
        # manual mode: commands injected by the driver; references frozen
        ref = gait.GaitRef(joint_ref=joint_ref_prev, toe=jnp.zeros((4, 3)),
                           ee_ref=jnp.zeros(12))
        return command, command_filtered, ref, joint_ref_prev

    command = _resample_command(cfg, key, command, jnp.asarray(is_reset))
    if is_reset:
        command_filtered = command
    else:
        command_filtered = (command_filtered * cfg.cmd_update_param
                            + command * (1.0 - cfg.cmd_update_param))
    ref = gait.gait_reference(cfg, command_filtered, t)
    if is_reset:
        # jointRefLast from t - dt so jointDotRef is well-defined at reset
        ref_last = gait.gait_reference(cfg, command_filtered, t - cfg.control_dt)
        joint_ref_last = ref_last.joint_ref
    else:
        joint_ref_last = joint_ref_prev
    return command, command_filtered, ref, joint_ref_last


# --- observation (updateObservation, Environment.hpp:956-1004) ---------------

def _raw_observation(cfg: EnvConfig, key: jax.Array, gc: jnp.ndarray, gv: jnp.ndarray,
                     command_filtered: jnp.ndarray, t: jnp.ndarray):
    """Unnormalized 35-d obs with sensor noise; also returns body-frame vels."""
    kj, kv, kp, kw = jax.random.split(key, 4)
    nf = cfg.obs_noise
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

def env_init(cfg: EnvConfig, key: jax.Array) -> EnvState:
    """Construction-time state: domain randomization + terrain + first reset.

    Mirrors the ENVIRONMENT constructor followed by reset()
    (VectorizedEnvironment.hpp:172-182).
    """
    k_dr, k_tr, k_reset = jax.random.split(key, 3)
    params = (mdl.randomize(k_dr, cfg) if cfg.stochastic_dynamics
              else mdl.nominal_params(cfg))
    terrain = tr.fractal(k_tr) if cfg.terrain else tr.flat()
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
    )
    return reset(cfg, blank)


def _init_joint_ref(cfg: EnvConfig) -> jnp.ndarray:
    sign = jnp.asarray(np.array([-1.0, 0, 0, 1.0, 0, 0, -1.0, 0, 0, 1.0, 0, 0]))
    return sign * cfg.abad


def reset(cfg: EnvConfig, state: EnvState) -> EnvState:
    """reset() (Environment.hpp:547-635): random phase start, command resample,
    joint pose/vel perturbed +-30% around the gait reference, base velocity
    seeded from the command +-20%, random xy +-5 m. Dynamics params and the raw
    command persist across resets (reference semantics)."""
    key, k_t, k_cmd, k_jp, k_jv, k_bv, k_xy, k_obs = jax.random.split(state.key, 8)

    t0 = jnp.where(cfg.manual, 0.0, jax.random.uniform(k_t))
    command, command_filtered, ref, joint_ref_last = _update_references(
        cfg, k_cmd, state.command, jnp.zeros(3), state.joint_ref, t0, is_reset=True)
    joint_dot_ref = (ref.joint_ref - joint_ref_last) / cfg.control_dt

    jp_noise = jax.random.uniform(k_jp, (12,), minval=-1.0, maxval=1.0)
    jv_noise = jax.random.uniform(k_jv, (12,), minval=-1.0, maxval=1.0)
    bv_noise = jax.random.uniform(k_bv, (3,), minval=-1.0, maxval=1.0)
    q0 = ref.joint_ref * (1.0 + 0.3 * jp_noise)
    qd0 = joint_dot_ref * (1.0 + 0.3 * jv_noise)
    vx = command_filtered[0] * (0.2 * bv_noise[0] + 1.0)
    vx = jnp.where(cfg.wildcat, -vx, vx)
    vy = command_filtered[1] * (0.2 * bv_noise[1] + 1.0)
    wz = command_filtered[2] * (0.2 * bv_noise[2] + 1.0)
    xy = jnp.where(cfg.manual, jnp.zeros(2),
                   jax.random.uniform(k_xy, (2,), minval=-5.0, maxval=5.0))

    stand = mdl.stand_gc(cfg.abad)
    gc = jnp.concatenate([xy, stand[2:3], stand[3:7],
                          jnp.where(cfg.manual, stand[7:], q0)])
    gv = jnp.concatenate([jnp.array([vx, vy, 0.0, 0.0, 0.0, wz]), qd0])
    gv = jnp.where(cfg.manual, jnp.zeros(18), gv)

    obs, v_body, w_body, R = _raw_observation(cfg, k_obs, gc, gv, command_filtered, t0)

    # post-obs reference regeneration (command_obs_update(false) at reset tail)
    key, k_cmd2 = jax.random.split(key)
    command, command_filtered, ref2, joint_ref_last2 = _update_references(
        cfg, k_cmd2, command, command_filtered, ref.joint_ref, t0, is_reset=False)
    joint_dot_ref = (ref2.joint_ref - joint_ref_last2) / cfg.control_dt
    obs = obs.at[:3].set(command_filtered)

    return state._replace(
        gc=gc, gv=gv, key=key,
        torque_norm_last=jnp.zeros(12), torque_applied=jnp.zeros(12),
        base_wrench=jnp.zeros(6),
        command=command, command_filtered=command_filtered,
        joint_ref=ref2.joint_ref, joint_ref_last=ref2.joint_ref,
        joint_dot_ref=joint_dot_ref, ee_ref=ref2.ee_ref,
        current_time=t0 + cfg.control_dt, frame_idx=jnp.ones((), jnp.int32),
        contact_filtered=jnp.zeros(4), contact_force_norm=jnp.zeros(4),
        contact_vel_norm=jnp.zeros(4),
        obs_double=obs, obs_last=obs,
        done=jnp.zeros((), bool), ep_return=jnp.zeros(()), ep_len=jnp.zeros((), jnp.int32),
        reward_terms=jnp.zeros(8),
    )


# --- step ----------------------------------------------------------------------

def step(cfg: EnvConfig, state: EnvState, action: jnp.ndarray) -> StepOut:
    """One control step (= cfg.substeps physics substeps) with auto-reset."""
    key, k_act, k_cmd, k_obs, k_attack, k_reset = jax.random.split(state.key, 6)

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

    # -- 8 physics substeps, PD torque recomputed from fresh state (:758-774)
    gain_pattern = jnp.asarray(np.array([cfg.abad_ratio, 1.0, 1.0] * 4))
    kp_vec = cfg.stiffness * gain_pattern
    kd_vec = cfg.damping * gain_pattern

    def substep(carry, _):
        gc, gv = carry
        tau = kp_vec * (ptarget - gc[7:]) - kd_vec * gv[6:]
        tau = 0.99 * tau + 0.01 * state.torque_norm_last  # reference quirk, see notes
        tau = torque_clamp(cfg, tau, gv[6:])
        qdd, diag = dyn.forward_dynamics(state.params, gc, gv, tau, base_wrench,
                                         state.terrain, cfg.contact_slip_vel)
        gc2, gv2 = dyn.integrate(gc, gv, qdd, cfg.simulation_dt)
        return (gc2, gv2), (tau, diag)

    (gc, gv), (taus, diags) = jax.lax.scan(
        substep, (state.gc, state.gv), None, length=cfg.substeps)
    torque_applied = taus[-1]
    last_diag = jax.tree.map(lambda x: x[-1], diags)

    # -- observation at the new state (time = state.current_time)
    t = state.current_time
    obs, v_body, w_body, R = _raw_observation(cfg, k_obs, gc, gv,
                                              state.command_filtered, t)

    # -- contact information (impulse-scaled force norm, see SURVEY notes)
    contact_force_norm = last_diag.toe_force_norm * (cfg.simulation_dt / cfg.control_dt)
    contact_vel_norm = jnp.linalg.norm(last_diag.toe_vel, axis=-1)
    contact_flag = (last_diag.toe_normal_force > 0.0).astype(jnp.float32)

    # -- reward against the references generated last step
    rew = deep_mimic_reward(
        cfg, t, gc, gv, obs, v_body, w_body, R, last_diag.toe_pos,
        state.joint_ref, state.joint_dot_ref, state.ee_ref, state.command_filtered,
        torque_applied, state.torque_norm_last, contact_vel_norm, contact_force_norm)

    # -- next references (command_obs_update(false) after reward, :784)
    command, command_filtered, ref, joint_ref_last = _update_references(
        cfg, k_cmd, state.command, state.command_filtered, state.joint_ref,
        t, is_reset=False)
    joint_dot_ref = (ref.joint_ref - joint_ref_last) / cfg.control_dt
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
        joint_ref=ref.joint_ref, joint_ref_last=ref.joint_ref,
        joint_dot_ref=joint_dot_ref, ee_ref=ref.ee_ref,
        current_time=t + cfg.control_dt, frame_idx=state.frame_idx + 1,
        contact_filtered=contact_flag, contact_force_norm=contact_force_norm,
        contact_vel_norm=contact_vel_norm,
        obs_double=obs, obs_last=obs,
        done=done, ep_return=state.ep_return + reward, ep_len=state.ep_len + 1,
        reward_terms=rew.terms,
    )

    # -- auto-reset with terminal reward (perAgentStep, VectorizedEnvironment.hpp:352-372)
    reset_state = reset(cfg, new_state._replace(key=k_reset))
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


def inverse_mass_matrix(state: EnvState) -> jnp.ndarray:
    return dyn.inverse_mass_matrix(state.params, state.gc)


def nonlinear(state: EnvState) -> jnp.ndarray:
    return dyn.nonlinearities(state.params, state.gc, state.gv)
