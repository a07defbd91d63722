"""Convex single-rigid-body (SRB) trot-MPC — the high-rate production solver.

The whole-body iLQR (mpc/trot.py) differentiates through the full contact
dynamics: accurate but jacobian-bound. This module is the TPU-native analog
of the controller actually deployed on MIT-Mini-Cheetah-class robots
(Di Carlo et al., "Dynamic Locomotion in the MIT Cheetah 3 Through Convex
Model-Predictive Control", IROS 2018 — public method): the robot is a single
rigid body driven by ground-reaction forces at gait-scheduled footholds, the
dynamics are linear time-varying with *analytic* A_t/B_t (no AD), and the
optimal force profile is one affine time-varying-LQR Riccati sweep followed
by a friction-cone projection.

Everything is built batched:
- per-knot A_t/B_t assembly is a `vmap` over the horizon (analytic, cheap);
- the Riccati backward pass is a `lax.scan` of (13,13)/(13,12) dense algebra
  that vmaps over thousands of simultaneous problems per chip;
- there are NO nonlinear iterations and NO line search — the solve cost is
  ~50 small matmul knots, which is how 4-digit solves/s/chip are reached
  honestly (BASELINE.json: 1024+ batched trot-MPC solves/s).

The solved GRFs map back to the same normalized PD-target control sequence
the bp5 policy emits (swing legs track the Bezier/IK reference exactly as
the imitation reward does; stance legs add a torque-feedforward admittance
offset tau/kp), so srb control sequences are directly comparable to
bp5_155 actions (analysis/parity.py).

Reference context: the gait schedule, foothold pattern and stand pose come
from the same generator the env uses (Environment.hpp:1756-1890); mass /
composite inertia come from the URDF-derived model (phys/model.py).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import linalg
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import dynamics as dyn
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import gait
from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import kinematics as kin
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.rotation import quat_to_matrix

_G = 9.81
NX = 13  # [rpy(3) p(3) omega_world(3) v(3) g-const(1)]
NU = 12  # 4 x GRF


@dataclasses.dataclass(frozen=True)
class SRBConfig:
    horizon: int = 50
    # weights in the spirit of the MIT convex-MPC defaults
    w_rpy: tuple = (40.0, 40.0, 20.0)
    w_pos: tuple = (5.0, 5.0, 200.0)
    w_omega: tuple = (1.0, 1.0, 2.0)
    w_vel: tuple = (8.0, 8.0, 2.0)
    r_force: float = 4e-5
    mu: float = 0.6            # friction-cone slope for the projection
    fz_max: float = 120.0      # per-leg normal force bound [N]
    decimation: int = 1        # knot dt = decimation * control_dt
    # Raibert foothold correction: shift every foothold by
    # raibert_gain * (v_meas - v_cmd) — feet land behind neutral when the
    # robot is slow so stance pushes it forward (Raibert 1986). The sweep
    # itself stays command-paced: with PD-position actuation the kinematic
    # stance sweep IS the propulsion mechanism, so pacing it by measured
    # velocity self-stalls (measured_sweep=True reproduces that failure;
    # kept for study).
    raibert_gain: float = 0.03
    measured_sweep: bool = False   # legacy alias for sweep_mode="measured"
    # how the gait schedule (stance sweep + footholds) is paced:
    #  "command"  — by the commanded velocity (feet outrun the body when
    #               slow -> kinetic-friction-limited, the round-1 plateau)
    #  "measured" — by the measured velocity (self-stalls from rest: no
    #               sweep -> no kinematic propulsion to bootstrap)
    #  "planned"  — by the accel-ramped reference velocity at mid-horizon:
    #               the schedule leads the body by exactly what the force
    #               plan can deliver (the fix for both failure modes)
    sweep_mode: str = "command"
    sweep_gain: float = 1.0        # scales the sweep pace (>1 adds slip
                                   # margin for the regularized friction)
    touchdown_match: bool = False  # MPC-grade gait profile: linear stance
                                   # sweep + late-swing retraction
                                   # (robot.gait.toe_targets notes)
    # feasible-acceleration ramp for the velocity reference [m/s^2]:
    # an instant v=cmd step reference makes the TV-LQR slam single legs into
    # the friction-cone/fz_max corner (measured: 219 N vertical on one leg
    # from rest -> hopping); ramping from the measured velocity keeps the
    # plan inside the cone. 0 disables (the old step reference).
    accel_ramp: float = 4.0


class SRBProblem(NamedTuple):
    x0: jnp.ndarray         # (13,) initial SRB state (g-const = 1)
    command: jnp.ndarray    # (3,) [vx, vy, wz]
    t0: jnp.ndarray         # () gait clock at the first knot
    yaw0: jnp.ndarray       # () current yaw
    v_meas: jnp.ndarray     # (2,) measured body-frame (vx, vy) for Raibert


class SRBResult(NamedTuple):
    forces: jnp.ndarray     # (T, 4, 3) world-frame GRFs (cone-projected)
    xs: jnp.ndarray         # (T+1, 13) predicted SRB trajectory
    us: jnp.ndarray         # (T, 12) normalized PD-target control sequence
    cost: jnp.ndarray       # () tracking cost of the projected solution


# --- model constants derived once from the URDF arrays -------------------------

@functools.lru_cache(maxsize=4)
def _srb_constants(abad: float):
    """(total mass, composite body inertia at stand pose about the COM).

    Evaluated eagerly (compile-time) — the result is a pair of numpy
    constants baked into the solver graph."""
    with jax.ensure_compile_time_eval():
        params = mdl.nominal_params()
        gc = mdl.stand_gc(abad)
        k = dyn.fk(params, gc)
        m = np.asarray(params.mass)
        com_w = np.asarray(k.com_w)
        total_m = float(m.sum())
        com = (m[:, None] * com_w).sum(0) / total_m
        R = np.asarray(k.R)
        I_w = np.einsum("bij,bjk,blk->bil", R, np.asarray(params.inertia), R)
        I_tot = np.zeros((3, 3))
        for b in range(m.shape[0]):
            r = com_w[b] - com
            I_tot += I_w[b] + m[b] * (np.dot(r, r) * np.eye(3) - np.outer(r, r))
    return total_m, I_tot


def _rz(yaw):
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def _skew(v):
    return jnp.array([[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]])


def stance_mask(cfg: EnvConfig, t: jnp.ndarray) -> jnp.ndarray:
    """(4,) 1.0 while the gait schedule has the leg in stance."""
    ph = jnp.mod(t + jnp.asarray(cfg.phase_offsets) * cfg.period,
                 cfg.period) / cfg.period
    return (ph < cfg.lam).astype(jnp.float32)


def foot_positions_body(cfg: EnvConfig, command: jnp.ndarray,
                        t: jnp.ndarray,
                        xy_shift: jnp.ndarray | None = None,
                        touchdown_match: bool = False) -> jnp.ndarray:
    """(4,3) scheduled foot positions relative to the body center (body frame)."""
    toe = gait.toe_targets(cfg, command, t, touchdown_match)  # hip-frame targets
    if xy_shift is not None:
        toe = toe.at[:, 0].add(xy_shift[0]).at[:, 1].add(xy_shift[1])
    return toe + jnp.asarray(mdl.EE_OFFSET)


def _knot_matrices(cfg: EnvConfig, scfg: SRBConfig, sched_cmd, xy_shift,
                   t, yaw, m, I_inv):
    """Analytic (A, B) for one knot (discretized with forward Euler + the
    exact p<-v coupling), plus the stance gating used for both B and the
    cone projection.

    Built scatter-free (block concatenation, no .at) and inverse-free
    (I_w^-1 = Rz I_body^-1 Rz^T with I_body^-1 precomputed) — the assembly
    is vmapped over horizon x problems, so per-knot LU inverses and scatter
    ops dominated the whole solve before this."""
    dt = cfg.control_dt * scfg.decimation
    Rz = _rz(yaw)
    I_w_inv = Rz @ I_inv @ Rz.T

    r = jnp.einsum("ij,lj->li", Rz,
                   foot_positions_body(cfg, sched_cmd, t, xy_shift,
                                       scfg.touchdown_match))  # (4,3)
    sm = stance_mask(cfg, t)

    z33 = jnp.zeros((3, 3))
    z31 = jnp.zeros((3, 1))
    e33 = jnp.eye(3)
    g_col = jnp.array([[0.0], [0.0], [-_G * dt]])
    A = jnp.block([
        [e33, z33, Rz.T * dt, z33, z31],
        [z33, e33, z33, e33 * dt, z31],
        [z33, z33, e33, z33, z31],
        [z33, z33, z33, e33, g_col],
        [jnp.zeros((1, 12)), jnp.ones((1, 1))],
    ])

    gate = (dt * sm)[:, None, None]                       # (4,1,1)
    rx = jax.vmap(_skew)(r)                               # (4,3,3)
    b_ang = jnp.einsum("ij,ljk->ilk", I_w_inv, rx) * gate.transpose(1, 0, 2)
    b_ang = b_ang.reshape(3, NU)                          # rows 6:9
    b_lin = (jnp.broadcast_to(e33[None], (4, 3, 3)) / m * gate)
    b_lin = b_lin.transpose(1, 0, 2).reshape(3, NU)       # rows 9:12
    B = jnp.concatenate([jnp.zeros((6, NU)), b_ang, b_lin, jnp.zeros((1, NU))])
    return A, B, sm, r


def _reference_states(cfg: EnvConfig, scfg: SRBConfig, prob: SRBProblem):
    """(T+1, 13) reference trajectory from the command (accel-ramped)."""
    dt = cfg.control_dt * scfg.decimation
    T = scfg.horizon
    ts = jnp.arange(T + 1) * dt
    vx, vy, wz = prob.command[0], prob.command[1], prob.command[2]
    yaw = prob.yaw0 + wz * ts
    v_world = jnp.stack([vx * jnp.cos(yaw) - vy * jnp.sin(yaw),
                         vx * jnp.sin(yaw) + vy * jnp.cos(yaw),
                         jnp.zeros_like(yaw)], axis=-1)
    if scfg.accel_ramp > 0.0:
        # decay the initial velocity error at a feasible rate (see SRBConfig)
        e0 = v_world[0] - prob.x0[9:12]
        shrink = jnp.maximum(jnp.abs(e0)[None] - scfg.accel_ramp * ts[:, None],
                             0.0)
        v_world = v_world - jnp.sign(e0)[None] * shrink
    p0 = prob.x0[3:6]
    p = p0[None] + jnp.cumsum(
        jnp.concatenate([jnp.zeros((1, 3)), v_world[:-1] * dt]), axis=0)
    p = p.at[:, 2].set(cfg.stand_height)
    rpy = jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw), yaw], axis=-1)
    omega = jnp.stack([jnp.zeros_like(yaw), jnp.zeros_like(yaw),
                       jnp.full_like(yaw, wz)], axis=-1)
    ones = jnp.ones((T + 1, 1))
    return jnp.concatenate([rpy, p, omega, v_world, ones], axis=-1)


def make_problem(cfg: EnvConfig, gc: jnp.ndarray, gv: jnp.ndarray,
                 command: jnp.ndarray, t0: jnp.ndarray) -> SRBProblem:
    """SRB state from generalized coordinates (same inputs as trot.make_problem)."""
    R = quat_to_matrix(gc[3:7])
    # ZYX euler from R (yaw-pitch-roll)
    yaw = jnp.arctan2(R[1, 0], R[0, 0])
    pitch = jnp.arcsin(-jnp.clip(R[2, 0], -1.0, 1.0))
    roll = jnp.arctan2(R[2, 1], R[2, 2])
    x0 = jnp.concatenate([
        jnp.stack([roll, pitch, yaw]), gc[:3], gv[3:6], gv[:3], jnp.ones(1)])
    v_body = R.T @ gv[:3]
    return SRBProblem(x0=x0, command=command, t0=t0, yaw0=yaw,
                      v_meas=v_body[:2])


def _project_cone(f: jnp.ndarray, sm: jnp.ndarray, mu: float,
                  fz_max: float) -> jnp.ndarray:
    """Per-leg friction-cone + unilateral projection. f: (4,3), sm: (4,)."""
    fz = jnp.clip(f[:, 2], 0.0, fz_max)
    lim = mu * fz
    fx = jnp.clip(f[:, 0], -lim, lim)
    fy = jnp.clip(f[:, 1], -lim, lim)
    return jnp.stack([fx, fy, fz], axis=-1) * sm[:, None]


def sweep_command(cfg: EnvConfig, scfg: SRBConfig,
                  prob: SRBProblem) -> jnp.ndarray:
    """(3,) velocity that paces the gait schedule (see SRBConfig.sweep_mode).
    Shared by solve() and the closed-loop runtime so the stance-force plan
    and the swing-leg references always follow the same schedule."""
    mode = "measured" if scfg.measured_sweep else scfg.sweep_mode
    if mode == "measured":
        v = prob.v_meas
    elif mode == "planned":
        t_mid = 0.5 * scfg.horizon * cfg.control_dt * scfg.decimation
        e = prob.command[:2] - prob.v_meas
        v = prob.v_meas + jnp.sign(e) * jnp.minimum(jnp.abs(e),
                                                    scfg.accel_ramp * t_mid)
    else:
        v = prob.command[:2]
    return jnp.concatenate([v * scfg.sweep_gain, prob.command[2:3]])


def solve(cfg: EnvConfig, scfg: SRBConfig, prob: SRBProblem) -> SRBResult:
    """One affine TV-LQR sweep + friction-cone projection + forward rollout."""
    m, I_body = _srb_constants(cfg.abad)
    m = jnp.asarray(m)
    I_inv = jnp.asarray(np.linalg.inv(I_body))
    T = scfg.horizon
    dt = cfg.control_dt * scfg.decimation
    ts = prob.t0 + jnp.arange(T) * dt
    yaw_ref = prob.yaw0 + prob.command[2] * jnp.arange(T) * dt

    xy_shift = scfg.raibert_gain * (prob.v_meas - prob.command[:2])
    sched_cmd = sweep_command(cfg, scfg, prob)
    A, B, sm, r = jax.vmap(
        lambda t, y: _knot_matrices(cfg, scfg, sched_cmd, xy_shift, t, y, m, I_inv)
    )(ts, yaw_ref)                                   # (T,13,13), (T,13,12), (T,4), (T,4,3)

    x_ref = _reference_states(cfg, scfg, prob)       # (T+1,13)
    Q = jnp.diag(jnp.asarray(list(scfg.w_rpy) + list(scfg.w_pos) +
                             list(scfg.w_omega) + list(scfg.w_vel) + [0.0]))
    Rm = scfg.r_force * jnp.eye(NU)

    # gravity feedforward: penalize deviation from the weight-sharing force
    # (keeps R regularization from dragging stance forces to zero)
    n_st = jnp.maximum(jnp.sum(sm, axis=1), 1.0)          # (T,)
    f_ff = (sm * (m * _G / n_st)[:, None])[:, :, None] * jnp.array([0.0, 0.0, 1.0])
    u_ff = f_ff.reshape(T, NU)                            # (T,12)

    q_diag = jnp.diag(Q)

    def backward(carry, inp):
        # stage cost 1/2 (x-xr)'Q(x-xr) + 1/2 (u-uf)'R(u-uf).
        # Everything here is unrolled to scalar ops (ops/linalg.py): under
        # the problem vmap each scalar is one (B,)-wide VPU op, while XLA's
        # batched 13x13 GEMMs pad MXU tiles at ~1% utilization — the
        # backward scan was the dominant phase of the whole solve
        # (scripts/profile_srb.py: 32 of 33 ms at batch 1024).
        V, v = carry
        A_t, B_t, xr, uf = inp
        VA = linalg.matmul_unrolled(V, A_t)                        # (13,13)
        VB = linalg.matmul_unrolled(V, B_t)                        # (13,12)
        Quu = Rm + linalg.matmul_unrolled(B_t, VB, transpose_a=True)
        Qux = linalg.matmul_unrolled(B_t, VA, transpose_a=True)    # (12,13)
        # Rm = r_force * I, Q diagonal: apply as elementwise scales
        qu = linalg.matvec_unrolled(B_t, v, transpose_a=True) - scfg.r_force * uf
        # one unrolled-Cholesky factorization for [qu | Qux]
        sol = linalg.solve_spd(Quu + 1e-9 * jnp.eye(NU),
                               jnp.concatenate([qu[:, None], Qux], axis=1))
        k, K = sol[:, 0], sol[:, 1:]
        Vn = (Q + linalg.matmul_unrolled(A_t, VA, transpose_a=True)
              - linalg.matmul_unrolled(Qux, K, transpose_a=True))
        vn = (-q_diag * xr + linalg.matvec_unrolled(A_t, v, transpose_a=True)
              - linalg.matvec_unrolled(Qux, k, transpose_a=True))
        Vn = 0.5 * (Vn + Vn.T)
        return (Vn, vn), (K, k)

    V_T = Q
    v_T = -Q @ x_ref[-1]
    _, (Ks, ks) = jax.lax.scan(backward, (V_T, v_T),
                               (A, B, x_ref[:-1], u_ff), reverse=True)

    def forward(x, inp):
        A_t, B_t, K_t, k_t, sm_t = inp
        u = -linalg.matvec_unrolled(K_t, x) - k_t
        f = _project_cone(u.reshape(4, 3), sm_t, scfg.mu, scfg.fz_max)
        x2 = (linalg.matvec_unrolled(A_t, x)
              + linalg.matvec_unrolled(B_t, f.reshape(NU)))
        return x2, (f, x2)

    _, (forces, xs_tail) = jax.lax.scan(forward, prob.x0, (A, B, Ks, ks, sm))
    xs = jnp.concatenate([prob.x0[None], xs_tail], axis=0)

    err = xs - x_ref
    cost = 0.5 * jnp.einsum("ti,ij,tj->", err, Q, err) * dt

    us = _grf_to_controls(cfg, sched_cmd, xy_shift, ts, forces, sm, yaw_ref,
                          scfg.touchdown_match)
    return SRBResult(forces=forces, xs=xs, us=us, cost=cost)


def _grf_to_controls(cfg: EnvConfig, command, xy_shift, ts, forces, sm, yaw_ref,
                     touchdown_match: bool = False):
    """GRF plan -> normalized PD-target sequence comparable to bp5 actions.

    Swing legs: pure gait-reference tracking (u = q_ref - stand), exactly the
    imitation target. Stance legs: add the torque-feedforward admittance
    tau/kp with tau = -J(q_ref)' R_b' f (force expressed in body frame)."""
    stand = mdl.stand_gc(cfg.abad)[7:]
    gains = jnp.asarray([cfg.abad_ratio, 1.0, 1.0] * 4) * cfg.stiffness

    def one_knot(t, f, sm_t, yaw):
        q_ref = gait.gait_reference(cfg, command, t, xy_shift,
                                    touchdown_match).joint_ref  # (12,)
        f_body = jnp.einsum("ij,li->lj", _rz(yaw), f)               # world->body
        J = jax.vmap(jax.jacfwd(lambda q, i: kin.leg_fk(q, i)), in_axes=(0, 0))(
            q_ref.reshape(4, 3), jnp.asarray(mdl.IS_RIGHT))         # (4,3,3)
        tau = -jnp.einsum("lij,li->lj", J, f_body) * sm_t[:, None]  # (4,3)
        return (q_ref - stand) + tau.reshape(12) / gains

    return jax.vmap(one_knot)(ts, forces, sm, yaw_ref)


def grf_to_torque(cfg: EnvConfig, gc: jnp.ndarray, f_world: jnp.ndarray,
                  sm: jnp.ndarray, stance_pd: float = 0.0,
                  swing_pd: float = 1.0):
    """Convert2Torque: map the first-knot GRF plan to direct joint torques.

    The capability the reference declares but never implements
    (Environment.hpp:1629, 2024). Stance legs: tau = -J(q)' R' f — the
    leg-jacobian transpose of the commanded ground-reaction force, evaluated
    at the *measured* joint angles and full body orientation (not the
    schedule), which is what a real low-level leg controller does. Swing
    legs keep full PD. Returns ``(tau_ff (12,), pd_scale (12,))`` for
    envs.blackpanther.step; ``stance_pd`` leaves a fraction of PD feedback
    on stance legs (0 = pure force control)."""
    R = quat_to_matrix(gc[3:7])
    f_body = jnp.einsum("ij,li->lj", R, f_world)             # R^T f: world->body
    q = gc[7:].reshape(4, 3)
    J = jax.vmap(jax.jacfwd(lambda qq, i: kin.leg_fk(qq, i)), in_axes=(0, 0))(
        q, jnp.asarray(mdl.IS_RIGHT))                        # (4,3,3)
    tau = -jnp.einsum("lij,li->lj", J, f_body) * sm[:, None]  # (4,3)
    # swing_pd > 1 stiffens swing tracking (the policy's kp=40 is too soft
    # to realize swing-leg retraction; the motor-envelope clamp still
    # applies, so this stays within the same actuator limits)
    pd_scale = jnp.repeat(swing_pd - (swing_pd - stance_pd) * sm, 3)  # (12,)
    return tau.reshape(12), pd_scale


def batched_solve(cfg: EnvConfig, scfg: SRBConfig, probs: SRBProblem) -> SRBResult:
    """vmap over problems: thousands of simultaneous solves per chip."""
    return jax.vmap(functools.partial(solve, cfg, scfg))(probs)


def standing_problem(cfg: EnvConfig, command: jnp.ndarray,
                     t0: jnp.ndarray = None) -> SRBProblem:
    x0 = jnp.concatenate([jnp.zeros(3),
                          jnp.array([0.0, 0.0, cfg.stand_height]),
                          jnp.zeros(6), jnp.ones(1)])
    return SRBProblem(x0=x0, command=command,
                      t0=jnp.asarray(0.0) if t0 is None else t0,
                      yaw0=jnp.asarray(0.0), v_meas=command[:2])
