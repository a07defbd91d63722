"""Batched articulated rigid-body dynamics for the BlackPanther quadruped.

Replaces the Raisim world behind the reference's hot loop
(``world_->integrate()`` at Environment.hpp:768, OpenMP-fanned at
VectorizedEnvironment.hpp:273) with a pure-JAX CRBA + RNEA formulation in
world-origin spatial coordinates:

- topology is static (13 bodies), so the tree recursions unroll at trace time
  into fixed einsums over a body axis;
- all functions are single-environment and are ``vmap``-ed by the env layer,
  turning per-body 6x6 algebra into large batched contractions;
- integration is semi-implicit Euler at ``simulation_dt`` (4 kHz), matching
  the reference's substep structure (8 substeps per control step).

Introspection parity: :func:`mass_matrix` / :func:`bias_forces` expose what
the reference exports via GetInverseMassMatrix / GetNonlinear
(Environment.hpp:1375-1402).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import spatial as sp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import contact as ct
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as tr
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys.model import (
    ANC_MASK, JAXIS, JOINT_DAMPING, NUM_BODIES, NV, PARENT, ROTOR_INERTIA_J,
    SHANK_BODY_IDX, TOE_OFFSET_Z, TOE_RADIUS, RobotParams,
)
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.rotation import (
    quat_integrate, quat_to_matrix,
)
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import linalg as _linalg

GRAVITY = jnp.array([0.0, 0.0, -9.81])


def _full_precision(fn):
    """Pin f32 matmul precision inside physics code.

    TPU matmuls default to bf16 inputs — fine for the policy net, fatal for
    rigid-body algebra (mass-matrix entries cancel across ~100x magnitude).
    These contractions are tiny (6x6, 18x18), so HIGHEST costs nothing here.
    """
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped


class Kinematics(NamedTuple):
    R: jnp.ndarray        # (13, 3, 3) body->world rotations
    p: jnp.ndarray        # (13, 3) body frame origins (world)
    com_w: jnp.ndarray    # (13, 3) world com positions
    S: jnp.ndarray        # (6, 18) joint motion subspace (world-origin coords)
    toe_pos: jnp.ndarray  # (4, 3) toe sphere centers (world)


def _axis_angle_matrix(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues rotation for a unit axis."""
    c, s = jnp.cos(angle), jnp.sin(angle)
    K = sp.skew(axis)
    return jnp.eye(3) + s * K + (1.0 - c) * (K @ K)


@_full_precision
def fk(params: RobotParams, gc: jnp.ndarray) -> Kinematics:
    """Forward kinematics for one environment. gc: (19,)."""
    base_p = gc[:3]
    base_R = quat_to_matrix(gc[3:7])
    q = gc[7:]

    Rs = [base_R]
    ps = [base_p]
    axes_w = []
    anchors = []
    for j in range(12):
        b = j + 1
        par = int(PARENT[b])
        Rp, pp = Rs[par], ps[par]
        a_local = JAXIS[j]
        anchor = pp + Rp @ params.joint_origin[j]
        R_b = Rp @ _axis_angle_matrix(a_local, q[j])
        axes_w.append(Rp @ a_local)
        anchors.append(anchor)
        Rs.append(R_b)
        ps.append(anchor)

    R = jnp.stack(Rs)          # (13,3,3)
    p = jnp.stack(ps)          # (13,3)
    axis_w = jnp.stack(axes_w)   # (12,3)
    anchor = jnp.stack(anchors)  # (12,3)
    com_w = p + jnp.einsum("bij,bj->bi", R, params.com)

    # Motion subspace columns, world-origin coords [omega; v_O].
    e = jnp.eye(3)
    lin_cols = jnp.concatenate([jnp.zeros((3, 3)), e], axis=0)               # (6,3)
    ang_cols = jnp.concatenate([e, sp.skew(base_p) @ e], axis=0)             # col k = [e_k; p_base x e_k]
    joint_cols = jnp.concatenate([axis_w.T, jnp.cross(anchor, axis_w).T], axis=0)  # (6,12)
    S = jnp.concatenate([lin_cols, ang_cols, joint_cols], axis=1)            # (6,18)

    toe_local = jnp.array([0.0, 0.0, TOE_OFFSET_Z])
    toe_pos = p[SHANK_BODY_IDX] + jnp.einsum("bij,j->bi", R[SHANK_BODY_IDX], toe_local)
    return Kinematics(R=R, p=p, com_w=com_w, S=S, toe_pos=toe_pos)


@_full_precision
def body_velocities(kin: Kinematics, gv: jnp.ndarray) -> jnp.ndarray:
    """Spatial velocity [omega; v_O] of each body. Returns (13, 6)."""
    return jnp.einsum("pd,bd->bp", kin.S, ANC_MASK * gv)


@_full_precision
def spatial_inertias(params: RobotParams, kin: Kinematics) -> jnp.ndarray:
    """(13, 6, 6) world-origin spatial inertias."""
    I_w = jnp.einsum("bij,bjk,blk->bil", kin.R, params.inertia, kin.R)
    return sp.spatial_inertia(params.mass, kin.com_w, I_w)


@_full_precision
def mass_matrix(params: RobotParams, kin: Kinematics) -> jnp.ndarray:
    """(18, 18) joint-space mass matrix (CRBA as one masked contraction),
    with URDF rotor inertias added on the joint diagonal."""
    I_sp = spatial_inertias(params, kin)
    Sm = kin.S[None, :, :] * ANC_MASK[:, None, :]          # (13,6,18)
    M = jnp.einsum("bpd,bpq,bqe->de", Sm, I_sp, Sm)
    M = 0.5 * (M + M.T)  # scrub f32 accumulation asymmetry before the solve
    return M + jnp.diag(jnp.concatenate([jnp.zeros(6), ROTOR_INERTIA_J]))


@_full_precision
def bias_forces(params: RobotParams, kin: Kinematics, gv: jnp.ndarray,
                f_ext: jnp.ndarray) -> jnp.ndarray:
    """Generalized bias h(q, qd) - tau_ext: Coriolis/centrifugal + gravity
    minus external spatial forces (f_ext: (13, 6) world-origin wrenches).

    RNEA with qdd=0, expressed with the world-origin identity
    Sdot_j = v_parent(j) x S_j (the base columns contribute [0; v_lin x omega]).
    """
    I_sp = spatial_inertias(params, kin)
    v = body_velocities(kin, gv)                            # (13,6)

    # bias accelerations, accumulated down the (statically unrolled) tree
    v_lin, omega = gv[:3], gv[3:6]
    a = [jnp.concatenate([jnp.zeros(3), jnp.cross(v_lin, omega)])]
    for j in range(12):
        b = j + 1
        par = int(PARENT[b])
        Sj = kin.S[:, 6 + j]
        a.append(a[par] + sp.cross_motion(v[par], Sj) * gv[6 + j])
    a = jnp.stack(a)                                        # (13,6)

    Iv = jnp.einsum("bpq,bq->bp", I_sp, v)
    f_grav = sp.force_at_point(
        jnp.broadcast_to(GRAVITY, (NUM_BODIES, 3)) * params.mass[:, None], kin.com_w)
    f_net = jnp.einsum("bpq,bq->bp", I_sp, a) + sp.cross_force(v, Iv) - f_grav - f_ext
    return jnp.einsum("pd,bp,bd->d", kin.S, f_net, ANC_MASK)


class StepDiagnostics(NamedTuple):
    toe_pos: jnp.ndarray        # (4,3)
    toe_vel: jnp.ndarray        # (4,3)
    toe_force_norm: jnp.ndarray  # (4,) |contact force| [N]
    toe_normal_force: jnp.ndarray  # (4,)
    torque: jnp.ndarray         # (12,) applied joint torque after clamp


@_full_precision
def contact_wrenches(params: RobotParams, kin: Kinematics, gv: jnp.ndarray,
                     tp: tr.TerrainParams, slip_vel: float,
                     impulse_scale: float = 0.0):
    """External world-origin wrenches from toe + base-box contact.

    Returns (f_ext (13,6), toe force norms (4,), toe normal forces (4,),
    toe velocities (4,3))."""
    v = body_velocities(kin, gv)
    toe_vel = sp.point_velocity(v[SHANK_BODY_IDX], kin.toe_pos)
    toe_f, toe_fn = ct.point_contact_force(
        kin.toe_pos, toe_vel, TOE_RADIUS, tp,
        params.contact_stiffness, params.contact_damping, params.friction,
        slip_vel, impulse_scale)

    corners = ct.box_corner_points(kin.R[0], kin.p[0])      # (8,3)
    corner_vel = sp.point_velocity(v[0][None, :], corners)
    # the box face (not a sphere) touches the ground: radius 0, lower stiffness
    box_f, _ = ct.point_contact_force(
        corners, corner_vel, 0.0, tp,
        params.contact_stiffness * 0.25, params.contact_damping * 0.25,
        params.friction, slip_vel, impulse_scale)

    f_ext = jnp.zeros((NUM_BODIES, 6))
    f_ext = f_ext.at[SHANK_BODY_IDX].add(sp.force_at_point(toe_f, kin.toe_pos))
    f_ext = f_ext.at[0].add(jnp.sum(sp.force_at_point(box_f, corners), axis=0))
    toe_force_norm = jnp.linalg.norm(toe_f, axis=-1)
    return f_ext, toe_force_norm, toe_fn, toe_vel


@_full_precision
def forward_dynamics(params: RobotParams, gc: jnp.ndarray, gv: jnp.ndarray,
                     tau_joint: jnp.ndarray, base_wrench: jnp.ndarray,
                     tp: tr.TerrainParams, slip_vel: float = 0.1,
                     solver: str = "unrolled",
                     f_ext_extra: jnp.ndarray | None = None,
                     impulse_scale: float = 0.0):
    """qdd = M^-1 (tau - h + contact). base_wrench = [f_world(3); n_base(3)]
    (the generalized-force convention of force_attack, Environment.hpp:866-910).

    f_ext_extra: optional (13, 6) world-origin spatial wrenches added per
    body — the attack-sphere reaction loads (meteoriteAttack collides with
    every robot link in the reference's Raisim world, Environment.hpp:815-861).

    solver: "unrolled" (ops.linalg VPU Cholesky — fastest at runtime) or
    "native" (jnp.linalg.solve — compact HLO; use inside jacobian-heavy
    consumers like the MPC where graph size dominates compile time).
    """
    kin = fk(params, gc)
    f_ext, toe_force_norm, toe_fn, toe_vel = contact_wrenches(
        params, kin, gv, tp, slip_vel, impulse_scale)
    # base wrench -> spatial force at world origin
    f_b, n_b = base_wrench[:3], base_wrench[3:]
    f_ext = f_ext.at[0].add(jnp.concatenate([n_b + jnp.cross(kin.p[0], f_b), f_b]))
    if f_ext_extra is not None:
        f_ext = f_ext + f_ext_extra

    h = bias_forces(params, kin, gv, f_ext)
    M = mass_matrix(params, kin)
    tau = jnp.concatenate([jnp.zeros(6), tau_joint - JOINT_DAMPING * gv[6:]])
    if solver == "unrolled":
        # unrolled SPD solve: every scalar step vectorizes across the env
        # batch under vmap (ops.linalg notes)
        qdd = _linalg.solve_spd(M, tau - h)
    else:
        qdd = jnp.linalg.solve(M, tau - h)
    diag = StepDiagnostics(toe_pos=kin.toe_pos, toe_vel=toe_vel,
                           toe_force_norm=toe_force_norm, toe_normal_force=toe_fn,
                           torque=tau_joint)
    return qdd, diag


@_full_precision
def substep_hard(params: RobotParams, gc: jnp.ndarray, gv: jnp.ndarray,
                 tau_joint: jnp.ndarray, base_wrench: jnp.ndarray,
                 tp: tr.TerrainParams, dt: float,
                 f_ext_extra: jnp.ndarray | None = None,
                 n_iter: int = 12, lam0: jnp.ndarray | None = None):
    """One physics substep with hard (impulse) toe contact.

    Mirrors forward_dynamics + integrate, but toe forces are replaced by a
    velocity-level friction-cone impulse solve (phys/hard_contact.py — the
    Raisim-class contact the reference trains in). The base box keeps the
    compliant model (it only matters during falls). Returns
    (gc2, gv2, StepDiagnostics); diagnostics report the impulse-equivalent
    normal force lam_n/dt and the post-impulse toe velocities (exactly zero
    in stick — what a hard solver gives the contact reward)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import (
        hard_contact as hc,
    )
    kin = fk(params, gc)
    v = body_velocities(kin, gv)
    corners = ct.box_corner_points(kin.R[0], kin.p[0])
    corner_vel = sp.point_velocity(v[0][None, :], corners)
    box_f, _ = ct.point_contact_force(
        corners, corner_vel, 0.0, tp,
        params.contact_stiffness * 0.25, params.contact_damping * 0.25,
        params.friction, 0.1, 0.0)
    f_ext = jnp.zeros((NUM_BODIES, 6))
    f_ext = f_ext.at[0].add(jnp.sum(sp.force_at_point(box_f, corners), axis=0))
    f_b, n_b = base_wrench[:3], base_wrench[3:]
    f_ext = f_ext.at[0].add(jnp.concatenate([n_b + jnp.cross(kin.p[0], f_b), f_b]))
    if f_ext_extra is not None:
        f_ext = f_ext + f_ext_extra

    h = bias_forces(params, kin, gv, f_ext)
    M = mass_matrix(params, kin)
    tau = jnp.concatenate([jnp.zeros(6), tau_joint - JOINT_DAMPING * gv[6:]])
    L = _linalg.cholesky_unrolled(M)  # one factorization: qdd + Delassus
    gv_free = gv + dt * _linalg.solve_cholesky(L, tau - h)

    J = hc.toe_jacobians(kin)
    gap, basis = hc.contact_frames(tp, kin.toe_pos)
    sol = hc.solve_impulses(M, J, gv_free, gap, basis, params.friction, dt,
                            n_iter, lam0=lam0, chol=L,
                            restitution=params.restitution,
                            res_threshold=params.res_threshold)
    gc2, gv2 = integrate(gc, gv, (sol.gv_plus - gv) / dt, dt)
    lam_norm = jnp.linalg.norm(sol.lam, axis=-1) / dt
    diag = StepDiagnostics(toe_pos=kin.toe_pos, toe_vel=sol.toe_vel_plus,
                           toe_force_norm=lam_norm, toe_normal_force=sol.fn,
                           torque=tau_joint)
    return gc2, gv2, diag, sol.lam


def integrate(gc: jnp.ndarray, gv: jnp.ndarray, qdd: jnp.ndarray, dt: float):
    """Semi-implicit Euler: v += dt*a, then q += dt*v_new."""
    gv_new = gv + dt * qdd
    pos = gc[:3] + dt * gv_new[:3]
    quat = quat_integrate(gc[3:7], gv_new[3:6], dt)
    q = gc[7:] + dt * gv_new[6:]
    return jnp.concatenate([pos, quat, q]), gv_new


@_full_precision
def nonlinearities(params: RobotParams, gc: jnp.ndarray, gv: jnp.ndarray) -> jnp.ndarray:
    """Coriolis + gravity vector (GetNonlinear parity, Environment.hpp:1396-1402)."""
    kin = fk(params, gc)
    return bias_forces(params, kin, gv, jnp.zeros((NUM_BODIES, 6)))


@_full_precision
def inverse_mass_matrix(params: RobotParams, gc: jnp.ndarray) -> jnp.ndarray:
    """M^-1 (GetInverseMassMatrix parity, Environment.hpp:1375-1391)."""
    return jnp.linalg.inv(mass_matrix(params, fk(params, gc)))
