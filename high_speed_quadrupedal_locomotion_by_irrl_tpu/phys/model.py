"""BlackPanther rigid-body model compiled to static arrays.

The reference parses ``black_panther.urdf`` at runtime through Raisim
(Environment.hpp:231). Here the same 13-moving-body model (body + 4 x
abduct/thigh/shank, fixed toe links merged into the shanks, the zero-mass
``dummy_mass`` dropped) is compiled once into jnp constants; the per-env
*randomizable* quantities live in a :class:`RobotParams` pytree so that
StochasticDynamics (Environment.hpp:435-477) and SetContactCoefficient
(:1407-1418) vmap over environments.

Numbers sourced from black_panther.urdf (masses/inertias/origins at
urdf:17-21, 62-64, 90-92, 116-118, 152-156 and the leg repeats; joint
origins/axes at urdf:50-56, 78-84, 104-110; toe offset/radius at
urdf:145-162; rotor inertias at urdf:56/110).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# Topology: body indices 0=base, then FR(1,2,3) FL(4,5,6) HR(7,8,9) HL(10,11,12)
# in abduct/thigh/shank order. Joint j (0..11) drives body j+1; dof index 6+j.
# ---------------------------------------------------------------------------

NUM_BODIES = 13
NUM_JOINTS = 12
NV = 18  # generalized velocities: [v_world(3), omega_world(3), qd(12)]
NQ = 19  # generalized coords:     [pos(3), quat wxyz(4), q(12)]

PARENT = np.array([-1, 0, 1, 2, 0, 4, 5, 0, 7, 8, 0, 10, 11])

# Legs: (name, sign_x fore/hind, sign_y right/left). Right legs have y<0.
LEG_SIGNS = [(+1, -1), (+1, +1), (-1, -1), (-1, +1)]  # FR, FL, HR, HL
IS_RIGHT = np.array([True, False, True, False])

# Kinematic constants the reference's gait/IK layer uses (Environment.hpp:1949-1952).
# NOTE: these intentionally differ slightly from the URDF joint offsets (0.201 vs
# 0.209) — the reference has the same inconsistency and the policy was trained
# against it, so both are kept verbatim.
L_HIP = 0.085
L_THIGH = 0.209
L_CALF = 0.2175

TOE_OFFSET_Z = -0.19      # toe joint origin in shank frame (urdf:162)
TOE_RADIUS = 0.0275       # urdf:148
KNEE_OFFSET_Z = -0.201    # thigh->shank joint origin (urdf:106)
HIP_OFFSET_Y = 0.085      # abduct->thigh joint origin (urdf:80)
ABAD_OFFSET = (0.212, 0.051)  # body->abduct joint origin magnitudes (urdf:52)

# Hip positions relative to body center used for the end-effector reward
# (EndEffectorOffset_, Environment.hpp:331-334).
EE_OFFSET = np.array([
    [0.19, -0.058, 0.0],
    [0.19, 0.058, 0.0],
    [-0.19, -0.058, 0.0],
    [-0.19, 0.058, 0.0],
])

BODY_BOX_HALF = np.array([0.15, 0.10, 0.05])  # collision box size/2 (urdf:26)

TORQUE_LIMIT = np.array([18.0, 18.0, 27.0] * 4)       # Environment.hpp:354
ROTOR_INERTIA = np.array([0.003708, 0.003708, 0.008966] * 4)  # urdf:56,110
JOINT_DAMPING = 0.01                                   # urdf <dynamics damping>
GEAR_RATIO = np.array([6.0, 6.0, 9.33] * 4)            # Environment.hpp:167
KNEE_RATIO = 1.55                                      # torque_clamp, Environment.hpp:1291

SHANK_BODY_IDX = np.array([3, 6, 9, 12])  # bodies carrying the toe spheres

# Toe-normal effective (Delassus) mass at the stand pose: 1/(J M^-1 J^T)_nn
# evaluated with phys/dynamics + hard_contact.toe_jacobians — measured
# 0.4699/0.4690 kg front/hind. Used by damping_for_restitution to convert a
# coefficient of restitution into the equivalent linear contact damping.
TOE_EFF_MASS = 0.47

# Stand pose = action mean (Environment.hpp:317-322, abad_=0 default).
STAND_JOINT_POS = np.array([0.0, -0.78, 1.57] * 4)
STAND_BASE_Z = 0.35


def _leg_inertials(sx: int, sy: int):
    """(mass, com, inertia) for abduct/thigh/shank+toe of one leg."""
    # abduct (urdf:60-65): com x sign follows fore/hind, y sign mirrors right/left
    abd_m = 0.54
    abd_com = np.array([0.058 * sx, 0.00485 * sy, 0.0])
    abd_I = np.diag([0.000391, 0.000739, 0.000488])
    # thigh (urdf:88-93): com y +0.019 for right legs, -0.019 for left; iyz flips
    thigh_m = 0.636
    thigh_com = np.array([0.0, -0.019 * sy, -0.01865])
    thigh_I = np.array([
        [0.001724, 0.0, 0.0],
        [0.0, 0.001907, -0.000228 * sy],
        [0.0, -0.000228 * sy, 0.000468],
    ])
    # shank (urdf:114-119) with toe (urdf:152-156) merged across the fixed joint
    sh_m, sh_com, sh_I = 0.064, np.array([0.0, 0.0, -0.0865]), np.diag([0.000716, 0.000721, 0.000012])
    toe_m, toe_com, toe_I = 0.05, np.array([0.0, 0.0, TOE_OFFSET_Z]), np.diag([2.5e-5] * 3)
    m = sh_m + toe_m
    com = (sh_m * sh_com + toe_m * toe_com) / m
    def shift(I, mm, c, c_new):
        d = c - c_new
        return I + mm * (np.dot(d, d) * np.eye(3) - np.outer(d, d))
    I = shift(sh_I, sh_m, sh_com, com) + shift(toe_I, toe_m, toe_com, com)
    return [(abd_m, abd_com, abd_I), (thigh_m, thigh_com, thigh_I), (m, com, I)]


def _build_static():
    masses = [3.72]
    coms = [np.array([0.0, 0.0, -0.003])]
    inertias = [np.diag([0.016269, 0.050813, 0.060989])]
    joint_origin = []   # joint j origin in parent frame
    joint_axis = []     # joint j axis in parent frame
    for (sx, sy) in LEG_SIGNS:
        for (m, c, I) in _leg_inertials(sx, sy):
            masses.append(m); coms.append(c); inertias.append(I)
        joint_origin += [
            np.array([ABAD_OFFSET[0] * sx, ABAD_OFFSET[1] * sy, 0.0]),
            np.array([0.0, HIP_OFFSET_Y * sy, 0.0]),
            np.array([0.0, 0.0, KNEE_OFFSET_Z]),
        ]
        joint_axis += [np.array([1.0, 0.0, 0.0]),
                       np.array([0.0, -1.0, 0.0]),
                       np.array([0.0, -1.0, 0.0])]
    # ancestor-dof mask A[b, d]: dof d is on the path from the base to body b
    A = np.zeros((NUM_BODIES, NV))
    A[:, :6] = 1.0
    for b in range(1, NUM_BODIES):
        p = b
        while p > 0:
            A[b, 6 + p - 1] = 1.0
            p = PARENT[p]
    return (np.array(masses), np.stack(coms), np.stack(inertias),
            np.stack(joint_origin), np.stack(joint_axis), A)


(_MASS, _COM, _INERTIA, _JORIGIN, _JAXIS, _ANC_MASK) = _build_static()


class RobotParams(NamedTuple):
    """Per-environment physical parameters (vmap axis 0 when batched).

    Randomized by :func:`randomize` the way the reference's constructor-time
    StochasticDynamics block perturbs Raisim (Environment.hpp:435-477), plus
    the contact-material override surface of SetContactCoefficient.
    """
    mass: jnp.ndarray           # (13,)
    com: jnp.ndarray            # (13, 3) in body frame
    inertia: jnp.ndarray        # (13, 3, 3) about com, body frame
    joint_origin: jnp.ndarray   # (12, 3) in parent frame (knee z carries calf DR)
    friction: jnp.ndarray       # () ground Coulomb friction
    restitution: jnp.ndarray    # () coefficient of restitution — LIVE in both
                                # contact models (hard: bounce rows in the PGS
                                # v_des; compliant: damping_for_restitution)
    res_threshold: jnp.ndarray  # () restitution velocity threshold [m/s]: no
                                # bounce below it (Raisim material semantics,
                                # SetContactCoefficient Environment.hpp:1407-1418)
    contact_stiffness: jnp.ndarray  # ()
    contact_damping: jnp.ndarray    # () already restitution-mapped (see below)


def damping_for_restitution(kn, d0, e):
    """Linear contact damping realizing coefficient of restitution ``e``.

    For a linear spring-damper impact (mass m, stiffness kn, damping d) the
    rebound ratio is e = exp(-pi*zeta/sqrt(1-zeta^2)) with
    zeta = d / (2*sqrt(kn*m)); inverting, zeta(e) = -ln e / sqrt(pi^2+ln^2 e).
    m is TOE_EFF_MASS (the measured toe-normal Delassus mass at stand).

    Anchoring: e = 0 keeps the configured base damping d0 verbatim (today's
    calibrated overdamped contact: d0=1000 gives zeta ~ 4.2 >> 1, i.e. e ~ 0
    already), and any e > 0 lowers damping to min(d0, d(e)) so the commanded
    bounce is actually produced. This is how the compliant surrogate makes
    the reference's restitution material parameter physically live
    (Raisim honors it in its hard solver; Environment.hpp:433 default
    material is (0.6, 0.2, 0.01))."""
    e = jnp.clip(jnp.asarray(e, jnp.float64 if jnp.asarray(d0).dtype == jnp.float64
                 else jnp.float32), 0.0, 1.0)
    ln_e = jnp.log(jnp.maximum(e, 1e-6))
    zeta = -ln_e / jnp.sqrt(jnp.pi ** 2 + ln_e ** 2)
    d_e = 2.0 * zeta * jnp.sqrt(kn * TOE_EFF_MASS)
    # continuous anchor blend (round-4 advisor): e <= 1e-3 keeps the
    # calibrated d0 verbatim, e >= 2e-3 is the exact impact-law mapping,
    # linear in between — no ~5x damping jump between DR draws an epsilon
    # apart in e (the old hard e > 1e-3 cutoff)
    w = jnp.clip((e - 1e-3) / 1e-3, 0.0, 1.0)
    return d0 + w * (jnp.minimum(d0, d_e) - d0)


def nominal_params(cfg=None) -> RobotParams:
    kn = 30000.0 if cfg is None else cfg.contact_stiffness
    dn = 1000.0 if cfg is None else cfg.contact_damping
    mu = 0.6 if cfg is None else cfg.contact_friction
    rest = 0.0 if cfg is None else cfg.contact_restitution
    thresh = 0.01 if cfg is None else cfg.contact_res_threshold
    return RobotParams(
        mass=jnp.asarray(_MASS),
        com=jnp.asarray(_COM),
        inertia=jnp.asarray(_INERTIA),
        joint_origin=jnp.asarray(_JORIGIN),
        friction=jnp.asarray(mu),
        restitution=jnp.asarray(rest),
        res_threshold=jnp.asarray(thresh),
        contact_stiffness=jnp.asarray(kn),
        contact_damping=damping_for_restitution(
            jnp.asarray(kn), jnp.asarray(dn), rest),
    )


def randomize(key: jax.Array, cfg) -> RobotParams:
    """Domain-randomized params (Environment.hpp:435-477 semantics).

    friction ~ U(0.4, 1.0), restitution ~ U(0, 0.3), restitution threshold
    ~ U(0, 2.0) (drawn like world_->setDefaultMaterial(rand*0.6+0.4,
    rand*0.3, rand*2.0), Environment.hpp:440); the restitution draw is LIVE:
    it sets the hard-contact bounce rows and re-maps the compliant damping
    (damping_for_restitution). Per-link mass * U(1 +- mass_disturbance_ratio);
    com + U(+-com_disturbance); calf length (knee joint z) + one shared
    U(+-calf_disturbance).
    """
    p = nominal_params(cfg)
    k = jax.random.split(key, 6)
    mass = p.mass * (1.0 + jax.random.uniform(k[0], (NUM_BODIES,), minval=-1.0, maxval=1.0)
                     * cfg.mass_disturbance_ratio)
    com = p.com + jax.random.uniform(k[1], (NUM_BODIES, 3), minval=-1.0, maxval=1.0) * cfg.com_disturbance
    dcalf = jax.random.uniform(k[2], (), minval=-1.0, maxval=1.0) * cfg.calf_disturbance
    knee_mask = jnp.asarray(np.array([0.0, 0.0, 1.0] * 4))[:, None] * jnp.array([0.0, 0.0, 1.0])
    joint_origin = p.joint_origin + knee_mask * dcalf
    friction = jax.random.uniform(k[3], (), minval=0.4, maxval=1.0)
    restitution = jax.random.uniform(k[4], (), minval=0.0, maxval=0.3)
    res_threshold = jax.random.uniform(k[5], (), minval=0.0, maxval=2.0)
    return p._replace(mass=mass, com=com, joint_origin=joint_origin,
                      friction=friction, restitution=restitution,
                      res_threshold=res_threshold,
                      contact_damping=damping_for_restitution(
                          p.contact_stiffness, jnp.asarray(cfg.contact_damping),
                          restitution))


# Static (non-randomized) arrays exported for the dynamics kernels.
ANC_MASK = jnp.asarray(_ANC_MASK)
JAXIS = jnp.asarray(_JAXIS)
TORQUE_LIMIT_J = jnp.asarray(TORQUE_LIMIT)
ROTOR_INERTIA_J = jnp.asarray(ROTOR_INERTIA)
EE_OFFSET_J = jnp.asarray(EE_OFFSET)
STAND_GC = jnp.concatenate([
    jnp.array([0.0, 0.0, STAND_BASE_Z, 1.0, 0.0, 0.0, 0.0]),
    jnp.asarray(STAND_JOINT_POS),
])


def stand_gc(abad: float = 0.0) -> jnp.ndarray:
    """gc_init_ (Environment.hpp:317-322): abad sign alternates -,+,-,+."""
    q = jnp.asarray(STAND_JOINT_POS)
    sign = jnp.asarray(np.array([-1.0, 0.0, 0.0, 1.0, 0.0, 0.0, -1.0, 0.0, 0.0, 1.0, 0.0, 0.0]))
    q = q + sign * abad
    return jnp.concatenate([jnp.array([0.0, 0.0, STAND_BASE_Z, 1.0, 0.0, 0.0, 0.0]), q])
