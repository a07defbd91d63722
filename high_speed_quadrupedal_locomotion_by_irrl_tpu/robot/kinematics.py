"""Closed-form leg kinematics (pure jnp, branchless, vmap-able).

Same math as the reference's analytic 3-DoF solvers
(``inverse_kinematics``, Environment.hpp:1687-1751; Python twin
GaitGenerator.py:268-306) with the error-print branches replaced by clamps.
Joint convention matches the URDF: q = [abad (about +x), hip (about -y),
knee (about -y)]; the IK's internal (theta1, theta2) are negated into this
convention exactly as the reference does (Environment.hpp:1879-1881).

Uses the gait-layer link constants L_HIP/L_THIGH/L_CALF (0.085/0.209/0.2175,
Environment.hpp:1949-1952) which intentionally differ from the URDF joint
offsets — see phys.model notes.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys.model import (
    IS_RIGHT, L_CALF, L_HIP, L_THIGH,
)

MAX_LEN = float(np.sqrt(L_HIP ** 2 + (L_THIGH + L_CALF) ** 2))
_IS_RIGHT = jnp.asarray(IS_RIGHT)


def leg_ik(p: jnp.ndarray, is_right: jnp.ndarray,
           l_hip: float = L_HIP, l_thigh: float = L_THIGH,
           l_calf: float = L_CALF) -> jnp.ndarray:
    """Toe target in the hip (abad-joint) frame -> leg joint angles (3,).

    Broadcasts over leading batch dims; is_right is boolean (scalar or batch).
    """
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    max_len = jnp.sqrt(l_hip ** 2 + (l_thigh + l_calf) ** 2)
    ll = jnp.sqrt(x * x + y * y + z * z)
    scale = jnp.where(ll > max_len, (max_len - 1e-5) / jnp.maximum(ll, 1e-9), 1.0)
    x, y, z = x * scale, y * scale, z * scale

    yz2 = z * z + y * y
    root = jnp.sqrt(jnp.maximum(y * y * (yz2 - l_hip * l_hip), 0.0))
    t_right = (-z * l_hip - root) / jnp.maximum(yz2, 1e-9)
    t_left = (z * l_hip + root) / jnp.maximum(yz2, 1e-9)
    theta0 = jnp.arcsin(jnp.clip(jnp.where(is_right, t_right, t_left), -1.0, 1.0))

    lr = jnp.sqrt(jnp.maximum(x * x + y * y + z * z - l_hip * l_hip, 1e-12))
    lr = jnp.minimum(lr, l_thigh + l_calf - 1e-4)
    c_knee = (l_thigh ** 2 + l_calf ** 2 - lr * lr) / (2 * l_thigh * l_calf) + 1e-5
    theta2 = -(jnp.pi - jnp.arccos(jnp.clip(c_knee, -1.0, 1.0)))
    s_pitch = jnp.clip(x / lr, -1.0, 1.0)
    c_hip = (lr * lr + l_thigh ** 2 - l_calf ** 2) / (2 * lr * l_thigh) - 1e-5
    theta1 = jnp.arccos(jnp.clip(c_hip, -1.0, 1.0)) - jnp.arcsin(s_pitch)
    return jnp.stack([theta0, -theta1, -theta2], axis=-1)


def leg_fk(q: jnp.ndarray, is_right: jnp.ndarray,
           l_hip: float = L_HIP, l_thigh: float = L_THIGH,
           l_calf: float = L_CALF) -> jnp.ndarray:
    """Joint angles (…,3) -> toe position in the hip (abad-joint) frame."""
    q0, q1, q2 = q[..., 0], q[..., 1], q[..., 2]
    sy = jnp.where(is_right, -1.0, 1.0)
    # chain: Rx(q0) [ (0, sy*lh, 0) + R-y(q1) ( (0,0,-l1) + R-y(q2)(0,0,-l2) ) ]
    # with R-y(a) = rotation about (0,-1,0)
    s1, c1 = jnp.sin(q1), jnp.cos(q1)
    s12, c12 = jnp.sin(q1 + q2), jnp.cos(q1 + q2)
    px = l_thigh * s1 + l_calf * s12
    pz_leg = -(l_thigh * c1 + l_calf * c12)
    c0, s0 = jnp.cos(q0), jnp.sin(q0)
    py = sy * l_hip * c0 - pz_leg * s0
    pz = sy * l_hip * s0 + pz_leg * c0
    return jnp.stack([px, py, pz], axis=-1)


def legs_ik(targets: jnp.ndarray) -> jnp.ndarray:
    """(4,3) hip-frame toe targets (FR,FL,HR,HL) -> (12,) joint angles."""
    return leg_ik(targets, _IS_RIGHT).reshape(-1)


def legs_fk(q: jnp.ndarray) -> jnp.ndarray:
    """(12,) joint angles -> (4,3) hip-frame toe positions."""
    return leg_fk(q.reshape(4, 3), _IS_RIGHT)
