"""Quaternion / rotation utilities (pure jnp, fully vmap/jit-able).

Covers the capability surface of the reference's ``IRRL/script/utils/Rotation.py``
(qua2euler, euler2qua, batched qua2matrix) plus the quaternion algebra the
physics core needs. Quaternions are wxyz (scalar first), matching the
reference's generalized-coordinate layout (Environment.hpp:302 comment:
"3 position, 4 quaternion, 12 joint").
"""

from __future__ import annotations

import jax.numpy as jnp


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion -> 3x3 rotation matrix (body->world). Batch-friendly."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
        2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
        2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return r.reshape(q.shape[:-1] + (3, 3))


def quat_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product a*b, wxyz."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([
        aw * bw - ax * bx - ay * by - az * bz,
        aw * bx + ax * bw + ay * bz - az * by,
        aw * by - ax * bz + ay * bw + az * bx,
        aw * bz + ax * by - ay * bx + az * bw,
    ], axis=-1)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vector v by quaternion q (body->world if q is body orientation)."""
    return jnp.einsum("...ij,...j->...i", quat_to_matrix(q), v)


def quat_integrate(q: jnp.ndarray, omega_world: jnp.ndarray, dt) -> jnp.ndarray:
    """Integrate orientation by world-frame angular velocity over dt (exp map)."""
    angle = jnp.linalg.norm(omega_world, axis=-1, keepdims=True)
    half = 0.5 * angle * dt
    # sinc-safe axis scaling: sin(half)/angle * omega
    k = jnp.where(angle > 1e-9, jnp.sin(half) / jnp.maximum(angle, 1e-12), 0.5 * dt)
    dq = jnp.concatenate([jnp.cos(half), k * omega_world], axis=-1)
    return quat_normalize(quat_mul(dq, q))


def quat_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    axis = axis / jnp.linalg.norm(axis, axis=-1, keepdims=True)
    half = 0.5 * angle
    return jnp.concatenate(
        [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1)


# --- parity with IRRL/script/utils/Rotation.py ------------------------------

def qua2euler(q: jnp.ndarray) -> jnp.ndarray:
    """wxyz quaternion -> (roll, pitch, yaw), ZYX convention."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    roll = jnp.arctan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
    pitch = jnp.arcsin(jnp.clip(2 * (w * y - z * x), -1.0, 1.0))
    yaw = jnp.arctan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
    return jnp.stack([roll, pitch, yaw], axis=-1)


def euler2qua(e: jnp.ndarray) -> jnp.ndarray:
    """(roll, pitch, yaw) -> wxyz quaternion, ZYX convention."""
    r, p, y = e[..., 0] * 0.5, e[..., 1] * 0.5, e[..., 2] * 0.5
    cr, sr, cp, sp, cy, sy = jnp.cos(r), jnp.sin(r), jnp.cos(p), jnp.sin(p), jnp.cos(y), jnp.sin(y)
    return jnp.stack([
        cr * cp * cy + sr * sp * sy,
        sr * cp * cy - cr * sp * sy,
        cr * sp * cy + sr * cp * sy,
        cr * cp * sy - sr * sp * cy,
    ], axis=-1)


qua2matrix = quat_to_matrix  # batched by construction
