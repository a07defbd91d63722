"""6D spatial-vector algebra in world-origin coordinates.

All motion vectors are [omega(3); v_O(3)] and force vectors [n_O(3); f(3)],
both referenced at the world origin. This single-frame convention removes all
per-body coordinate transforms from CRBA/RNEA, turning the articulated-body
algorithms into fixed einsums over a (13, ...) body axis — the XLA-friendly
replacement for the pointer-chasing recursion inside Raisim
(the reference's physics engine behind ``world_->integrate()``,
Environment.hpp:768).
"""

from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> skew-symmetric matrix, batch-friendly."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        zero, -z, y,
        z, zero, -x,
        -y, x, zero,
    ], axis=-1).reshape(v.shape[:-1] + (3, 3))


def spatial_inertia(mass: jnp.ndarray, com_w: jnp.ndarray, inertia_w: jnp.ndarray) -> jnp.ndarray:
    """6x6 spatial inertia at the world origin.

    mass: (...,), com_w: (..., 3) world com, inertia_w: (..., 3, 3) rotational
    inertia about the com in world axes. Momentum [L_O; p] = I_spatial [omega; v_O].
    """
    cx = skew(com_w)
    m = mass[..., None, None]
    top_left = inertia_w + m * (cx @ jnp.swapaxes(cx, -1, -2))
    top_right = m * cx
    bot_left = m * jnp.swapaxes(cx, -1, -2)
    eye = jnp.broadcast_to(jnp.eye(3), cx.shape)
    bot_right = m * eye
    top = jnp.concatenate([top_left, top_right], axis=-1)
    bot = jnp.concatenate([bot_left, bot_right], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def cross_motion(m1: jnp.ndarray, m2: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product of motion vectors: m1 x m2."""
    w1, v1 = m1[..., :3], m1[..., 3:]
    w2, v2 = m2[..., :3], m2[..., 3:]
    return jnp.concatenate([
        jnp.cross(w1, w2),
        jnp.cross(w1, v2) + jnp.cross(v1, w2),
    ], axis=-1)


def cross_force(m: jnp.ndarray, f: jnp.ndarray) -> jnp.ndarray:
    """Spatial cross product motion x* force (momentum-derivative bias)."""
    w, v = m[..., :3], m[..., 3:]
    n, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate([
        jnp.cross(w, n) + jnp.cross(v, fl),
        jnp.cross(w, fl),
    ], axis=-1)


def force_at_point(f: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Linear force f applied at world point p -> spatial force at origin."""
    return jnp.concatenate([jnp.cross(p, f), f], axis=-1)


def point_velocity(v_spatial: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Velocity of the body-fixed point at world position p."""
    w, v0 = v_spatial[..., :3], v_spatial[..., 3:]
    return v0 + jnp.cross(w, p)
