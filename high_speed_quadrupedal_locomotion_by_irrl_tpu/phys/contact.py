"""Compliant (penalty) contact for the BlackPanther collision set.

The reference relies on Raisim's hard-contact LCP solver; a hard solver is a
poor fit for XLA (data-dependent active sets, tiny sequential pivots), so this
framework uses a regularized spring-damper contact with smooth Coulomb
friction — the standard TPU/GPU-simulator choice (cf. Brax/MJX). Stiffness and
damping default to the values the URDF itself declares for the toes
(black_panther.urdf:131-137: stiffness 30000, damping 1000).

Collision set (matching the reference's geoms): 4 toe spheres r=0.0275
(urdf:148) + the base's 0.3x0.2x0.1 box sampled at its 8 corners (urdf:26).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as _terrain
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys.model import BODY_BOX_HALF, TOE_RADIUS

_CORNERS = np.array([[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
                    dtype=np.float64) * BODY_BOX_HALF


def point_contact_force(pos, vel, radius, tp, stiffness, damping, friction,
                        slip_vel, impulse_scale: float = 0.0):
    """Contact force at sphere-like points against the terrain.

    pos, vel: (..., 3) world position/velocity of the point centers.
    Returns (force_world (..., 3), normal_force_magnitude (...,)).

    Friction models:
    - tanh (impulse_scale == 0): regularized Coulomb, saturates at mu*fn,
      ~linear in |vt| below slip_vel. Explicitly stable only while the
      tangential stiffness mu*fn/slip_vel stays below ~2*m_eff/dt, which
      caps how "sticky" stance can be at 4 kHz substeps.
    - capped impulse (impulse_scale = m_eff/dt > 0): the force that would
      bring the tangential velocity to zero within one substep, capped at
      the Coulomb limit — true stiction without a stiffness blow-up (the
      standard velocity-stepping trick; Raisim's hard solver achieves the
      same stick exactly, Environment.hpp banner :4).
    """
    ground = _terrain.height(tp, pos[..., 0], pos[..., 1])
    n = _terrain.normal(tp, pos[..., 0], pos[..., 1])
    # penetration along the normal (flat-ground exact; terrain approximated
    # by the vertical gap projected on the normal)
    gap = (pos[..., 2] - ground) * n[..., 2] - radius
    pen = jnp.maximum(-gap, 0.0)
    active = pen > 0.0
    vn = jnp.sum(vel * n, axis=-1)
    fn = jnp.maximum(stiffness * pen - damping * vn, 0.0) * active
    vt = vel - vn[..., None] * n
    vt_norm = jnp.sqrt(jnp.sum(vt * vt, axis=-1) + slip_vel * slip_vel * 1e-4)
    if impulse_scale > 0.0:
        ft_mag = jnp.minimum(friction * fn, impulse_scale * vt_norm)
    else:
        ft_mag = friction * fn * jnp.tanh(vt_norm / slip_vel)
    f = fn[..., None] * n - ft_mag[..., None] * vt / vt_norm[..., None]
    return f, fn


def box_corner_points(base_R, base_p):
    """World positions of the 8 base-box corners. base_R (3,3), base_p (3,)."""
    return base_p + jnp.einsum("ij,cj->ci", base_R, jnp.asarray(_CORNERS))
