"""Structure-exploiting linearization for the whole-body MPC.

The iLQR needs per-knot Jacobians A = dx'/dx, B = dx'/du of the control-step
dynamics. Central finite differences (mpc/ilqr.py fd_eps notes) cost
2*(n+m) = 98 full physics evaluations per knot — ~80k substep evaluations per
8-iteration solve, which caps the whole-body engine ~3 orders of magnitude
below the convex SRB solver. Forward-mode AD costs the same tangent count and
its XLA graph through the lanes physics is compile-infeasible (measured
>125 GB, ilqr.solve_batch docstring).

This module gets the Jacobians for ~one physics evaluation per knot by
exploiting the *structure* of the dynamics

    qdd = M(q)^-1 (tau(q, v, u) + J(q)^T f_c(q, v) - h(q, v))

instead of differentiating through everything:

- **stiff, cheap terms stay exact**: the PD->torque-clamp actuation and the
  compliant contact force (stiffness 3e4 N/m — the dominant entries of A by
  2-3 orders) are differentiated exactly through a cheap surrogate that
  re-evaluates FK, joint-space projection, and the contact law;
- **smooth, expensive operators are frozen** at the linearization point:
  M^-1 (CRBA + factorization) and the Coriolis/gravity bias h_0 are computed
  once per knot with the full physics and treated as constants of the
  surrogate — their state-derivatives are O(v^2)/O(g) smooth terms, far
  below the contact/PD stiffness scale, and iLQR's line search (backed by
  *exact* rollouts) absorbs the residual Jacobian error.

The surrogate's jacfwd graph is a few hundred ops (vs ~20k for the full
substep), so 49 tangents compile and run in noise. This is the
derivative-cost analogue of Raisim's own split (exact contact handling,
frozen mass matrix across a step) and of the classic "simple-model
derivatives, full-model rollouts" MPC trade — but here the *only*
approximation is in the derivative operator, never in the trajectories.

No reference equivalent: the reference has no whole-body trajectory
optimizer at all (its Convert2Torque hook, Environment.hpp:1629, is declared
but never implemented); BASELINE.md's 1024-solves/s north star is what this
chases.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import linalg
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs.blackpanther import torque_clamp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import dynamics as dyn
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import spatial as sp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import contact as ct
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as tr
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys.model import (
    ANC_MASK, JOINT_DAMPING, SHANK_BODY_IDX, TOE_RADIUS,
)


class FrozenOps(NamedTuple):
    """Expensive operators evaluated once per knot, constant under jacfwd."""
    Minv: jnp.ndarray   # (18, 18)
    h0: jnp.ndarray     # (18,) Coriolis + gravity bias (no contact)


def make_frozen_linearizer(cfg: EnvConfig, mpc_cfg, params: mdl.RobotParams,
                           terrain=None):
    """Per-knot (A, B) of the control-step dynamics via the frozen-operator
    surrogate. Returns ``linearize(X (K,n), U (K,m)) -> (A (K,n,n), B (K,n,m))``
    consumable by :func:`ilqr.solve_batch`'s ``linearize_b`` hook.

    Matches mpc/trot.make_dynamics semantics: ``model_substeps`` semi-implicit
    Euler substeps of PD(+clamp) -> forward dynamics per control step, no
    base wrench. ``terrain=None`` keeps the legacy flat-ground model;
    passing a terrain pytree (e.g. the env's own heightmap — the oracle
    elevation-mapped MPC, docs/evidence/wb_terrain_r5.md) makes the
    surrogate's contact projection terrain-aware; the height query is
    bilinear, hence piecewise-linear-differentiable under the jacfwd."""
    sub_dt = cfg.control_dt / mpc_cfg.model_substeps
    action_mean = mdl.stand_gc(cfg.abad)[7:]
    gains = jnp.asarray([cfg.abad_ratio, 1.0, 1.0] * 4)
    kp, kd = cfg.stiffness * gains, cfg.damping * gains
    flat = tr.flat() if terrain is None else terrain
    nb = mdl.NUM_BODIES

    def compute_frozen(x):
        gc, gv = x[:19], x[19:]
        kin = dyn.fk(params, gc)
        # mass matrix is SPD: unrolled-Cholesky inverse stays VPU-wide under
        # the knot vmap (ops/linalg.py notes) vs jnp.linalg.inv's LU loops
        Minv = linalg.inv_spd(dyn.mass_matrix(params, kin))
        h0 = dyn.bias_forces(params, kin, gv, jnp.zeros((nb, 6)))
        return FrozenOps(Minv=Minv, h0=h0)

    def _contact_proj(kin, gv):
        """Generalized contact torque Sum_b S.(f_ext_b), toes only (the base
        box only matters mid-fall; its Jacobian contribution is noise)."""
        v = dyn.body_velocities(kin, gv)
        toe_vel = sp.point_velocity(v[SHANK_BODY_IDX], kin.toe_pos)
        toe_f, _ = ct.point_contact_force(
            kin.toe_pos, toe_vel, TOE_RADIUS, flat,
            params.contact_stiffness, params.contact_damping, params.friction,
            cfg.contact_slip_vel, 0.0)
        f_ext = jnp.zeros((nb, 6)).at[SHANK_BODY_IDX].set(
            sp.force_at_point(toe_f, kin.toe_pos))
        return jnp.einsum("pd,bp,bd->d", kin.S, f_ext, ANC_MASK)

    def substep_sur(gc, gv, u, frozen):
        ptarget = u + action_mean
        tau_j = kp * (ptarget - gc[7:]) - kd * gv[6:]
        tau_j = torque_clamp(cfg, tau_j, gv[6:])
        tau = jnp.concatenate([jnp.zeros(6), tau_j - JOINT_DAMPING * gv[6:]])
        kin = dyn.fk(params, gc)   # cheap, differentiated exactly
        qdd = frozen.Minv @ (tau + _contact_proj(kin, gv) - frozen.h0)
        return dyn.integrate(gc, gv, qdd, sub_dt)

    def step_sur(x, u, frozen):
        gc, gv = x[:19], x[19:]
        for _ in range(mpc_cfg.model_substeps):
            gc, gv = substep_sur(gc, gv, u, frozen)
        return jnp.concatenate([gc, gv])

    def _one(x, u):
        frozen = compute_frozen(x)
        A, B = jax.jacfwd(step_sur, argnums=(0, 1))(x, u, frozen)
        return A, B

    return jax.vmap(_one)
