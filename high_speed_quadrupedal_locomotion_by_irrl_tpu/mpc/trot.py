"""Batched trot-MPC: iLQR over the BlackPanther dynamics tracking the Bezier
gait reference — the BASELINE.json headline workload (1024+ solves/s/chip).

The MPC's internal model is the same PD->torque-clamp->contact physics as the
training env, with a configurable number of integration substeps per control
knot (`model_substeps`): the full-fidelity env uses 8 x 0.25 ms
(Environment.hpp:711); the MPC model defaults to 2 x 1 ms, the classic
model-predictive fidelity/speed trade — derivatives flow through contact.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs.blackpanther import torque_clamp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import cost as mcost
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import ilqr
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import dynamics as dyn
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import terrain as tr
from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import gait


@dataclasses.dataclass(frozen=True)
class MPCConfig:
    horizon: int = 50
    n_iter: int = 8
    model_substeps: int = 2
    # knots linearized per scan block: 1 is the HBM floor; large batched
    # solves (1024 problems) OOM if the whole horizon is vmapped at once
    linearize_chunk: int = 1
    n_alphas: int = 8       # parallel line-search widths
    relin_every: int = 1    # jacobian reuse interval (ilqr.solve notes)
    fd_eps: float = 1e-3    # central-FD step for the lanes-batched solver
                            # (ilqr.solve_batch notes). Round-3 re-measure
                            # after the terminal-knot fix: 3e-4 Jacobian
                            # noise stalls the descent on a 9.47-cost
                            # plateau at low commands (true optimum 8.0,
                            # reached by both AD and the frozen surrogate),
                            # while 1e-3 descends cleanly to 8.1 and even
                            # edges AD at cmd 1.5 (73.67 vs 74.03) — the
                            # contact-smearing cost of the larger step is
                            # smaller than its noise-rejection win.
                            # 0 = AD (compile-infeasible through lanes)
    linearizer: str = "fd"  # "fd" (central differences through the lanes
                            # dynamics) or "frozen" (structure-exploiting
                            # frozen-operator surrogate, mpc/linearize.py:
                            # ~one physics eval per knot instead of 98)
    weights: mcost.CostWeights = dataclasses.field(default_factory=mcost.imitation_weights)


class TrotProblem(NamedTuple):
    x0: jnp.ndarray          # (37,) [gc; gv]
    command: jnp.ndarray     # (3,)
    t0: jnp.ndarray          # () gait clock at the first knot
    joint_refs: jnp.ndarray  # (T, 12)
    joint_dot_refs: jnp.ndarray  # (T, 12)
    joint_ref_T: jnp.ndarray  # (12,) reference at the terminal knot T


def make_problem(cfg: EnvConfig, gc: jnp.ndarray, gv: jnp.ndarray,
                 command: jnp.ndarray, t0: jnp.ndarray, horizon: int,
                 xy_shift: jnp.ndarray | None = None) -> TrotProblem:
    """xy_shift: optional (2,) Raibert foothold correction
    (srb.SRBConfig.raibert_gain's whole-body counterpart), applied as a
    Bezier-ENDPOINT shift via the continuous per-leg weight
    gait.raibert_weight: the swing arc converges to the shifted touchdown
    foothold and the stance sweep decays back from it, so the reference —
    the tracking COST target of the whole-body solver at every knot — has
    no jumps and bounded finite-difference velocity refs. Both earlier
    forms measured HARMFUL at cmd 5 (docs/evidence/wb_push_r4.md): the
    unmasked shift (cost ~1000-1900, 4-6 falls — a planted stance foot
    cannot follow a shifted IK target) and the round-4 binary swing mask
    (cost 7.1e3/2.4e4, 4-6 falls — full-shift reference jumps at every
    mask flip). None keeps the reference unshifted (bit-exact legacy
    graphs). See docs/evidence/wb_table_r5.md for the endpoint-form
    measurements."""
    ts = t0 + jnp.arange(horizon + 1) * cfg.control_dt
    if xy_shift is None:
        ref_at = lambda t: gait.gait_reference(cfg, command, t, None).joint_ref
    else:
        def ref_at(t):
            w = gait.raibert_weight(cfg, t)                  # (4,)
            return gait.gait_reference(
                cfg, command, t, xy_shift[None, :] * w[:, None]).joint_ref
    refs = jax.vmap(ref_at)(ts)
    jd = (refs[1:] - refs[:-1]) / cfg.control_dt
    return TrotProblem(x0=jnp.concatenate([gc, gv]), command=command, t0=t0,
                       joint_refs=refs[:-1], joint_dot_refs=jd,
                       joint_ref_T=refs[-1])


def make_dynamics(cfg: EnvConfig, mpc_cfg: MPCConfig, params: mdl.RobotParams,
                  terrain=None):
    """Deterministic control-step dynamics x,u,t -> x' for the MPC model.

    ``terrain=None`` keeps the legacy flat-ground internal model; passing a
    terrain pytree (the env's own heightmap = the oracle elevation-mapped
    MPC) makes the model's contact terrain-aware — the measured fix path
    for the flat-model failure on z=0.1 terrain (wb_terrain_r5.md)."""
    sub_dt = cfg.control_dt / mpc_cfg.model_substeps
    action_mean = mdl.stand_gc(cfg.abad)[7:]
    gains = jnp.asarray([cfg.abad_ratio, 1.0, 1.0] * 4)
    kp, kd = cfg.stiffness * gains, cfg.damping * gains
    flat = tr.flat() if terrain is None else terrain

    def step(x, u, t):
        del t
        ptarget = u + action_mean
        def sub(carry, _):
            gc, gv = carry
            tau = kp * (ptarget - gc[7:]) - kd * gv[6:]
            tau = torque_clamp(cfg, tau, gv[6:])
            # "native" solver: compact HLO — the MPC differentiates through
            # this step, so graph size (compile time) dominates here
            qdd, _ = dyn.forward_dynamics(params, gc, gv, tau, jnp.zeros(6),
                                          flat, cfg.contact_slip_vel,
                                          solver="native")
            return dyn.integrate(gc, gv, qdd, sub_dt), None
        (gc, gv), _ = jax.lax.scan(sub, (x[:19], x[19:]), None,
                                   length=mpc_cfg.model_substeps)
        return jnp.concatenate([gc, gv])

    return step


def make_linearize_fn(cfg: EnvConfig, mpc_cfg: MPCConfig,
                      params: mdl.RobotParams, terrain=None):
    """The MPCConfig-selected Jacobian provider (None = jacfwd/FD default)."""
    if mpc_cfg.linearizer != "frozen":
        return None
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import linearize
    return linearize.make_frozen_linearizer(cfg, mpc_cfg, params, terrain)


def solve(cfg: EnvConfig, mpc_cfg: MPCConfig, params: mdl.RobotParams,
          prob: TrotProblem) -> ilqr.ILQRResult:
    dynamics = make_dynamics(cfg, mpc_cfg, params)
    w = mpc_cfg.weights

    def cost_fn(x, u, t):
        jref = prob.joint_refs[t]
        jdref = prob.joint_dot_refs[t]
        return mcost.stage_cost(cfg, w, x, u, jref, jdref, prob.command)

    def term_fn(x):
        return mcost.terminal_cost(cfg, w, x, prob.joint_ref_T, prob.command)

    # warm start: track the joint reference directly (u = q_ref - stand pose)
    u_init = prob.joint_refs - mdl.stand_gc(cfg.abad)[7:]
    return ilqr.solve(dynamics, cost_fn, term_fn, prob.x0, u_init,
                      n_iter=mpc_cfg.n_iter,
                      linearize_chunk=mpc_cfg.linearize_chunk,
                      n_alphas=mpc_cfg.n_alphas,
                      relin_every=mpc_cfg.relin_every,
                      linearize_fn=make_linearize_fn(cfg, mpc_cfg, params))


def batched_solve(cfg: EnvConfig, mpc_cfg: MPCConfig, params_batch: mdl.RobotParams,
                  probs: TrotProblem) -> ilqr.ILQRResult:
    """vmap over scenarios; params_batch may be per-scenario (domain-randomized)."""
    return jax.vmap(functools.partial(solve, cfg, mpc_cfg))(params_batch, probs)


def make_dynamics_batch(cfg: EnvConfig, mpc_cfg: MPCConfig,
                        params: mdl.RobotParams):
    """Batched control-step dynamics (K, 37), (K, 12) -> (K, 37) on the
    batch-in-lanes physics (ops/phys_lanes.substep) — every "scalar" of the
    substep is a (K,)-wide lane vector, so K = problems x jacobian-tangents
    (or problems x line-search alphas) rides the TPU at full width instead
    of one tiny dense env per vmap instance. ``params`` is the *nominal*
    (unbatched) model: params_to_lanes then yields scalar leaves that
    broadcast over the lane axis for free."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.ops import phys_lanes as lanes

    P = lanes.params_to_lanes(params)
    sub_dt = cfg.control_dt / mpc_cfg.model_substeps
    action_mean = mdl.stand_gc(cfg.abad)[7:]
    gains = jnp.asarray([cfg.abad_ratio, 1.0, 1.0] * 4)
    kp, kd = cfg.stiffness * gains, cfg.damping * gains

    def step(xs, us):
        gcT, gvT = xs[:, :19].T, xs[:, 19:].T            # (19,K), (18,K)
        ptT = (us + action_mean).T                       # (12,K)
        bwT = jnp.zeros((6,) + gcT.shape[1:], gcT.dtype)

        def sub(carry, _):
            gcT, gvT = carry
            tau = kp[:, None] * (ptT - gcT[7:]) - kd[:, None] * gvT[6:]
            tau = torque_clamp(cfg, tau.T, gvT[6:].T).T
            g2, v2, *_ = lanes.substep(P, gcT, gvT, tau, bwT,
                                       cfg.contact_slip_vel, 0.0, sub_dt)
            return (g2, v2), None

        (gcT, gvT), _ = jax.lax.scan(sub, (gcT, gvT), None,
                                     length=mpc_cfg.model_substeps)
        return jnp.concatenate([gcT.T, gvT.T], axis=1)

    return step


def solve_batch_lanes(cfg: EnvConfig, mpc_cfg: MPCConfig,
                      params: mdl.RobotParams,
                      probs: TrotProblem) -> ilqr.ILQRResult:
    """Whole-body iLQR over a problem batch on the lanes physics.

    Same optimization as :func:`batched_solve` (tested for cost parity) but
    the physics lane width is problems x 49 tangents during linearization
    and problems x n_alphas during the line search, instead of per-problem
    vmap instances of tiny dense ops."""
    dynamics_b = make_dynamics_batch(cfg, mpc_cfg, params)
    w = mpc_cfg.weights

    def cost_fn(x, u, arg):
        jref, jdref, command = arg
        return mcost.stage_cost(cfg, w, x, u, jref, jdref, command)

    def term_fn(x, arg):
        jref_last, command = arg
        return mcost.terminal_cost(cfg, w, x, jref_last, command)

    B, T = probs.joint_refs.shape[:2]
    cmd_bt = jnp.broadcast_to(probs.command[:, None], (B, T, 3))
    stage_args = (probs.joint_refs, probs.joint_dot_refs, cmd_bt)
    term_args = (probs.joint_ref_T, probs.command)
    u_inits = probs.joint_refs - mdl.stand_gc(cfg.abad)[7:]
    linearize_b = None
    if mpc_cfg.linearizer == "frozen":
        from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import linearize
        linearize_b = linearize.make_frozen_linearizer(cfg, mpc_cfg, params)
    return ilqr.solve_batch(dynamics_b, cost_fn, term_fn, probs.x0, u_inits,
                            stage_args, term_args, n_iter=mpc_cfg.n_iter,
                            lin_chunk=mpc_cfg.linearize_chunk,
                            n_alphas=mpc_cfg.n_alphas,
                            relin_every=mpc_cfg.relin_every,
                            fd_eps=mpc_cfg.fd_eps,
                            linearize_b=linearize_b)


def standing_x0(cfg: EnvConfig) -> jnp.ndarray:
    """Stand pose with the toes just touching the ground (URDF chain puts the
    toe centers 0.277 m under the base; contact at center height = toe radius)."""
    gc = mdl.stand_gc(cfg.abad).at[2].set(0.304)
    return jnp.concatenate([gc, jnp.zeros(18)])
