"""Receding-horizon MPC control in the BlackPanther env (closed loop).

Runs the convex SRB trot-MPC (mpc/srb.py) as an actual controller inside
this framework's physics: at every control step the current generalized
state becomes an SRBProblem, one TV-LQR sweep produces the force plan, and
the first knot's normalized PD-target control is applied — the classic
receding-horizon loop of the Mini-Cheetah convex-MPC stack, entirely inside
one jitted `lax.scan` (solve + env step fused; no host round-trips).

This is the "MPC controller" counterpart of analysis.eval.policy_rollout
(which drives the learned bp5 LSTM); analysis/parity.py compares the two
control sequences.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import srb
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import gait
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import rotation


class MPCRolloutLog(NamedTuple):
    gc: jnp.ndarray        # (T, 19)
    gv: jnp.ndarray        # (T, 18)
    action: jnp.ndarray    # (T, 12) applied normalized PD targets
    reward: jnp.ndarray    # (T,)
    done: jnp.ndarray      # (T,)
    solve_cost: jnp.ndarray  # (T,) SRB tracking cost of each plan
    forces0: jnp.ndarray   # (T, 4, 3) first-knot GRF plan (world frame)
    torque: jnp.ndarray    # (T, 12) applied joint torques


def high_speed_setup(cfg: EnvConfig):
    """The calibrated high-speed closed-loop MPC configuration (round-2
    sweep result): Convert2Torque stance feedforward on top of full PD,
    touchdown-matched gait profile, 1.3x sweep pacing for slip margin, and
    the capped-impulse stiction contact. Measured (CPU, 5 s rollouts):
    3.00 m/s steady at cmd 3 with zero falls (vs 1.3 m/s for the round-1
    PD-position interface); cmd 4+ falls — the documented limit of the
    gait-scheduled SRB formulation in this physics.

    Returns (env_cfg, SRBConfig, mpc_rollout kwargs)."""
    env_cfg = cfg.replace(crucial=False, terrain=False,
                          contact_impulse_mass=2.0)
    scfg = srb.SRBConfig(horizon=16, fz_max=250.0, touchdown_match=True,
                         sweep_gain=1.3)
    kwargs = dict(torque_control=True, stance_pd=1.0, swing_pd=1.0)
    return env_cfg, scfg, kwargs


def speed_schedule(cfg: EnvConfig, vx: float):
    """Speed-scheduled SRB-MPC configuration (the production pattern: stride
    frequency and duty factor follow the commanded speed — every fast
    quadruped stack does this because one gait clock cannot cover 1-5 m/s).

    Encodes the round-2 measured schedule (scripts/mpc45.py + mpc45b.py;
    the runs/ logs were wiped by a machine reset — results preserved in
    commit 406f253): defaults to high_speed_setup below 3.5 m/s (2.93 m/s
    zero-fall at cmd 3); T=0.12 s / lam=0.42 at cmd 4 (2.94); T=0.12 /
    lam=0.35 — a flight-phase trot — at cmd 5 (3.19). Zero falls at every
    command.

    Returns (env_cfg, SRBConfig, mpc_rollout kwargs)."""
    env_cfg, scfg, kwargs = high_speed_setup(cfg)
    if vx >= 4.5:
        env_cfg = env_cfg.replace(period=0.12, lam=0.35, stand_height=0.30)
    elif vx >= 3.5:
        env_cfg = env_cfg.replace(period=0.12, lam=0.42, stand_height=0.30)
    return env_cfg, scfg, kwargs


def wb_speed_schedule(cfg: EnvConfig, vx: float):
    """Speed-scheduled whole-body receding-horizon iLQR configuration.

    Round-5 verified schedule (scripts/wb_table_r5.py + the lam fine
    sweep scripts/wb_push5_r5.py + scripts/wb_confirm4_r5.py,
    docs/evidence/wb_table_r5.md, all rows 2500-step protocol on chunked
    rollouts): T=0.20/lam=0.5/h16 below 2.5 m/s, T=0.14/lam=0.5/h16 in the
    cmd-3 transition regime, and the fine-sweep winner T=0.12/lam=0.44/h24
    from 3.5 m/s up. Measured closed loop: **0.93 / 1.86 / 2.88 / 3.95 /
    5.03 m/s at cmd 1-5, zero falls** — cmd 5 AT the commanded 5 m/s
    (100.6%; the round-3 schedule read 4.66 there).

    Returns (env_cfg, MPCConfig) for :func:`wb_mpc_rollout` /
    :func:`wb_mpc_rollout_chunked` (use the chunked harness for rollouts
    beyond ~1200 steps: the h24 configs hit the documented h>=20 x 2500
    TPU trip-count fault monolithically, wb_table_r5.md)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import trot

    env_cfg = cfg.replace(crucial=False, terrain=False)
    if vx >= 3.5:
        env_cfg = env_cfg.replace(period=0.12, lam=0.44)
        horizon = 24
    else:
        env_cfg = env_cfg.replace(period=0.14 if vx >= 2.5 else 0.20)
        horizon = 16
    mpc_cfg = trot.MPCConfig(horizon=horizon, n_iter=2, model_substeps=2,
                             linearize_chunk=4, n_alphas=4, relin_every=1,
                             linearizer="frozen")
    return env_cfg, mpc_cfg


@functools.partial(jax.jit,
                   static_argnames=("cfg", "scfg", "n_steps",
                                    "torque_control", "stance_pd", "swing_pd"))
def mpc_rollout(cfg: EnvConfig, scfg: srb.SRBConfig, command: jnp.ndarray,
                key: jax.Array, n_steps: int = 500,
                torque_control: bool = False,
                stance_pd: float = 0.0,
                swing_pd: float = 1.0) -> MPCRolloutLog:
    """Closed-loop receding-horizon SRB-MPC rollout at a fixed command.

    ``torque_control=True`` drives stance legs with GRF-mapped joint torques
    directly (srb.grf_to_torque, the Convert2Torque path) while swing legs
    PD-track the gait reference — the interface the Mini-Cheetah convex-MPC
    stack actually deploys, and the fix for the PD-position interface's
    limited stance force authority."""
    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    state = bp.env_init(cfg, key)
    state = state._replace(command=command, command_filtered=command)
    stand = mdl.stand_gc(cfg.abad)[7:]

    def scan_fn(state, _):
        prob = srb.make_problem(cfg, state.gc, state.gv, command,
                                state.current_time)
        res = srb.solve(cfg, scfg, prob)
        st = state._replace(command=command, command_filtered=command)
        if torque_control:
            sm0 = srb.stance_mask(cfg, state.current_time)
            tau_ff, pd_scale = srb.grf_to_torque(
                cfg, state.gc, res.forces[0], sm0, stance_pd, swing_pd)
            xy_shift = scfg.raibert_gain * (prob.v_meas - command[:2])
            # swing tracking must follow the same schedule the solver
            # planned stance forces for (srb.sweep_command)
            sched_cmd = srb.sweep_command(cfg, scfg, prob)
            q_ref = gait.gait_reference(cfg, sched_cmd, state.current_time,
                                        xy_shift,
                                        scfg.touchdown_match).joint_ref
            action = jnp.clip(q_ref - stand, -1.0, 1.0)
            out = bp.step(cfg, st, action, tau_ff=tau_ff, pd_scale=pd_scale)
        else:
            action = jnp.clip(res.us[0], -1.0, 1.0)
            out = bp.step(cfg, st, action)
        log = MPCRolloutLog(gc=out.state.gc, gv=out.state.gv, action=action,
                            reward=out.reward, done=out.done,
                            solve_cost=res.cost, forces0=res.forces[0],
                            torque=out.state.torque_applied)
        return out.state, log

    _, logs = jax.lax.scan(scan_fn, state, None, length=n_steps)
    return logs


class WBMPCRolloutLog(NamedTuple):
    gc: jnp.ndarray          # (T, 19)
    gv: jnp.ndarray          # (T, 18)
    action: jnp.ndarray      # (T, 12) applied normalized PD targets
    reward: jnp.ndarray      # (T,)
    done: jnp.ndarray        # (T,)
    solve_cost: jnp.ndarray  # (T,) iLQR cost of each (warm-started) plan


def _make_wb_scan(cfg: EnvConfig, mpc_cfg, command: jnp.ndarray,
                  raibert_gain: float, terrain=None):
    """The shared one-control-step body of the whole-body RH loop: build
    the TrotProblem at the current state, warm-start the iLQR solve from
    the one-knot-shifted previous plan, step the env with the first knot's
    control. Both the monolithic rollout and the chunked crash-safe
    harness scan exactly this function, so chunking cannot change physics."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import (
        cost as mcost,
        ilqr,
        trot,
    )

    params = mdl.nominal_params(cfg)
    dynamics = trot.make_dynamics(cfg, mpc_cfg, params, terrain)
    linearize_fn = trot.make_linearize_fn(cfg, mpc_cfg, params, terrain)
    w = mpc_cfg.weights
    T = mpc_cfg.horizon

    def scan_fn(carry, _):
        state, us_prev = carry
        if raibert_gain != 0.0:
            R = rotation.quat_to_matrix(state.gc[3:7])
            v_body = R.T @ state.gv[:3]
            xy_shift = raibert_gain * (v_body[:2] - command[:2])
        else:
            xy_shift = None
        prob = trot.make_problem(cfg, state.gc, state.gv, command,
                                 state.current_time, T, xy_shift)

        def cost_fn(x, u, t):
            return mcost.stage_cost(cfg, w, x, u, prob.joint_refs[t],
                                    prob.joint_dot_refs[t], command)

        def term_fn(x):
            return mcost.terminal_cost(cfg, w, x, prob.joint_ref_T, command)

        # shift last plan one knot forward; repeat the tail control
        u_init = jnp.concatenate([us_prev[1:], us_prev[-1:]], axis=0)
        res = ilqr.solve(dynamics, cost_fn, term_fn, prob.x0, u_init,
                         n_iter=mpc_cfg.n_iter,
                         linearize_chunk=mpc_cfg.linearize_chunk,
                         n_alphas=mpc_cfg.n_alphas,
                         relin_every=mpc_cfg.relin_every,
                         linearize_fn=linearize_fn)
        action = jnp.clip(res.us[0], -1.0, 1.0)
        st = state._replace(command=command, command_filtered=command)
        out = bp.step(cfg, st, action)
        log = WBMPCRolloutLog(gc=out.state.gc, gv=out.state.gv, action=action,
                              reward=out.reward, done=out.done,
                              solve_cost=res.cost)
        return (out.state, res.us), log

    return scan_fn


def _wb_init_carry(cfg: EnvConfig, mpc_cfg, command: jnp.ndarray,
                   key: jax.Array):
    state = bp.env_init(cfg, key)
    state = state._replace(command=command, command_filtered=command)
    return state, jnp.zeros((mpc_cfg.horizon, 12))


def wb_mpc_rollout(cfg: EnvConfig, mpc_cfg, command: jnp.ndarray,
                   key: jax.Array, n_steps: int = 500,
                   raibert_gain: float = 0.0,
                   terrain_model: bool = False) -> WBMPCRolloutLog:
    """Closed-loop receding-horizon *whole-body iLQR* control.

    The full-dynamics counterpart of :func:`mpc_rollout`: at every control
    step the current [gc; gv] seeds a TrotProblem, the previous plan (shifted
    by one knot) warm-starts a short iLQR solve through the contact dynamics
    (mpc/trot.make_dynamics), and the first knot's control drives the env.
    Receding-horizon warm starting is what makes this affordable: each
    problem differs from the last by one control step, so 1-2 iLQR
    iterations (mpc_cfg.n_iter) track the optimum — the classic MPC-iLQR
    deployment pattern (vs. the cold-start batch solves of trot.solve).

    raibert_gain > 0 shifts the gait reference's touchdown footholds by
    gain * (v_meas - v_cmd) in the body xy plane (continuous
    Bezier-endpoint Raibert correction, trot.make_problem). The default
    0.0 is the MEASURED production setting, not a placeholder: every
    rg > 0 form probed — unmasked, binary swing mask, and the continuous
    endpoint form — degraded cmd-5 tracking (4.90 -> <=1.20 m/s with
    falls; docs/evidence/wb_table_r5.md). The whole-body solver already
    optimizes footholds through the contact dynamics, so shifting its
    cost target fights the optimizer; the knob works only on the SRB
    side, where swing tracking is plain PD (srb.SRBConfig.raibert_gain).

    The internal model uses the *nominal* parameters and flat ground — model
    mismatch with the stepped env (DR off here) is the realism this tests.
    """
    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    # init runs EAGERLY, exactly as in wb_mpc_rollout_chunked, and the
    # whole rollout is one `_wb_mpc_chunk` call: monolithic and chunked
    # share every instruction, so segment boundaries are the ONLY
    # difference between them. (When init was traced inside a wholesale
    # jit, XLA fused the terrain sampling differently than the eager
    # chunked init and the two paths diverged in float — caught by
    # tests/test_mpc.py::test_wb_mpc_terrain_oracle_model.)
    carry = _wb_init_carry(cfg, mpc_cfg, command, key)
    _, logs = _wb_mpc_chunk(cfg, mpc_cfg, command, carry, n_steps,
                            raibert_gain, terrain_model)
    return logs


@functools.partial(jax.jit, static_argnames=("cfg", "mpc_cfg", "n_steps",
                                             "raibert_gain", "terrain_model"))
def _wb_mpc_chunk(cfg: EnvConfig, mpc_cfg, command: jnp.ndarray, carry,
                  n_steps: int, raibert_gain: float = 0.0,
                  terrain_model: bool = False):
    terrain = carry[0].terrain if terrain_model else None
    scan_fn = _make_wb_scan(cfg, mpc_cfg, command, raibert_gain, terrain)
    return jax.lax.scan(scan_fn, carry, None, length=n_steps)


def wb_mpc_rollout_chunked(cfg: EnvConfig, mpc_cfg, command: jnp.ndarray,
                           key: jax.Array, n_steps: int = 2500,
                           chunk: int = 500,
                           raibert_gain: float = 0.0,
                           terrain_model: bool = False) -> WBMPCRolloutLog:
    """Crash-safe long whole-body RH rollout: k host-synced scan segments.

    Round-4 finding (docs/evidence/wb_push_r4.md): the MONOLITHIC
    2500-step scan at horizon >= 20 reproducibly crashed the TPU worker
    ("kernel fault", 3/3 occurrences), while every <=1200-step segment of
    the same program ran clean. This harness runs ceil(n_steps/chunk)
    jitted segments of the *identical* scan body (`_make_wb_scan`), fully
    materializing each segment's carry and logs on the host between
    segments — the physics is bit-identical to the monolithic scan because
    the (env state, warm-start plan) carry completely determines the
    continuation and the env PRNG key lives inside the state. Device log
    memory is bounded by one chunk; any shape becomes measurable.

    The last chunk is shortened to land exactly on n_steps. Logs are
    concatenated host-side (numpy), so fields come back as np.ndarray.
    """
    import numpy as np

    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    carry = _wb_init_carry(cfg, mpc_cfg, command, key)
    pieces = []
    done = 0
    while done < n_steps:
        n = min(chunk, n_steps - done)
        carry, logs = _wb_mpc_chunk(cfg, mpc_cfg, command, carry, n,
                                    raibert_gain, terrain_model)
        jax.block_until_ready(carry)
        pieces.append(jax.tree.map(np.asarray, logs))  # host sync + offload
        done += n
    return WBMPCRolloutLog(*(np.concatenate([getattr(p, f) for p in pieces])
                             for f in WBMPCRolloutLog._fields))


@functools.partial(jax.jit, static_argnames=("cfg", "mpc_cfg", "n_steps",
                                             "raibert_gain"))
def wb_mpc_rollout_batch(cfg: EnvConfig, mpc_cfg, commands: jnp.ndarray,
                         keys: jax.Array, n_steps: int = 500,
                         raibert_gain: float = 0.0) -> WBMPCRolloutLog:
    """A *fleet* of whole-body receding-horizon controllers in one program.

    vmaps the per-step (warm-started iLQR solve + env step) of
    :func:`wb_mpc_rollout` over a batch of commands/keys — the production
    serving shape: one chip running B robots' MPC loops in lock-step. This
    is also the honest throughput configuration for the whole-body engine:
    cold-start batch solves (trot.batched_solve) pay 8 iterations from a
    joint-reference guess, while the receding-horizon loop pays
    ``mpc_cfg.n_iter`` (1-2) warm-started iterations per control step —
    measured sustained rates in scripts/bench_wb_rh.py.

    commands: (B, 3); keys: (B,) PRNG keys. Returns WBMPCRolloutLog with a
    leading batch axis: every field (B, n_steps, ...).
    """
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.mpc import (
        cost as mcost,
        ilqr,
        trot,
    )

    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    params = mdl.nominal_params(cfg)
    dynamics = trot.make_dynamics(cfg, mpc_cfg, params)
    linearize_fn = trot.make_linearize_fn(cfg, mpc_cfg, params)
    w = mpc_cfg.weights
    T = mpc_cfg.horizon
    B = commands.shape[0]

    states = jax.vmap(lambda k: bp.env_init(cfg, k))(keys)
    states = states._replace(command=commands, command_filtered=commands)
    u0 = jnp.zeros((B, T, 12))

    def one_step(state, us_prev, command):
        if raibert_gain != 0.0:
            R = rotation.quat_to_matrix(state.gc[3:7])
            v_body = R.T @ state.gv[:3]
            xy_shift = raibert_gain * (v_body[:2] - command[:2])
        else:
            xy_shift = None
        prob = trot.make_problem(cfg, state.gc, state.gv, command,
                                 state.current_time, T, xy_shift)

        def cost_fn(x, u, t):
            return mcost.stage_cost(cfg, w, x, u, prob.joint_refs[t],
                                    prob.joint_dot_refs[t], command)

        def term_fn(x):
            return mcost.terminal_cost(cfg, w, x, prob.joint_ref_T, command)

        u_init = jnp.concatenate([us_prev[1:], us_prev[-1:]], axis=0)
        res = ilqr.solve(dynamics, cost_fn, term_fn, prob.x0, u_init,
                         n_iter=mpc_cfg.n_iter,
                         linearize_chunk=mpc_cfg.linearize_chunk,
                         n_alphas=mpc_cfg.n_alphas,
                         relin_every=mpc_cfg.relin_every,
                         linearize_fn=linearize_fn)
        action = jnp.clip(res.us[0], -1.0, 1.0)
        st = state._replace(command=command, command_filtered=command)
        out = bp.step(cfg, st, action)
        log = WBMPCRolloutLog(gc=out.state.gc, gv=out.state.gv, action=action,
                              reward=out.reward, done=out.done,
                              solve_cost=res.cost)
        return out.state, res.us, log

    step_b = jax.vmap(one_step)

    def scan_fn(carry, _):
        states, us_prev = carry
        states, us, log = step_b(states, us_prev, commands)
        return (states, us), log

    (_, _), logs = jax.lax.scan(scan_fn, (states, u0), None, length=n_steps)
    return jax.tree.map(lambda a: jnp.swapaxes(a, 0, 1), logs)
