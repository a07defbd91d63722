"""Robustness quantification: disturbance-recovery rate fits.

The reference's Figure-4 analysis (Data_Visualization_Code/Figure4.py:330-392)
quantifies controller robustness as an exponential *recovery rate* kappa
(log_e/s, plotted in [-10, 2]): after a disturbance the velocity deviation
decays as |v(t) - v_ss| ~ A exp(kappa t); kappa < 0 recovers, more negative =
faster. The reference fits it over recorded hardware/sim experiments; here
the whole experiment is generated on device — a vmapped batch of rollouts
with state kicks injected mid-flight (the state_disturbance capability,
Environment.hpp:912-940) — and fitted host-side.

Also provides the velocity-vs-latency curve with a kappa fit per latency
(the DelayTool sweep of run_bp_v5.py:360-365 crossed with recovery fits).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.rotation import quat_to_matrix


class KickLog(NamedTuple):
    v_body: jnp.ndarray   # (T, 3) body-frame velocity
    z: jnp.ndarray        # (T,)
    done: jnp.ndarray     # (T,)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "kick_step"))
def kick_rollout(cfg: EnvConfig, params: lstm.PolicyParams,
                 command: jnp.ndarray, kick_dv: jnp.ndarray,
                 key: jax.Array, n_steps: int = 1500,
                 kick_step: int = 750) -> KickLog:
    """Closed-loop rollout with a base-velocity kick at ``kick_step``.

    kick_dv: (6,) generalized-velocity impulse [dvx dvy dvz dwx dwy dwz]
    added to the base DoFs in one control step (a harder version of the
    manual-mode state_disturbance kicks)."""
    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    state = bp.env_init(cfg, key)
    state = state._replace(command=command, command_filtered=command)
    obs0 = bp.observe(cfg, state)
    s_size = lstm.state_size([w.wh.shape[0] for w in params.pi_lstm])
    cmd_n = (command - bp.obs_mean(cfg)[:3]) / bp.obs_std(cfg)[:3]

    def scan_fn(carry, idx):
        state, lstm_state, obs = carry
        kicked_gv = state.gv.at[:6].add(kick_dv)
        state = state._replace(
            gv=jnp.where(idx == kick_step, kicked_gv, state.gv))
        o = obs.at[:3].set(cmd_n)
        action, lstm_state = lstm.deterministic_action(
            params, o[None], lstm_state[None], jnp.zeros((1,)))
        out = bp.step(cfg, state._replace(command=command,
                                          command_filtered=command), action[0])
        R = quat_to_matrix(out.state.gc[3:7])
        log = KickLog(v_body=R.T @ out.state.gv[:3], z=out.state.gc[2],
                      done=out.done)
        return (out.state, lstm_state[0], out.obs), log

    _, logs = jax.lax.scan(scan_fn, (state, jnp.zeros(s_size), obs0),
                           jnp.arange(n_steps))
    return logs


def fit_kappa(v: np.ndarray, dt: float, kick_step: int,
              settle: int = 50, window: int = 400) -> dict:
    """Log-linear fit of the deviation decay after a kick.

    v: (T,) the velocity component of interest. v_ss is estimated from the
    pre-kick steady state; the fit regresses log|v - v_ss| on t over
    [kick+settle, kick+window] (the settle skip avoids the impulsive
    transient the exponential model does not describe).
    Returns {kappa [log_e/s], r2, v_ss, dev0}."""
    v_ss = float(np.mean(v[max(kick_step - 200, 0):kick_step]))
    dev = np.abs(v[kick_step:] - v_ss)
    dev0 = float(dev[:settle].max(initial=1e-9))
    seg = dev[settle:window]
    seg = np.clip(seg, 1e-4, None)
    t = np.arange(settle, window) * dt
    y = np.log(seg)
    A = np.stack([t, np.ones_like(t)], axis=1)
    coef, res, *_ = np.linalg.lstsq(A, y, rcond=None)
    ss_tot = float(((y - y.mean()) ** 2).sum())
    r2 = 1.0 - float(res[0]) / ss_tot if res.size and ss_tot > 0 else 0.0
    return {"kappa": float(coef[0]), "r2": r2, "v_ss": v_ss, "dev0": dev0}


def recovery_sweep(cfg: EnvConfig, params, commands: Sequence[float],
                   kicks: Sequence[float], key, n_steps: int = 1500,
                   kick_step: int = 750, axis: int = 1) -> list:
    """Recovery-rate experiment grid: forward commands x lateral kick sizes.

    axis: which base-velocity component the kick hits (default 1 = lateral,
    the classic push-recovery test). Returns one row per (command, kick)
    with the fitted kappa, survival flag, and steady-state speed."""
    dt = cfg.control_dt
    sign = -1.0 if cfg.wildcat else 1.0
    rows = []
    for vx in commands:
        for kmag in kicks:
            dv = jnp.zeros(6).at[axis].set(kmag)
            log = kick_rollout(cfg, params, jnp.array([vx, 0.0, 0.0]), dv,
                               key, n_steps, kick_step)
            died = bool(np.asarray(log.done)[kick_step:].any())
            vlat = np.asarray(log.v_body)[:, axis]
            fit = fit_kappa(vlat, dt, kick_step)
            vfwd = sign * np.asarray(log.v_body)[:, 0]
            rows.append({"command": float(vx), "kick": float(kmag),
                         "kappa": fit["kappa"], "r2": fit["r2"],
                         "survived": not died,
                         "v_fwd_ss": float(vfwd[kick_step - 200:kick_step].mean())})
    return rows


def latency_recovery(cfg: EnvConfig, params, vx: float,
                     delays_steps: Sequence[int], kick: float, key,
                     n_steps: int = 1500, kick_step: int = 750) -> list:
    """Velocity + recovery rate vs control latency (Figure4.py:330-392).

    Reproduces the reference's headline robustness curve: at each injected
    latency, the achieved forward speed and the lateral-kick recovery rate
    kappa. Latency is emulated by an observation FIFO like analysis.eval's
    latency_sweep; the kick experiment then runs on the delayed loop."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev

    rows = []
    sign = -1.0 if cfg.wildcat else 1.0
    for d in delays_steps:
        # speed under latency (no kick)
        log = ev.policy_rollout(
            cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                        stochastic_dynamics=False),
            params, jnp.array([vx, 0.0, 0.0]), key, n_steps,
            delay_steps=int(d))
        vb = ev.body_velocity(log)[int(n_steps * 0.6):]
        # kappa under latency needs the FIFO inside kick_rollout's loop; a
        # delay of d control steps is equivalent to commanding the policy
        # with d-step-old observations, which the deviation dynamics see as
        # extra phase lag — measured here by kicking the *undelayed* loop of
        # a policy whose obs path carries the FIFO
        klog = _kick_rollout_delayed(cfg, params, jnp.array([vx, 0.0, 0.0]),
                                     jnp.zeros(6).at[1].set(kick), key,
                                     n_steps, kick_step, int(d))
        fit = fit_kappa(np.asarray(klog.v_body)[:, 1], cfg.control_dt, kick_step)
        died = bool(np.asarray(klog.done)[kick_step:].any())
        rows.append({"latency_ms": float(d) * cfg.control_dt * 1e3,
                     "v_mean": float(sign * vb[:, 0].mean()),
                     "kappa": fit["kappa"], "survived": not died})
    return rows


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "kick_step",
                                             "delay_steps"))
def _kick_rollout_delayed(cfg: EnvConfig, params, command, kick_dv, key,
                          n_steps, kick_step, delay_steps) -> KickLog:
    """kick_rollout with an observation FIFO of delay_steps control steps."""
    cfg = cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                      stochastic_dynamics=False)
    state = bp.env_init(cfg, key)
    state = state._replace(command=command, command_filtered=command)
    obs0 = bp.observe(cfg, state)
    s_size = lstm.state_size([w.wh.shape[0] for w in params.pi_lstm])
    cmd_n = (command - bp.obs_mean(cfg)[:3]) / bp.obs_std(cfg)[:3]
    buf = jnp.tile(obs0, (max(delay_steps, 1), 1))

    def scan_fn(carry, idx):
        state, lstm_state, obs, buf = carry
        kicked_gv = state.gv.at[:6].add(kick_dv)
        state = state._replace(
            gv=jnp.where(idx == kick_step, kicked_gv, state.gv))
        if delay_steps > 0:
            delayed = buf[idx % delay_steps]
            buf = buf.at[idx % delay_steps].set(obs)
        else:
            delayed = obs
        o = delayed.at[:3].set(cmd_n)
        action, lstm_state = lstm.deterministic_action(
            params, o[None], lstm_state[None], jnp.zeros((1,)))
        out = bp.step(cfg, state._replace(command=command,
                                          command_filtered=command), action[0])
        R = quat_to_matrix(out.state.gc[3:7])
        log = KickLog(v_body=R.T @ out.state.gv[:3], z=out.state.gc[2],
                      done=out.done)
        return (out.state, lstm_state[0], out.obs, buf), log

    _, logs = jax.lax.scan(scan_fn, (state, jnp.zeros(s_size), obs0, buf),
                           jnp.arange(n_steps))
    return logs
