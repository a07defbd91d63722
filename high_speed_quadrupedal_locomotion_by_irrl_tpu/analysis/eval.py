"""Evaluation & analysis suites.

Device-side re-design of the reference's test-branch analysis modes
(run_bp_v5.py:261-1120): every sweep is a jitted, vmapped rollout that
returns arrays; plotting stays host-side and optional. Covered capabilities:

- :func:`policy_rollout`         — closed-loop rollout logging OriginState-level
  traces (gc/gv/torque/contacts/commands), the data source for every mode below
- :func:`tracking_eval`          — velocity-tracking mean/std vs command
  (run_bp_v5.py:738-818, Figure-2 right panels)
- :func:`torque_power`           — per-joint torque/velocity/mechanical power +
  total cost of transport TCoT = P/(m g v) (run_bp_v5.py:846-914, Figure2.py:208-258)
- :func:`work_condition`         — motor work-condition envelope occupancy
  (run_bp_v5.py:916-1030)
- :func:`state_space`            — joint phase portraits / limit-cycle data
  (run_bp_v5.py:520-662)
- :func:`latency_sweep`          — speed vs injected control latency
  (DelayTool experiments, run_bp_v5.py:360-365; Figure4.py:330-392)
- :func:`lstm_state_correlation` — hidden-state correlation matrices
  (run_bp_v5.py:1032-1088)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.rotation import quat_to_matrix


class RolloutLog(NamedTuple):
    gc: jnp.ndarray            # (T, 19)
    gv: jnp.ndarray            # (T, 18)
    torque: jnp.ndarray        # (T, 12) applied joint torques [Nm]
    action: jnp.ndarray        # (T, 12)
    obs: jnp.ndarray           # (T, 35) normalized
    reward: jnp.ndarray        # (T,)
    done: jnp.ndarray          # (T,)
    contact: jnp.ndarray       # (T, 4)
    command: jnp.ndarray       # (T, 3)
    lstm_state: jnp.ndarray    # (T, S)
    joint_ref: jnp.ndarray     # (T, 12)


def _fixed_command_cfg(cfg: EnvConfig) -> EnvConfig:
    """Deployment-style env: no resampling noise sources."""
    return cfg.replace(manual=True, obs_noise=0.0, action_noise=0.0,
                       stochastic_dynamics=False)


@functools.partial(jax.jit, static_argnames=("cfg", "n_steps", "delay_steps"))
def policy_rollout(cfg: EnvConfig, params: lstm.PolicyParams, command: jnp.ndarray,
                   key: jax.Array, n_steps: int = 750,
                   delay_steps: int = 0) -> RolloutLog:
    """Closed-loop rollout of the LSTM controller at a fixed command.

    delay_steps > 0 inserts an observation FIFO of that many control steps
    (the DelayTool latency experiment, run_bp_v5.py:360-365).
    """
    state = bp.env_init(cfg, key)
    state = state._replace(command=command, command_filtered=command)
    obs0 = bp.observe(cfg, state)
    s_size = lstm.state_size([w.wh.shape[0] for w in params.pi_lstm])

    cmd_n = (command - bp.obs_mean(cfg)[:3]) / bp.obs_std(cfg)[:3]
    delay_buf = jnp.tile(obs0, (max(delay_steps, 1), 1))

    def scan_fn(carry, _):
        state, lstm_state, obs, buf, idx = carry
        if delay_steps > 0:
            delayed = buf[idx % delay_steps]
            buf = buf.at[idx % delay_steps].set(obs)
        else:
            delayed = obs
        delayed = delayed.at[:3].set(cmd_n)  # manual-mode command injection
        action, lstm_state_new = lstm.deterministic_action(
            params, delayed[None], lstm_state[None], jnp.zeros((1,)))
        action = action[0]
        out = bp.step(cfg, state._replace(command=command, command_filtered=command),
                      action)
        log = RolloutLog(
            gc=out.state.gc, gv=out.state.gv, torque=out.state.torque_applied,
            action=action, obs=out.obs, reward=out.reward, done=out.done,
            contact=out.state.contact_filtered, command=command,
            lstm_state=lstm_state_new[0], joint_ref=out.state.joint_ref)
        return (out.state, lstm_state_new[0], out.obs, buf, idx + 1), log

    (_, _, _, _, _), logs = jax.lax.scan(
        scan_fn, (state, jnp.zeros(s_size), obs0, delay_buf, jnp.zeros((), jnp.int32)),
        None, length=n_steps)
    return logs


def body_velocity(log: RolloutLog) -> np.ndarray:
    """(T, 3) body-frame linear velocity from the log."""
    R = quat_to_matrix(log.gc[:, 3:7])
    return np.einsum("tji,tj->ti", np.asarray(R), np.asarray(log.gv[:, :3]))


def tracking_eval(cfg: EnvConfig, params, commands, key, n_steps=2000, skip=None):
    """Velocity-tracking error stats per command (run_bp_v5.py:738-818).

    The robot accelerates for up to ~2 s at high commands (it starts from
    stand), so steady-state stats use the trailing 40% of the rollout by
    default; pass an explicit `skip` (in control steps) to override."""
    rows = []
    for vx in commands:
        log = policy_rollout(_fixed_command_cfg(cfg), params,
                             jnp.array([vx, 0.0, 0.0]), key, n_steps)
        vb = body_velocity(log)[skip if skip is not None else int(n_steps * 0.6):]
        sign = -1.0 if cfg.wildcat else 1.0
        err = sign * vb[:, 0] - vx
        rows.append({"command": float(vx), "v_mean": float((sign * vb[:, 0]).mean()),
                     "v_std": float(vb[:, 0].std()), "err_mean": float(err.mean()),
                     "err_std": float(err.std())})
    return rows


def torque_power(cfg: EnvConfig, params, vx, key, n_steps=750, skip=100, mass=10.0):
    """Torque/power traces + TCoT = P/(m g v) (Figure2.py:208-258 metric)."""
    log = policy_rollout(_fixed_command_cfg(cfg), params,
                         jnp.array([vx, 0.0, 0.0]), key, n_steps)
    tau = np.asarray(log.torque)[skip:]
    qd = np.asarray(log.gv[:, 6:])[skip:]
    power = tau * qd
    total_power = np.abs(power).sum(axis=1)
    vb = np.abs(body_velocity(log)[skip:, 0])
    tcot = float(total_power.mean() / (mass * 9.81 * max(vb.mean(), 1e-6)))
    return {"torque": tau, "joint_vel": qd, "power": power,
            "mean_power": float(total_power.mean()), "tcot": tcot,
            "v_mean": float(vb.mean())}


def work_condition(cfg: EnvConfig, params, vx, key, n_steps=750, skip=100):
    """Motor work-condition points (|qd|, |tau|) + envelope violations
    (run_bp_v5.py:916-1030)."""
    log = policy_rollout(_fixed_command_cfg(cfg), params,
                         jnp.array([vx, 0.0, 0.0]), key, n_steps)
    tau = np.abs(np.asarray(log.torque))[skip:]
    qd = np.abs(np.asarray(log.gv[:, 6:]))[skip:]
    tm, cs, ms = cfg.motor_max_torque, cfg.motor_critical_speed, cfg.motor_max_speed
    ratio = np.array([1.0, 1.0, mdl.KNEE_RATIO] * 4)
    w = qd * ratio
    budget = np.where(w > cs, tm - (w - cs) * tm / (ms - cs), tm) * ratio
    violations = float((tau > budget + 1e-6).mean())
    return {"speed": qd, "torque": tau, "violation_rate": violations}


def state_space(cfg: EnvConfig, params, vx, key, n_steps=750, skip=100):
    """(q, qd) phase portraits per joint (run_bp_v5.py:520-662)."""
    log = policy_rollout(_fixed_command_cfg(cfg), params,
                         jnp.array([vx, 0.0, 0.0]), key, n_steps)
    return {"q": np.asarray(log.gc[:, 7:])[skip:],
            "qd": np.asarray(log.gv[:, 6:])[skip:],
            "ref": np.asarray(log.joint_ref)[skip:]}


def latency_sweep(cfg: EnvConfig, params, vx, delays_steps, key, n_steps=750, skip=200):
    """Achieved speed vs injected latency (Figure4.py:330-392 experiment)."""
    rows = []
    skip = min(skip, n_steps // 2)   # short smoke runs: keep the window non-empty
    for d in delays_steps:
        log = policy_rollout(_fixed_command_cfg(cfg), params,
                             jnp.array([vx, 0.0, 0.0]), key, n_steps, delay_steps=int(d))
        vb = body_velocity(log)[skip:]
        sign = -1.0 if cfg.wildcat else 1.0
        alive = 1.0 - float(np.asarray(log.done)[skip:].mean())
        rows.append({"latency_ms": float(d) * cfg.control_dt * 1e3,
                     "v_mean": float((sign * vb[:, 0]).mean()),
                     "survival": alive})
    return rows


def lstm_state_correlation(cfg: EnvConfig, params, vx, key, n_steps=750, skip=100):
    """Hidden-state correlation heatmap data (run_bp_v5.py:1032-1088)."""
    log = policy_rollout(_fixed_command_cfg(cfg), params,
                         jnp.array([vx, 0.0, 0.0]), key, n_steps)
    h = np.asarray(log.lstm_state)[skip:]
    h = h - h.mean(0)
    std = h.std(0) + 1e-8
    return (h / std).T @ (h / std) / h.shape[0]


def value_pca(params, log: RolloutLog, tower: str = "v"):
    """PCA map of LSTM hidden states colored by the value estimate
    (run_bp_v5.py:820-844, the PCA value-function visualization).

    Projects the chosen tower's concatenated hidden states onto their two
    principal components; the color channel is the value head applied to the
    logged value-tower latent (no re-rollout needed)."""
    chs = lstm._split_state(params, log.lstm_state)   # [(c, h)] pi then v
    n_pi = len(params.pi_lstm)
    sel = chs[:n_pi] if tower == "pi" else chs[n_pi:]
    h = np.concatenate([np.asarray(h_) for (_, h_) in sel], axis=-1)  # (T, H)
    v_last = np.asarray(chs[-1][1])
    value = v_last @ np.asarray(params.vf_w)[:, 0] + float(params.vf_b[0])
    hc = h - h.mean(0)
    _, s, vt = np.linalg.svd(hc, full_matrices=False)
    return {"coords": hc @ vt[:2].T, "value": value,
            "explained": (s[:2] ** 2 / max((s ** 2).sum(), 1e-12))}


def spectrogram(signal, dt: float, window: int = 256, hop: int = 32):
    """STFT magnitude of a scalar trace (run_bp_v5.py:1090-1117).

    Hann-windowed, one-sided; returns freqs [Hz], times [s], |S| in dB."""
    x = np.asarray(signal, float)
    if len(x) < window:
        window = max(8, 1 << int(np.log2(max(len(x), 8))))
        hop = max(1, window // 8)
    win = np.hanning(window)
    starts = np.arange(0, len(x) - window + 1, hop)
    frames = np.stack([x[s:s + window] * win for s in starts])
    mag = np.abs(np.fft.rfft(frames, axis=1))
    return {"freqs": np.fft.rfftfreq(window, dt),
            "times": (starts + window / 2) * dt,
            "db": 20 * np.log10(mag.T + 1e-12)}


def toe_trajectories(log: RolloutLog) -> np.ndarray:
    """(T, 4, 3) hip-frame toe positions via FK over the logged joints
    (the end-effector-trajectory mode, run_bp_v5.py:692-736)."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import kinematics
    return np.asarray(jax.vmap(kinematics.legs_fk)(log.gc[:, 7:19]))


def energy_data(cfg: EnvConfig, params, vx, key, n_steps=750):
    """Per-step energy/dynamics dump (run_bp_v5.py:446-511 --save_energy_data):
    trajectory + applied torques + M^-1 + nonlinearities + mechanical power,
    the arrays the reference exports for Data_Visualization_Code/."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import dynamics
    log = policy_rollout(_fixed_command_cfg(cfg), params,
                         jnp.array([vx, 0.0, 0.0]), key, n_steps)
    p = mdl.nominal_params(cfg)
    minv = jax.jit(jax.vmap(lambda gc: dynamics.inverse_mass_matrix(p, gc)))(log.gc)
    nonlin = jax.jit(jax.vmap(lambda gc, gv: dynamics.nonlinearities(p, gc, gv)))(
        log.gc, log.gv)
    tau = np.asarray(log.torque)
    qd = np.asarray(log.gv[:, 6:])
    return {"gc": np.asarray(log.gc), "gv": np.asarray(log.gv), "torque": tau,
            "contact": np.asarray(log.contact), "inverse_mass": np.asarray(minv),
            "nonlinear": np.asarray(nonlin), "power": tau * qd}
