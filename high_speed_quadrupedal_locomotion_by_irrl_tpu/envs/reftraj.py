"""RefTraj table construction and interop.

The reference's RefTraj mode replays a pre-recorded table
(theta 0:12 | theta_dot 12:24 | z 24 | phase 25:27 | cmd 27:30 — the layout
consumed at Environment.hpp:972, :1102, :1664-1682). The training CSVs were
never shipped (absolute home paths in the YAMLs; VectorizedEnvironment
tolerates their absence at :160-169), so this module provides:

- :func:`synthesize` — generate a table from this framework's own gait
  generator (a command schedule -> the exact 30-col layout);
- :func:`from_trot_csv` — convert the shipped 28-col analysis table
  (Exp_Raw_Data/trot_ref_.csv: x z pitch q0-11 dq0-11 roll) into the 30-col
  layout, synthesizing the phase channel from the gait clock.

Tables load through the native runtime (utils.native.load_table).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.robot import gait
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import native

TABLE_COLS = 30


def synthesize(cfg: EnvConfig, commands: np.ndarray, frames_per_command: int) -> jnp.ndarray:
    """Build a (len(commands)*frames, 30) RefTraj table from the gait generator.

    commands: (K, 3) command rows held for frames_per_command steps each.
    """
    dt = cfg.control_dt
    rows = []
    t = 0.0
    for cmd in np.asarray(commands, dtype=np.float64):
        cmd_j = jnp.asarray(cmd)
        ts = t + np.arange(frames_per_command) * dt
        refs = jax.vmap(lambda tt: gait.gait_reference(cfg, cmd_j, tt).joint_ref)(
            jnp.asarray(ts))
        refs = np.asarray(refs)
        prev = np.asarray(gait.gait_reference(cfg, cmd_j, jnp.asarray(t - dt)).joint_ref)
        dots = np.diff(np.vstack([prev[None], refs]), axis=0) / dt
        phase = np.stack([np.sin(2 * np.pi * ts / cfg.period),
                          np.cos(2 * np.pi * ts / cfg.period)], axis=-1)
        z = np.full((frames_per_command, 1), cfg.stand_height)
        cmds = np.tile(cmd, (frames_per_command, 1))
        rows.append(np.concatenate([refs, dots, z, phase, cmds], axis=-1))
        t = float(ts[-1] + dt)
    return jnp.asarray(np.concatenate(rows, axis=0), jnp.float32)


def from_trot_csv(path: str, cfg: EnvConfig, dt_record: float = 0.002,
                  vx_command: float | None = None) -> jnp.ndarray:
    """Convert the shipped 28-col trot table into the 30-col RefTraj layout."""
    raw = native.load_table(path)          # (N, 28): x z pitch q12 dq12 roll
    n = raw.shape[0]
    ts = np.arange(n) * dt_record
    phase = np.stack([np.sin(2 * np.pi * ts / cfg.period),
                      np.cos(2 * np.pi * ts / cfg.period)], axis=-1)
    if vx_command is None:
        # average forward speed from the x column
        vx_command = float((raw[-1, 0] - raw[0, 0]) / max(ts[-1], 1e-9))
    cmds = np.tile([vx_command, 0.0, 0.0], (n, 1)).astype(np.float32)
    table = np.concatenate([raw[:, 3:15], raw[:, 15:27], raw[:, 1:2],
                            phase.astype(np.float32), cmds], axis=-1)
    assert table.shape[1] == TABLE_COLS
    return jnp.asarray(table)
