"""Run-provenance helper (ConfigurationSaver parity, raisim_gym_helper.py:6-18).

Creates a timestamped run directory and snapshots the config + the env source
file into it, so every training run records exactly what it ran — the same
contract as the reference's ConfigurationSaver (run_bp_v5.py:214-216), which
copied Environment.hpp + the YAML.
"""

from __future__ import annotations

import dataclasses
import datetime
import os
import shutil

from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig


def make_run_dir(log_root: str, cfg: EnvConfig, extra_files=()) -> str:
    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    run_dir = os.path.join(log_root, stamp)
    os.makedirs(run_dir, exist_ok=True)
    with open(os.path.join(run_dir, "config.txt"), "w") as f:
        for field in dataclasses.fields(cfg):
            f.write(f"{field.name}: {getattr(cfg, field.name)}\n")
    env_src = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                           "envs", "blackpanther.py")
    shutil.copy(env_src, run_dir)
    for f_ in extra_files:
        if os.path.exists(f_):
            shutil.copy(f_, run_dir)
    return run_dir
