"""Training-metrics persistence + dashboard rendering (TensorboardLauncher
replacement, raisim_gym_helper.py:21-32)."""

import json
import os

import numpy as np

from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import dashboard
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.metrics import (
    JsonlLogger, read_jsonl)


def _rows(n=20):
    rows = []
    for i in range(n):
        rows.append({
            "loss": 2.0 / (i + 1), "vf_loss": 1.0 / (i + 1),
            "pg_loss": -0.01 * i, "entropy": 17.0 - 0.1 * i,
            "approxkl": 0.005, "clipfrac": 0.05,
            "explained_variance": min(0.95, 0.1 * i),
            "reward_per_step": 0.3 + 0.01 * i,
            "ep_rew_mean": 50.0 + i if i % 3 == 0 else 0.0,
            "ep_len_mean": 300.0 if i % 3 == 0 else 0.0,
            "ep_count": 2 if i % 3 == 0 else 0,
            "fps": 4e4, "timesteps": (i + 1) * 150_000,
        })
    return rows


def test_jsonl_roundtrip(tmp_path):
    p = str(tmp_path / "metrics.jsonl")
    with JsonlLogger(p) as log:
        for r in _rows(5):
            log.write(r)
    back = read_jsonl(p)
    assert len(back) == 5
    assert back[0]["loss"] == 2.0 and back[-1]["timesteps"] == 750_000


def test_dashboard_png_and_html(tmp_path):
    png = str(tmp_path / "dash.png")
    html = str(tmp_path / "dash.html")
    dashboard.training_dashboard(_rows(), png, title="t")
    dashboard.training_dashboard(_rows(), html)
    assert os.path.getsize(png) > 10_000
    assert "data:image/png;base64," in open(html).read()


def test_load_metrics_from_run_dir(tmp_path):
    with JsonlLogger(str(tmp_path / "metrics.jsonl")) as log:
        for r in _rows(3):
            log.write(r)
    assert len(dashboard.load_metrics(str(tmp_path))) == 3


def test_parse_train_log_fallback(tmp_path):
    """Rows recovered from the stdout format algo.ppo.learn prints."""
    p = str(tmp_path / "train.log")
    with open(p, "w") as f:
        f.write("run dir: runs/x\n")
        f.write("update 1/100: approxkl=0.005032 clipfrac=0.05703 "
                "entropy=-5.612 ep_count=1 ep_len_mean=340 ep_rew_mean=86.29 "
                "explained_variance=0.9011 loss=1.807 pg_loss=-0.0009283 "
                "reward_per_step=0.6655 vf_loss=3.615 fps=3.196e+04 "
                "timesteps=1.502e+08\n")
        f.write("garbage line\n")
        f.write("update 2/100: approxkl=0.004 clipfrac=0.047 entropy=-5.6 "
                "ep_count=0 ep_len_mean=0 ep_rew_mean=0 "
                "explained_variance=0.885 loss=1.85 pg_loss=-0.002 "
                "reward_per_step=0.666 vf_loss=3.7 fps=3.2e+04 "
                "timesteps=1.503e+08\n")
    rows = dashboard.parse_train_log(p)
    assert len(rows) == 2
    assert rows[0]["update"] == 1
    assert abs(rows[0]["fps"] - 3.196e4) < 1
    assert rows[1]["ep_count"] == 0
    out = dashboard.training_dashboard(rows, str(tmp_path / "d.png"))
    assert os.path.getsize(out) > 10_000
