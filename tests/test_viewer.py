"""Standalone HTML rollout viewer (analysis/viewer.py)."""

import json
import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config as cfg_mod
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import eval as ev
from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import viewer
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm

pytestmark = pytest.mark.slow  # heavy-compile suite (see pyproject addopts)


def test_viewer_html_selfcontained(tmp_path):
    cfg = cfg_mod.test_default().replace(crucial=False, terrain=False)
    params = lstm.init(jax.random.PRNGKey(0))
    log = ev.policy_rollout(cfg, params, jnp.array([1.0, 0.0, 0.0]),
                            jax.random.PRNGKey(1), 40)
    out = str(tmp_path / "v.html")
    viewer.write_html(cfg, log, out, stride=4)
    html = open(out).read()
    # self-contained: no external resources
    assert "http://" not in html and "https://" not in html
    assert "<canvas" in html and "requestAnimationFrame" in html
    d = json.loads(re.search(r"const D = (\{.*?\});\n", html, re.S).group(1))
    assert len(d["body"]) == 10            # 40 steps / stride 4
    assert len(d["legs"]) == 4
    assert len(d["legs"][0][0]) == 4       # abduct, thigh, shank, toe
    assert len(d["body"][0]) == 8          # box corners
    assert d["rew_names"][-1] == "Total"
    # geometry plausible: toes below the body
    toe_z = np.array([d["legs"][l][0][3][2] for l in range(4)])
    body_z = np.array(d["body"][0])[:, 2].mean()
    assert np.all(toe_z < body_z)
