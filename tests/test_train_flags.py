"""Train-CLI physics-path selection: lanes auto-default at >=1024 envs.

The lanes physics is the measured production-scale win (scripts/bench_ppo.py:
114.8k vs 50.4k env-steps/s at 1024 envs) but loses below ~1k envs where the
(N,)-wide lane vectors pad the 8x128 vector tile, so the CLI picks it by
batch size unless the user overrides (--lanes / --no-lanes).
"""

import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo
from high_speed_quadrupedal_locomotion_by_irrl_tpu.cli import train as tcli


@pytest.mark.parametrize("argv,want_lanes", [
    (["--num-envs", "1024"], True),           # auto at production scale
    (["--num-envs", "2048"], True),
    (["--num-envs", "1024", "--no-lanes"], False),
    (["--num-envs", "8"], False),             # vmap wins at small batch
    (["--num-envs", "8", "--lanes"], True),   # explicit opt-in still works
])
def test_auto_lanes_selection(argv, want_lanes, monkeypatch, tmp_path):
    seen = {}

    def fake_learn(env_cfg, ppo_cfg, *a, **kw):
        seen["lanes"] = env_cfg.use_lanes_physics
        raise SystemExit(0)  # stop before any jit work

    monkeypatch.setattr(ppo, "learn", fake_learn)
    with pytest.raises(SystemExit):
        tcli.main(argv + ["--max-updates", "1", "--log-dir", str(tmp_path)])
    assert seen["lanes"] == want_lanes
