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


def test_material_flag_parses_reference_test_triple():
    """cli/test --material F,E,T maps to the contact material triple the
    reference's test path sets before eval (run_bp_v5.py:317
    SetContactCoefficient([0.8, 0.2, 0.01]))."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.cli import test as ecli

    args = ecli.parse_args(["--model", "x", "--material", "0.8,0.2,0.01"])
    f, e, t = (float(x) for x in args.material.split(","))
    assert (f, e, t) == (0.8, 0.2, 0.01)
    from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
    cfg = config.test_default().replace(
        contact_friction=f, contact_restitution=e, contact_res_threshold=t)
    assert cfg.contact_friction == 0.8 and cfg.contact_restitution == 0.2
