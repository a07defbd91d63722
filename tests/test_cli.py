import numpy as np
import pytest
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config as cfg_mod
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import gamepad as gp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils import native

pytestmark = pytest.mark.slow  # heavy-compile suite (see pyproject addopts)


def test_scripted_pad_schedule():
    pad = gp.ScriptedPad(dt=0.5)
    cmds = np.stack([pad.poll() for _ in range(30)])
    # first second: stand (zero command)
    np.testing.assert_allclose(cmds[:2], 0.0)
    # plateau at full forward command in the 1.0 vx segment (t in [3, 6))
    assert np.any(np.all(cmds == np.array([1.0, 0.0, 0.0]), axis=1))
    # ends stopped and holds past the schedule end
    np.testing.assert_allclose(cmds[-1], 0.0)


def test_open_pad_falls_back_scripted():
    pad = gp.open_pad(index=250)  # no such joystick device
    assert isinstance(pad, gp.ScriptedPad)
    pad.close()


@pytest.mark.skipif(not native.native_available(), reason="native runtime not built")
def test_interactive_teleop_smoke():
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.cli import test as cli_test
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm
    import jax

    cfg = cfg_mod.test_default().replace(crucial=False, terrain=False)
    params = lstm.init(jax.random.PRNGKey(0))
    res = cli_test.interactive(cfg, params, n_steps=4, serve_port=0)
    assert res["steps"] == 4
    assert len(res["v_mean"]) == 3
