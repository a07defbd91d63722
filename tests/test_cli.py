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


def test_cli_analysis_modes_and_energy_dump(tmp_path):
    """--pca/--spectro/--traces/--save-energy-data end-to-end on a tiny
    rollout (run_bp_v5.py:446-511,664-736,820-844,1090-1117 parity)."""
    import jax

    from high_speed_quadrupedal_locomotion_by_irrl_tpu.cli import test as cli_test
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm

    model_dir = str(tmp_path / "model")
    mio.save_bp5_csv(lstm.init(jax.random.PRNGKey(0)), model_dir)
    res = cli_test.main([
        "--model", model_dir, "--steps", "60",
        "--pca", str(tmp_path / "pca.png"),
        "--spectro", str(tmp_path / "spec.png"),
        "--traces", str(tmp_path / "tr"),
        "--save-energy-data", str(tmp_path / "edump"),
    ])
    import os
    for f in ("pca.png", "spec.png", "tr_joints.png", "tr_ee.png"):
        assert os.path.getsize(tmp_path / f) > 3000, f
    assert sorted(res["energy_data"]) == [
        "contact", "gc", "gv", "inverse_mass", "nonlinear", "power", "torque"]
    minv = np.load(tmp_path / "edump" / "inverse_mass.npy")
    assert minv.shape == (60, 18, 18)
    # M^-1 is SPD-symmetric
    np.testing.assert_allclose(minv, np.swapaxes(minv, 1, 2), atol=1e-3)


@pytest.mark.slow
def test_cli_kappa_entropy_mode(tmp_path):
    """--kappa-entropy drives the Figure4 ensemble-entropy estimator through
    the CLI (tiny ensemble; only plumbing + finiteness asserted here — the
    estimator's physics is covered by test_analysis)."""
    import jax

    from high_speed_quadrupedal_locomotion_by_irrl_tpu.cli import test as cli_test
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import io as mio
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm

    model_dir = str(tmp_path / "model")
    mio.save_bp5_csv(lstm.init(jax.random.PRNGKey(0)), model_dir)
    res = cli_test.main([
        "--model", model_dir, "--steps", "120", "--commands", "1",
        "--kappa-entropy", "--ensemble", "16",
    ])
    rows = res["entropy_kappa"]
    assert len(rows) == 1 and rows[0]["command"] == 1.0
    assert np.isfinite(rows[0]["kappa"])
    assert 0.0 <= rows[0]["survival"] <= 1.0


def test_cli_train_smoke_writes_metrics_and_dashboard(tmp_path):
    """Tiny end-to-end train: metrics.jsonl rows + dashboard.png render."""
    import os

    from high_speed_quadrupedal_locomotion_by_irrl_tpu.cli import train as cli_train
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.utils.metrics import read_jsonl

    rd = cli_train.main(["--num-envs", "4", "--n-steps", "8",
                         "--max-updates", "2", "--log-dir", str(tmp_path),
                         "--eval-every", "1"])
    rows = read_jsonl(os.path.join(rd, "metrics.jsonl"))
    assert len(rows) == 2
    assert {"loss", "reward_per_step", "fps", "timesteps"} <= set(rows[0])
    assert os.path.getsize(os.path.join(rd, "dashboard.png")) > 10_000
    assert os.path.exists(os.path.join(rd, "csv_final", "pi_w.csv"))


def test_cli_mpc_smoke(tmp_path):
    """irrl-mpc end to end: SRB engine, short rollout, viewer + CSV exports."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.analysis import rawdata
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.cli import mpc as cli_mpc

    html = tmp_path / "mpc.html"
    csv = tmp_path / "mpc_info.csv"
    cli_mpc.main(["--engine", "srb", "--vx", "0.5", "--steps", "60",
                  "--viewer", str(html), "--dump-info", str(csv)])
    assert html.exists() and html.stat().st_size > 10_000
    info = rawdata.RobotInfo(str(csv))
    assert info.q.shape == (60, 12)
