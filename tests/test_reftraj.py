import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import reftraj


@pytest.fixture(scope="module")
def cfg():
    return config.train_default().replace(
        simulation_dt=0.001, obs_noise=0.0, stochastic_dynamics=False,
        manual_traj=False, num_envs=2)


@pytest.fixture(scope="module")
def table(cfg):
    cmds = np.array([[1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    return reftraj.synthesize(cfg, cmds, frames_per_command=900)


def test_table_layout(cfg, table):
    assert table.shape[1] == 30
    t = np.asarray(table)
    # phase column is a unit vector
    np.testing.assert_allclose(t[:, 25] ** 2 + t[:, 26] ** 2, 1.0, atol=1e-5)
    # command column holds the schedule
    assert abs(t[0, 27] - 1.0) < 1e-6 and abs(t[-1, 27] - 2.0) < 1e-6


def test_table_env_reset_and_step(cfg, table):
    state = bp.env_init(cfg, jax.random.PRNGKey(0), table)
    # frame sampled within the table (reset uses sampling_reshape density)
    assert 0 <= int(state.frame_idx) < table.shape[0]
    # references come from the table row before the current frame
    row = np.asarray(table)[int(state.frame_idx) - 1]
    np.testing.assert_allclose(np.asarray(state.joint_ref), row[0:12], atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.command_filtered), row[27:30], atol=1e-5)
    out = bp.step(cfg, state, jnp.zeros(12), table)
    assert np.all(np.isfinite(np.asarray(out.obs)))
    # obs phase equals the table phase at the stepped frame (pre-autoreset)
    if not bool(out.done):
        row2 = np.asarray(table)[int(state.frame_idx)]
        np.testing.assert_allclose(np.asarray(out.state.obs_double[3:5]),
                                   row2[25:27], atol=1e-5)


def test_from_trot_csv(cfg):
    import os
    path = "/root/reference/Exp_Raw_Data/trot_ref_.csv"
    if not os.path.exists(path):
        pytest.skip("reference data absent")
    table = reftraj.from_trot_csv(path, cfg)
    assert table.shape == (10000, 30)
    t = np.asarray(table)
    assert 3.0 < t[0, 27] < 6.0  # recorded trot runs ~4.5 m/s
    assert np.all(np.isfinite(t))
