import jax
import jax.numpy as jnp
import numpy as np
import pytest
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp

pytestmark = pytest.mark.slow  # heavy-compile suite (see pyproject addopts)


def _fast(cfg):
    return cfg.replace(simulation_dt=0.001, obs_noise=0.0, stochastic_dynamics=False)


def test_crucial_spawns_and_launches_cubes():
    cfg = _fast(config.train_default()).replace(crucial=True, num_cube=4,
                                                cube_place_radius=0.5)
    state = bp.env_init(cfg, jax.random.PRNGKey(0))
    assert state.cube_pos.shape == (4, 3)
    # ring sits ~1 m above ground at reset
    np.testing.assert_allclose(np.asarray(state.cube_pos[:, 2]),
                               float(state.gc[2]) + 1.0, atol=1e-5)
    out = bp.step(cfg, state, jnp.zeros(12))
    s = out.state
    # after the first non-respawn step the spheres are active and falling
    for _ in range(3):
        out = bp.step(cfg, s, jnp.zeros(12))
        s = out.state
        if bool(s.cube_active) and not bool(out.done):
            break
    if bool(s.cube_active):
        assert float(s.cube_vel[:, 2].min()) < 0.0  # falling


def test_force_attack_statistics():
    cfg = _fast(config.train_default()).replace(force_disturbance=True)
    # ~2 triggers per episode: P(trigger) = 2*dt/max_time per step
    keys = jax.random.split(jax.random.PRNGKey(0), 2000)
    wr = jax.vmap(lambda k: bp._force_attack(cfg, k))(keys)
    rate = float((np.abs(np.asarray(wr)).sum(axis=1) > 0).mean())
    expect = 2 * cfg.control_dt / cfg.max_time
    assert abs(rate - expect) < 3 * np.sqrt(expect / 2000) + 1e-3
    # wrench structure: only fz, nx, ny populated (Environment.hpp:891-895)
    nz = np.abs(np.asarray(wr)).max(axis=0)
    assert nz[0] == 0 and nz[1] == 0 and nz[5] == 0
    assert nz[2] <= 2000.0 + 1e-3 and nz[3] <= 400.0 + 1e-3


def test_manual_state_kick_runs():
    cfg = _fast(config.test_default()).replace(force_disturbance=True)
    state = bp.env_init(cfg, jax.random.PRNGKey(0))
    out = bp.step(cfg, state, jnp.zeros(12))
    assert np.all(np.isfinite(np.asarray(out.state.gc)))


def test_terrain_env_runs():
    cfg = _fast(config.train_default()).replace(terrain=True)
    state = bp.env_init(cfg, jax.random.PRNGKey(0))
    assert float(state.terrain.z_scale) > 0
    out = bp.step(cfg, state, jnp.zeros(12))
    assert np.all(np.isfinite(np.asarray(out.obs)))
