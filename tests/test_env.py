import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.phys import model as mdl


@pytest.fixture(scope="module")
def cfg():
    # fast test variant: 2 substeps instead of 8, no noise
    return config.train_default().replace(
        simulation_dt=0.001, obs_noise=0.0, stochastic_dynamics=False, num_envs=4)


@pytest.fixture(scope="module")
def state0(cfg):
    return bp.env_init(cfg, jax.random.PRNGKey(0))


def test_obs_layout_and_normalization(cfg, state0):
    obs_d = np.asarray(state0.obs_double)
    assert obs_d.shape == (35,)
    # phase block is a unit vector (sin, cos)
    assert abs(obs_d[3] ** 2 + obs_d[4] ** 2 - 1.0) < 1e-5
    # command block matches command_filtered
    np.testing.assert_allclose(obs_d[:3], np.asarray(state0.command_filtered), atol=1e-6)
    obs_n = np.asarray(bp.observe(cfg, state0))
    mean = np.asarray(bp.obs_mean(cfg))
    std = np.asarray(bp.obs_std(cfg))
    np.testing.assert_allclose(obs_n, (obs_d - mean) / std, atol=1e-6)
    # std layout: theta_dot block per leg is [5,35,40] (Environment.hpp:388)
    np.testing.assert_allclose(std[17:20], [5.0, 35.0, 40.0])
    np.testing.assert_allclose(std[29:32], 0.7)
    np.testing.assert_allclose(std[32:35], 3.0)


def test_reset_seeds_state_from_reference(cfg, state0):
    q = np.asarray(state0.gc[7:])
    ref = np.asarray(state0.joint_ref)
    # joints initialized within +-30% of the gait reference (Environment.hpp:584)
    # (ref magnitudes can be ~0 for abad, so compare where ref is nonzero)
    nz = np.abs(ref) > 0.05
    assert np.all(np.abs(q[nz] / ref[nz] - 1.0) < 0.31 + 1e-6)
    # base velocity seeded from command (Environment.hpp:587-591), wildcat mirrors
    cmd = float(state0.command_filtered[0])
    if abs(cmd) > 0.1:
        assert abs(float(state0.gv[0]) / (-cmd) - 1.0) < 0.21


def test_step_runs_and_is_finite(cfg, state0):
    out = bp.step(cfg, state0, jnp.zeros(12))
    assert np.all(np.isfinite(np.asarray(out.obs)))
    assert np.isfinite(float(out.reward))
    assert out.obs.shape == (35,)
    assert np.all(np.isfinite(np.asarray(out.state.gc)))


def test_reward_terms_match_formulas(cfg, state0):
    """Recompute the 8 reward terms by hand from the state diagnostics."""
    out = bp.step(cfg, state0, jnp.zeros(12))
    s = out.state
    terms = np.asarray(out.info["reward_terms"])
    # height term: BP*exp(-80 (z-stand)^2) using the post-step z (pre-autoreset)
    # (info carries pre-reset values)
    z = float(out.info["base_height"])
    want_h = cfg.body_pos_coeff * np.exp(-80.0 * (z - cfg.stand_height) ** 2)
    np.testing.assert_allclose(terms[1], want_h, rtol=1e-4)
    # all terms within [0, coeff]
    coeffs = [cfg.ee_coeff, cfg.body_pos_coeff, cfg.body_atti_coeff,
              cfg.joint_mimic_coeff * 0.25, cfg.joint_mimic_coeff * 0.75,
              cfg.vel_keep_coeff, cfg.torque_coeff, cfg.contact_coeff]
    for t, c in zip(terms, coeffs):
        assert -1e-6 <= t <= c + 1e-6


def test_smooth_functions():
    # parity with Environment.hpp:118-156 at sample points
    lam = 0.5
    # phase 0: sin(0)=0 -> 0.5 both
    assert abs(float(bp.smooth_function(jnp.asarray(0.0), 2.0, lam)) - 0.5) < 1e-6
    assert abs(float(bp.smooth_function2(jnp.asarray(0.0), 2.0, lam)) - 0.5) < 1e-6
    # mid-stance (phase=lam/2): sin(pi)*2+0.5 = 0.5 -> exactly 0.5? sin(pi)=0
    # quarter-stance (phase=lam/4): sin(pi/2)*2+0.5=2.5 -> clip 1; sf2 -> 0
    assert float(bp.smooth_function(jnp.asarray(lam / 4), 2.0, lam)) == 1.0
    assert float(bp.smooth_function2(jnp.asarray(lam / 4), 2.0, lam)) == 0.0
    # quarter-swing: -sin(pi/2)*2+0.5=-1.5 -> clip 0; sf2 -> 1
    ph = lam + (1 - lam) / 4
    assert float(bp.smooth_function(jnp.asarray(ph), 2.0, lam)) == 0.0
    assert float(bp.smooth_function2(jnp.asarray(ph), 2.0, lam)) == 1.0


def test_torque_clamp_envelope(cfg):
    c = cfg.replace(motor_critical_speed=14.2, motor_max_speed=40.0, motor_max_torque=18.0)
    big = jnp.full(12, 100.0)
    # at zero speed: clamp to +-18 (knees 18*1.55=27.9? no: up=(18)*1.55 for knees)
    t0 = np.asarray(bp.torque_clamp(c, big, jnp.zeros(12)))
    np.testing.assert_allclose(t0, [18.0, 18.0, 27.9] * 4, rtol=1e-6)
    # above critical speed the budget derates linearly to 0 at max speed
    qd = jnp.full(12, 40.0)  # abad/hip at max speed
    t1 = np.asarray(bp.torque_clamp(c, big, qd))
    np.testing.assert_allclose(t1[0], 0.0, atol=1e-4)
    # negative side symmetric
    t2 = np.asarray(bp.torque_clamp(c, -big, -qd))
    np.testing.assert_allclose(t2[0], 0.0, atol=1e-4)


def test_termination_and_autoreset(cfg, state0):
    # force a terminal state: drop the base to z=0.1
    dead = state0._replace(gc=state0.gc.at[2].set(0.05))
    out = bp.step(cfg, dead, jnp.zeros(12))
    assert bool(out.done)
    # terminal reward added (Environment/VectorizedEnvironment contract)
    # and state auto-reset: new z back near stand height
    assert 0.2 < float(out.state.gc[2]) < 0.5
    assert int(out.state.ep_len) == 0


def test_episode_bookkeeping(cfg, state0):
    out = bp.step(cfg, state0, jnp.zeros(12))
    assert int(out.state.ep_len) == 1 or bool(out.done)


def test_vmap_batch(cfg):
    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    states = jax.vmap(lambda k: bp.env_init(cfg, k))(keys)
    outs = jax.vmap(lambda s, a: bp.step(cfg, s, a))(states, jnp.zeros((4, 12)))
    assert outs.obs.shape == (4, 35)
    # different seeds -> different states
    assert np.std(np.asarray(outs.state.gc[:, 0])) > 1e-3


def test_origin_state_dim(state0):
    os_ = bp.origin_state(state0)
    assert os_.shape == (41,)  # gc 19 + gv 18 + contact 4 (Environment.hpp:1317-1334)
