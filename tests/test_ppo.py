import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo
from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo.gae import advantages

pytestmark = pytest.mark.slow  # heavy-compile suite (see pyproject addopts)


def numpy_gae(rewards, values, dones_after, last_value, gamma, lam):
    """Oracle port of the reference's backward loop (ppo2.py:554-568)."""
    T = rewards.shape[0]
    advs = np.zeros_like(rewards)
    last = 0.0
    for t in reversed(range(T)):
        nt = 1.0 - dones_after[t]
        v_next = last_value if t == T - 1 else values[t + 1]
        delta = rewards[t] + gamma * v_next * nt - values[t]
        last = delta + gamma * lam * nt * last
        advs[t] = last
    return advs, advs + values


def test_gae_matches_reference_loop(rng):
    T, B = 20, 5
    r = rng.normal(size=(T, B)).astype(np.float32)
    v = rng.normal(size=(T, B)).astype(np.float32)
    d = (rng.random((T, B)) < 0.15).astype(np.float32)
    lv = rng.normal(size=B).astype(np.float32)
    a, ret = advantages(jnp.asarray(r), jnp.asarray(v), jnp.asarray(d),
                        jnp.asarray(lv), 0.99, 0.998)
    a_np, ret_np = numpy_gae(r, v, d, lv, 0.99, 0.998)
    np.testing.assert_allclose(np.asarray(a), a_np, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ret), ret_np, atol=1e-4)


@pytest.fixture(scope="module")
def tiny():
    env_cfg = config.train_default().replace(
        simulation_dt=0.001, num_envs=4, obs_noise=0.0, stochastic_dynamics=False)
    ppo_cfg = ppo.PPOConfig(n_steps=6, noptepochs=2, nminibatches=2, n_lstm=(8, 8))
    return env_cfg, ppo_cfg


def test_single_update_runs(tiny):
    env_cfg, ppo_cfg = tiny
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    update = jax.jit(ppo.make_update_fn(env_cfg, ppo_cfg))
    ts2, metrics = update(ts)
    for k in ("loss", "pg_loss", "vf_loss", "entropy", "approxkl", "clipfrac"):
        assert np.isfinite(float(metrics[k])), k
    assert int(ts2.update_idx) == 1
    # params actually changed
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()), ts.params, ts2.params)
    assert max(jax.tree.leaves(d)) > 0.0


def test_entropy_floor_projection(tiny):
    """PPOConfig.entropy_floor projects logstd UP after each update so
    policy entropy never drops below the floor (the terrain-relaxation
    collapse guard, docs/evidence/terrain_leg2_r4.md); with the floor
    already satisfied the projection must be a no-op."""
    from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm

    env_cfg, base = tiny
    # floor ABOVE the init entropy (logstd=0 -> 12*1.419 = 17.03 nats)
    cfg_hi = dataclasses.replace(base, entropy_floor=20.0)
    ts = ppo.init_train_state(env_cfg, cfg_hi, jax.random.PRNGKey(0))
    ts2, _ = jax.jit(ppo.make_update_fn(env_cfg, cfg_hi))(ts)
    assert float(lstm.entropy(ts2.params.logstd)) >= 20.0 - 1e-4
    # uniform bump: all dims lifted by the same amount from the pre-floor
    # update result
    cfg_off = dataclasses.replace(base, entropy_floor=None)
    ts3, _ = jax.jit(ppo.make_update_fn(env_cfg, cfg_off))(
        ppo.init_train_state(env_cfg, cfg_off, jax.random.PRNGKey(0)))
    bump = np.asarray(ts2.params.logstd) - np.asarray(ts3.params.logstd)
    np.testing.assert_allclose(bump, bump[0], atol=1e-6)
    # floor far below -> bit-identical to floor=None
    cfg_lo = dataclasses.replace(base, entropy_floor=-100.0)
    ts4, _ = jax.jit(ppo.make_update_fn(env_cfg, cfg_lo))(
        ppo.init_train_state(env_cfg, cfg_lo, jax.random.PRNGKey(0)))
    np.testing.assert_array_equal(np.asarray(ts4.params.logstd),
                                  np.asarray(ts3.params.logstd))


def test_learn_state_hook_curriculum(tiny):
    """ppo.learn's state_hook runs before every update with the run
    fraction and its TrainState writes persist — the zero-recompile
    curriculum mechanism (cli/train --terrain-z-curriculum writes the
    terrain z_scale through it; z_scale multiplies at height-query time,
    phys/terrain._sampled_height)."""
    env_cfg, base = tiny
    env_cfg = env_cfg.replace(terrain=True)
    ppo_cfg = dataclasses.replace(base, n_steps=4)
    seen = []

    def hook(ts, frac):
        seen.append(frac)
        terr = ts.env_state.terrain._replace(
            z_scale=jnp.full_like(ts.env_state.terrain.z_scale,
                                  0.02 + 0.08 * frac))
        return ts._replace(env_state=ts.env_state._replace(terrain=terr))

    n_upd = 3
    ts = ppo.learn(env_cfg, ppo_cfg, n_upd * env_cfg.num_envs * 4,
                   jax.random.PRNGKey(0), verbose=False, state_hook=hook)
    assert seen == [0.0, 0.5, 1.0]
    # the final write persisted through updates and episode resets
    np.testing.assert_allclose(np.asarray(ts.env_state.terrain.z_scale),
                               0.10, atol=1e-6)


def test_update_deterministic_given_key(tiny):
    env_cfg, ppo_cfg = tiny
    update = jax.jit(ppo.make_update_fn(env_cfg, ppo_cfg))
    ts_a = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(7))
    ts_b = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(7))
    _, ma = update(ts_a)
    _, mb = update(ts_b)
    assert float(ma["loss"]) == float(mb["loss"])


def test_ppo_loss_zero_advantage_gradient(tiny):
    """With identical old/new params, ratio=1 and pg_loss = -mean(norm_adv) ~ 0."""
    env_cfg, ppo_cfg = tiny
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(1))
    ts2, batch, _ep = ppo.rollout(env_cfg, ppo_cfg, ts)
    loss, aux = ppo.ppo_loss(ts.params, batch, ppo_cfg)
    # same params that generated the rollout: ratio == 1, approxkl == 0
    assert float(aux["approxkl"]) < 1e-9
    assert float(aux["clipfrac"]) == 0.0
    assert abs(float(aux["pg_loss"])) < 1e-6


def test_lr_anneal_traced_through_state(tiny):
    """--lr-final anneal: the lr rides in the optimizer state (traced via
    inject_hyperparams), so learn() can sweep it per update with ZERO
    recompiles; scheduled_lr is linear from learning_rate to lr_final."""
    env_cfg, base = tiny
    ppo_cfg = dataclasses.replace(base, learning_rate=1e-3, lr_final=1e-4)
    # schedule endpoints + midpoint
    assert ppo.scheduled_lr(ppo_cfg, 0.0) == pytest.approx(1e-3)
    assert ppo.scheduled_lr(ppo_cfg, 1.0) == pytest.approx(1e-4)
    assert ppo.scheduled_lr(ppo_cfg, 0.5) == pytest.approx(5.5e-4)
    # with_learning_rate keeps the jit signature: same treedef + same aval
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    os2 = ppo.with_learning_rate(ts.opt_state, 5.5e-4)
    assert (jax.tree_util.tree_structure(os2)
            == jax.tree_util.tree_structure(ts.opt_state))
    a0 = jax.api_util.shaped_abstractify(ts.opt_state.hyperparams["learning_rate"])
    a1 = jax.api_util.shaped_abstractify(os2.hyperparams["learning_rate"])
    assert a0 == a1
    # the injected value actually drives the update: lr=0 must freeze params
    update = jax.jit(ppo.make_update_fn(env_cfg, ppo_cfg))
    ts_frozen, _ = update(ts._replace(
        opt_state=ppo.with_learning_rate(ts.opt_state, 0.0)))
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     ts.params, ts_frozen.params)
    assert max(jax.tree.leaves(d)) == 0.0
