import jax
import jax.numpy as jnp
import numpy as np
import pytest

from high_speed_quadrupedal_locomotion_by_irrl_tpu import config
from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo, ppo3
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import mlp, registry


def test_registry():
    assert registry.get_policy("CustomLSTMPolicy") is registry.get_policy("LstmPolicy")
    assert registry.get_policy("MlpPolicy") is mlp
    with pytest.raises(KeyError):
        registry.get_policy("nope")


def test_mlp_forward_shapes():
    params = mlp.init(jax.random.PRNGKey(0), 35, 12, (16, 16))
    obs = jnp.zeros((4, 35))
    out = mlp.forward(params, obs, jnp.zeros((4, 0)), jnp.zeros(4))
    assert out.mean.shape == (4, 12)
    assert out.value.shape == (4,)
    seq = mlp.sequence(params, jnp.zeros((3, 4, 35)), jnp.zeros((3, 4)),
                       jnp.zeros((4, 0)))
    assert seq.mean.shape == (3, 4, 12)


def test_ppo_update_with_mlp_policy():
    env_cfg = config.train_default().replace(
        simulation_dt=0.001, num_envs=4, obs_noise=0.0, stochastic_dynamics=False)
    ppo_cfg = ppo.PPOConfig(n_steps=4, noptepochs=1, nminibatches=1,
                            policy="MlpPolicy", n_lstm=(16, 16))
    ts = ppo.init_train_state(env_cfg, ppo_cfg, jax.random.PRNGKey(0))
    update = jax.jit(ppo.make_update_fn(env_cfg, ppo_cfg))
    ts2, metrics = update(ts)
    assert np.isfinite(float(metrics["loss"]))


def test_ppo3_external_loop():
    """Caller-driven PPO over a trivial external 'environment'."""
    rng = np.random.default_rng(0)
    n_envs, obs_dim = 3, 35
    agent = ppo3.PPO3(ppo.PPOConfig(n_steps=5, noptepochs=2, n_lstm=(8, 8)),
                      n_envs=n_envs)
    obs = rng.normal(size=(n_envs, obs_dim)).astype(np.float32)
    for _ in range(5):
        a = agent.get_next_action(obs)
        assert a.shape == (n_envs, 12)
        obs = rng.normal(size=(n_envs, obs_dim)).astype(np.float32)
        rew = rng.normal(size=n_envs).astype(np.float32)
        done = (rng.random(n_envs) < 0.1).astype(np.float32)
        agent.collect(obs, rew, done)
    metrics = agent.learn(obs)
    assert np.isfinite(metrics["loss"])
    assert "average_performance" in metrics
