"""Externally-driven PPO (PPO3 parity, algo/ppo3/ppo3.py:11-444).

The reference's expert variant inverts control flow: the *caller* owns the
loop and the env, calling get_next_action(obs) each step, collect(...) to
deposit transitions, and learn() to run GAE + epochs ("one big graph shared
between multiple agents", algo/ppo3/README:1-6). This class provides that
contract on top of the functional pieces in algo.ppo — useful when the
environment lives outside this framework (hardware-in-the-loop, another sim).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo import ppo as _ppo
from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo.gae import advantages
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp


class PPO3:
    """Caller-driven PPO over an external environment."""

    def __init__(self, ppo_cfg: Optional[_ppo.PPOConfig] = None,
                 n_envs: int = 200, seed: int = 0,
                 obs_dim: int = bp.OBS_DIM, act_dim: int = bp.ACT_DIM):
        self.cfg = ppo_cfg or _ppo.PPOConfig()
        self.pol = self.cfg.policy_mod
        key = jax.random.PRNGKey(seed)
        self.key, k_init = jax.random.split(key)
        self.params = self.pol.init(k_init, obs_dim, act_dim, self.cfg.n_lstm)
        self.optimizer = _ppo.make_optimizer(self.cfg)
        self.opt_state = self.optimizer.init(self.params)
        self.n_envs = n_envs
        self.lstm_state = jnp.zeros((n_envs, self.pol.state_size(self.cfg.n_lstm)))
        self.dones = jnp.zeros((n_envs,))
        self._rollout_init_state = self.lstm_state
        self._buf = []  # list of (obs, action, value, neglogp, done_before)
        self._rewards = []
        self._dones_after = []
        self._last_out = None

        self._fwd = jax.jit(self.pol.forward)
        self._grad = jax.jit(jax.value_and_grad(
            lambda p, b: _ppo.ppo_loss(p, b, self.cfg), has_aux=True))

    # --- rollout interface (ppo3.py:372-389 contract) -------------------------
    def get_next_action(self, obs: np.ndarray, deterministic: bool = False) -> np.ndarray:
        obs = jnp.asarray(obs, jnp.float32)
        if not self._buf:
            self._rollout_init_state = self.lstm_state
        out = self._fwd(self.params, obs, self.lstm_state, self.dones)
        if deterministic:
            action = out.mean
        else:
            self.key, k = jax.random.split(self.key)
            action = out.mean + jnp.exp(out.logstd) * jax.random.normal(k, out.mean.shape)
        from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm as _l
        nlp = _l.neglogp(out.mean, out.logstd, action)
        self._buf.append((obs, action, out.value, nlp, self.dones))
        self._pending_state = out.state
        return np.clip(np.asarray(action), -1.0, 1.0)

    def collect(self, obs, rewards, dones) -> None:
        """Deposit the env's response to the last action (ppo3.py:387-389)."""
        del obs
        self._rewards.append(jnp.asarray(rewards, jnp.float32))
        d = jnp.asarray(dones, jnp.float32)
        self._dones_after.append(d)
        self.lstm_state = self._pending_state
        self.dones = d

    # --- update (ppo3.py:273-345 contract) ------------------------------------
    def learn(self, last_obs: np.ndarray) -> dict:
        obs_s, act_s, val_s, nlp_s, db_s = map(
            lambda xs: jnp.stack(xs), zip(*self._buf))
        rew_s = jnp.stack(self._rewards)
        da_s = jnp.stack(self._dones_after)
        last_value = self._fwd(self.params, jnp.asarray(last_obs, jnp.float32),
                               self.lstm_state, self.dones).value
        _, returns = advantages(rew_s, val_s, da_s, last_value,
                                self.cfg.gamma, self.cfg.lam)
        batch = _ppo.Batch(obs=obs_s, actions=act_s, values=val_s,
                           neglogpacs=nlp_s, returns=returns, dones_before=db_s,
                           rewards=rew_s,
                           init_lstm_state=self._rollout_init_state)
        metrics = {}
        for _ in range(self.cfg.noptepochs):
            (loss, aux), grads = self._grad(self.params, batch)
            updates, self.opt_state = self.optimizer.update(
                grads, self.opt_state, self.params)
            self.params = optax.apply_updates(self.params, updates)
            metrics = {"loss": float(loss), **{k: float(v) for k, v in aux.items()}}
        # average episode/trajectory length summary (ppo3.py:188-190)
        metrics["avg_traj_len"] = float(
            rew_s.size / jnp.maximum(jnp.sum(da_s) + self.n_envs, 1))
        metrics["average_performance"] = float(jnp.mean(jnp.sum(rew_s, axis=0)))
        self._buf.clear(); self._rewards.clear(); self._dones_after.clear()
        return metrics
