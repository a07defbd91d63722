"""Recurrent PPO, end-to-end on device.

Functional re-design of the reference's PPO2 (ppo2.py:18-450): the Python
rollout loop (750 iterations crossing the pybind and TF-session boundaries
twice per step, ppo2.py:494-582) becomes one ``lax.scan`` carrying
(env state, LSTM state, obs, dones); GAE is a reverse scan; the clipped
surrogate + clipped value loss + entropy objective matches ppo2.py:152-175
term for term; optimization is Adam(eps=1e-5) under global-norm clipping
(ppo2.py:190-197) via optax. Recurrent minibatching shuffles whole
environments, never steps, keeping sequences intact (ppo2.py:381-404), and
all environments are reset after every rollout (ppo2.py:577).

The reference's PPO3 "one big graph, caller-driven" variant (ppo3.py:11-444)
needs no separate implementation here: :func:`rollout`, :func:`ppo_loss`, and
:func:`make_update_fn` are already the externally-drivable pieces — callers
compose them the way PPO3's get_next_action/collect/learn contract intended.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from high_speed_quadrupedal_locomotion_by_irrl_tpu.algo.gae import advantages
from high_speed_quadrupedal_locomotion_by_irrl_tpu.config import EnvConfig
from high_speed_quadrupedal_locomotion_by_irrl_tpu.envs import blackpanther as bp
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import lstm
from high_speed_quadrupedal_locomotion_by_irrl_tpu.models import registry


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters; defaults = the reference's training run
    (run_bp_v5.py:227-242, ppo2.py:195-196)."""
    learning_rate: float = 1e-3
    lr_final: Optional[float] = None   # linear anneal target (None = constant)
    gamma: float = 0.99
    lam: float = 0.998
    clip_range: float = 0.2
    ent_coef: float = 0.0
    # Minimum policy entropy (nats, summed over action dims). After each
    # update the global logstd is projected UP (uniform additive bump) so
    # entropy(logstd) >= this floor. Motivation: both terrain relaxation
    # legs showed clean-physics tracking quality peaking exactly where
    # entropy crossed ~5.2 nats and collapsing monotonically below it
    # while every training-side metric stayed healthy
    # (docs/evidence/terrain_leg2_r4.md) — the same signature as the
    # flat-ground late-relaxation collapse (PARITY.md). None = off
    # (bit-exact legacy update graphs).
    entropy_floor: Optional[float] = None
    vf_coef: float = 0.5
    max_grad_norm: float = 0.5
    noptepochs: int = 10
    nminibatches: int = 1
    n_steps: int = 750
    n_lstm: tuple = (48, 48)
    policy: str = "CustomLSTMPolicy"  # models.registry key (policy zoo parity)

    @property
    def policy_mod(self):
        return registry.get_policy(self.policy)


class TrainState(NamedTuple):
    params: lstm.PolicyParams
    opt_state: optax.OptState
    env_state: bp.EnvState        # batched (B leading axis)
    lstm_state: jnp.ndarray       # (B, S)
    obs: jnp.ndarray              # (B, 35) normalized
    dones: jnp.ndarray            # (B,) done flags after the last step
    key: jax.Array
    update_idx: jnp.ndarray       # () int32


class Batch(NamedTuple):
    obs: jnp.ndarray        # (T, B, 35)
    actions: jnp.ndarray    # (T, B, 12)
    values: jnp.ndarray     # (T, B)
    neglogpacs: jnp.ndarray  # (T, B)
    returns: jnp.ndarray    # (T, B)
    dones_before: jnp.ndarray  # (T, B) mask for LSTM resets during BPTT
    rewards: jnp.ndarray    # (T, B) true env rewards (for logging)
    init_lstm_state: jnp.ndarray  # (B, S)


class EpStats(NamedTuple):
    """True per-episode bookkeeping (RaisimGymVecEnv.py:42-50 ``{"r","l"}``
    info dicts): returns/lengths of episodes that *terminated* during the
    rollout, exactly like the reference records them on ``done``. Episodes
    cut off by the end-of-rollout reset (ppo2.py:577) are not counted."""
    ret_sum: jnp.ndarray   # () sum of completed-episode returns
    len_sum: jnp.ndarray   # () sum of completed-episode lengths
    count: jnp.ndarray     # () number of completed episodes


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    """Adam(eps=1e-5) + global-norm clip (ppo2.py:190-197 semantics).

    The learning rate rides in the optimizer STATE (inject_hyperparams), not
    as a graph constant: the IRRL workflow's defining move is re-running the
    same update at a different lr (imitation 1e-3 -> relaxation 5e-4,
    readme.md:64-75; large-batch rescales), and a baked-in lr forced a full
    ~25-min XLA recompile of the lanes update per value. With lr traced, one
    cached executable serves every lr."""
    def tx(learning_rate):
        return optax.chain(
            optax.clip_by_global_norm(cfg.max_grad_norm),
            optax.adam(learning_rate, eps=1e-5),
        )
    return optax.inject_hyperparams(tx)(learning_rate=cfg.learning_rate)


def scheduled_lr(cfg: PPOConfig, frac: float) -> float:
    """Learning rate at run fraction ``frac`` in [0, 1]: linear anneal from
    ``learning_rate`` to ``lr_final`` (constant when lr_final is None).

    The reference runs each phase at a fixed lr (readme.md:64-75); at the
    production batch (1024 envs, 5x fewer updates per step budget) a fixed
    large-batch-scaled lr collapses entropy late in relaxation, so the fast
    path anneals instead. Because lr is traced through the optimizer state,
    the schedule is a host-side scalar write per update — zero recompiles."""
    if cfg.lr_final is None:
        return cfg.learning_rate
    f = min(max(frac, 0.0), 1.0)
    return cfg.learning_rate + (cfg.lr_final - cfg.learning_rate) * f


def with_learning_rate(opt_state, lr: float):
    """Return ``opt_state`` with the traced learning rate set to ``lr``.

    Clones the stored entry's dtype so the swap never changes the jitted
    update's signature (a weak-vs-strong f32 mismatch would retrace)."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(float(lr),
                                      dtype=hp["learning_rate"].dtype)
    return opt_state._replace(hyperparams=hp)


def init_train_state(env_cfg: EnvConfig, ppo_cfg: PPOConfig, key: jax.Array,
                     params: Optional[lstm.PolicyParams] = None) -> TrainState:
    pol = ppo_cfg.policy_mod
    k_params, k_env, k_train = jax.random.split(key, 3)
    if params is None:
        params = pol.init(k_params, bp.OBS_DIM, bp.ACT_DIM, ppo_cfg.n_lstm)
    env_state = jax.vmap(lambda k: bp.env_init(env_cfg, k))(
        jax.random.split(k_env, env_cfg.num_envs))
    obs = jax.vmap(lambda s: bp.observe(env_cfg, s))(env_state)
    opt_state = make_optimizer(ppo_cfg).init(params)
    return TrainState(
        params=params, opt_state=opt_state, env_state=env_state,
        lstm_state=jnp.zeros((env_cfg.num_envs, pol.state_size(ppo_cfg.n_lstm))),
        obs=obs, dones=jnp.zeros((env_cfg.num_envs,), bool),
        key=k_train, update_idx=jnp.zeros((), jnp.int32))


def rollout(env_cfg: EnvConfig, ppo_cfg: PPOConfig, ts: TrainState):
    """Collect n_steps transitions; returns (new TrainState pieces, Batch)."""
    pol = ppo_cfg.policy_mod
    init_lstm = ts.lstm_state

    def scan_fn(carry, key_t):
        env_state, lstm_state, obs, dones, ep_ret, ep_len = carry
        out = pol.forward(ts.params, obs, lstm_state, dones.astype(obs.dtype))
        action = lstm.sample(key_t, out.mean, out.logstd)
        nlp = lstm.neglogp(out.mean, out.logstd, action)
        clipped = jnp.clip(action, -1.0, 1.0)   # action-space bounds (Runner, ppo2.py:530)
        if env_cfg.use_lanes_physics:
            # batch-in-lanes physics: ~4x substep throughput, long first
            # compile (envs.blackpanther.step_batch notes)
            step_out = bp.step_batch(env_cfg, env_state, clipped)
        else:
            step_out = jax.vmap(lambda s, a: bp.step(env_cfg, s, a))(env_state, clipped)
        # per-episode accumulators; emit (r, l) on done like the reference's
        # episode info dicts (RaisimGymVecEnv.py:42-50)
        ep_ret = ep_ret + step_out.reward
        ep_len = ep_len + 1
        d = step_out.done
        data = (obs, action, out.value, nlp, dones.astype(obs.dtype),
                step_out.reward, d,
                jnp.where(d, ep_ret, 0.0), jnp.where(d, ep_len, 0))
        ep_ret = jnp.where(d, 0.0, ep_ret)
        ep_len = jnp.where(d, 0, ep_len)
        return (step_out.state, out.state, step_out.obs, d, ep_ret, ep_len), data

    key, k_roll = jax.random.split(ts.key)
    keys = jax.random.split(k_roll, ppo_cfg.n_steps)
    zeros_b = jnp.zeros((env_cfg.num_envs,))
    (env_state, lstm_state, obs, dones, _, _), data = jax.lax.scan(
        scan_fn, (ts.env_state, ts.lstm_state, ts.obs, ts.dones,
                  zeros_b, zeros_b.astype(jnp.int32)), keys)
    (mb_obs, mb_actions, mb_values, mb_nlp, mb_dones_before,
     mb_rewards, mb_dones_after, mb_ep_ret, mb_ep_len) = data
    ep_stats = EpStats(ret_sum=jnp.sum(mb_ep_ret),
                       len_sum=jnp.sum(mb_ep_len).astype(jnp.float32),
                       count=jnp.sum(mb_dones_after).astype(jnp.float32))

    last_value = pol.forward(ts.params, obs, lstm_state, dones.astype(obs.dtype)).value
    advs, returns = advantages(mb_rewards, mb_values, mb_dones_after,
                               last_value, ppo_cfg.gamma, ppo_cfg.lam)
    batch = Batch(obs=mb_obs, actions=mb_actions, values=mb_values,
                  neglogpacs=mb_nlp, returns=returns, dones_before=mb_dones_before,
                  rewards=mb_rewards, init_lstm_state=init_lstm)

    # reference resets every env after each rollout (ppo2.py:577)
    env_state = jax.vmap(lambda s: bp.reset(env_cfg, s))(env_state)
    obs = jax.vmap(lambda s: bp.observe(env_cfg, s))(env_state)
    new_ts = ts._replace(env_state=env_state, lstm_state=lstm_state,
                         obs=obs, dones=dones, key=key)
    return new_ts, batch, ep_stats


def ppo_loss(params: lstm.PolicyParams, batch: Batch, ppo_cfg: PPOConfig):
    """Clipped-surrogate loss over full sequences (BPTT)."""
    seq = ppo_cfg.policy_mod.sequence(params, batch.obs, batch.dones_before,
                                      batch.init_lstm_state)
    nlp = lstm.neglogp(seq.mean, seq.logstd, batch.actions)          # (T,B)
    ent = jnp.mean(lstm.entropy(seq.logstd))
    vpred = seq.value

    advs = batch.returns - batch.values
    advs = (advs - advs.mean()) / (advs.std() + 1e-8)

    vpred_clipped = batch.values + jnp.clip(vpred - batch.values,
                                            -ppo_cfg.clip_range, ppo_cfg.clip_range)
    vf_loss = 0.5 * jnp.mean(jnp.maximum((vpred - batch.returns) ** 2,
                                         (vpred_clipped - batch.returns) ** 2))
    ratio = jnp.exp(batch.neglogpacs - nlp)
    pg1 = -advs * ratio
    pg2 = -advs * jnp.clip(ratio, 1.0 - ppo_cfg.clip_range, 1.0 + ppo_cfg.clip_range)
    pg_loss = jnp.mean(jnp.maximum(pg1, pg2))
    loss = pg_loss - ent * ppo_cfg.ent_coef + vf_loss * ppo_cfg.vf_coef

    approxkl = 0.5 * jnp.mean((nlp - batch.neglogpacs) ** 2)
    clipfrac = jnp.mean((jnp.abs(ratio - 1.0) > ppo_cfg.clip_range).astype(jnp.float32))
    return loss, {"pg_loss": pg_loss, "vf_loss": vf_loss, "entropy": ent,
                  "approxkl": approxkl, "clipfrac": clipfrac}


def _select_envs(batch: Batch, idx: jnp.ndarray) -> Batch:
    """Take a subset of environments (recurrent minibatching shuffles envs)."""
    take_t = lambda x: jnp.take(x, idx, axis=1)  # noqa: E731
    return Batch(
        obs=take_t(batch.obs), actions=take_t(batch.actions),
        values=take_t(batch.values), neglogpacs=take_t(batch.neglogpacs),
        returns=take_t(batch.returns), dones_before=take_t(batch.dones_before),
        rewards=take_t(batch.rewards),
        init_lstm_state=jnp.take(batch.init_lstm_state, idx, axis=0))


def make_update_fn(env_cfg: EnvConfig, ppo_cfg: PPOConfig) -> Callable:
    """One full PPO update: rollout + noptepochs x env-shuffled minibatches.

    Returns a jittable fn TrainState -> (TrainState, metrics dict).
    """
    optimizer = make_optimizer(ppo_cfg)
    n_envs = env_cfg.num_envs
    nmb = ppo_cfg.nminibatches
    assert n_envs % nmb == 0, "num_envs must be divisible by nminibatches"
    envs_per_mb = n_envs // nmb

    grad_fn = jax.value_and_grad(ppo_loss, has_aux=True)

    def train_minibatch(carry, idx_mb):
        params, opt_state, batch = carry
        mb = _select_envs(batch, idx_mb)
        (loss, aux), grads = grad_fn(params, mb, ppo_cfg)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = {"loss": loss, **aux}
        return (params, opt_state, batch), metrics

    def train_epoch(carry, key_e):
        params, opt_state, batch = carry
        perm = jax.random.permutation(key_e, n_envs).reshape(nmb, envs_per_mb)
        (params, opt_state, batch), metrics = jax.lax.scan(
            train_minibatch, (params, opt_state, batch), perm)
        return (params, opt_state, batch), jax.tree.map(jnp.mean, metrics)

    def update(ts: TrainState):
        ts, batch, ep = rollout(env_cfg, ppo_cfg, ts)
        key, k_epochs = jax.random.split(ts.key)
        epoch_keys = jax.random.split(k_epochs, ppo_cfg.noptepochs)
        (params, opt_state, _), metrics = jax.lax.scan(
            train_epoch, (ts.params, ts.opt_state, batch), epoch_keys)
        if ppo_cfg.entropy_floor is not None:
            # project entropy back to the floor: uniform additive logstd
            # bump (entropy is sum(logstd) + const, so this is the
            # minimum-norm projection onto {entropy >= floor})
            ent_now = lstm.entropy(params.logstd)
            bump = (jnp.maximum(ppo_cfg.entropy_floor - ent_now, 0.0)
                    / params.logstd.shape[-1])
            params = params._replace(logstd=params.logstd + bump)
        metrics = jax.tree.map(jnp.mean, metrics)
        # explained variance (logger parity, ppo2.py:424-435)
        var_y = jnp.var(batch.returns)
        metrics["explained_variance"] = 1.0 - jnp.var(batch.returns - batch.values) / (var_y + 1e-8)
        # true episode bookkeeping: mean return/length over episodes that
        # terminated this rollout (= the reference's safe_mean over ep_info_buf,
        # ppo2.py:424-428); NaN-free when nothing terminated
        metrics["ep_rew_mean"] = ep.ret_sum / jnp.maximum(ep.count, 1.0)
        metrics["ep_len_mean"] = ep.len_sum / jnp.maximum(ep.count, 1.0)
        metrics["ep_count"] = ep.count
        metrics["reward_per_step"] = jnp.mean(batch.rewards)
        ts = ts._replace(params=params, opt_state=opt_state, key=key,
                         update_idx=ts.update_idx + 1)
        return ts, metrics

    return update


def learn(env_cfg: EnvConfig, ppo_cfg: PPOConfig, total_timesteps: int,
          key: jax.Array, params: Optional[lstm.PolicyParams] = None,
          eval_every_n: int = 100, callback=None, verbose: bool = True,
          metrics_hook=None, opt_state=None, state_hook=None):
    """Training loop (PPO2.learn parity: periodic eval hook + checkpointing
    are the caller's callback, mirroring ppo2.py:331-341; `metrics_hook`
    fires every update — the CLI uses it to persist metrics.jsonl, this
    framework's TensorBoard-writer stand-in). ``opt_state`` restores the
    optimizer from a checkpoint (this framework saves it, unlike PPO2.save
    — ppo2.py:452-476 drops it); env/LSTM states re-init fresh, which is
    sound for on-policy PPO. ``state_hook(ts, frac) -> ts`` runs before
    each update with the run fraction in [0, 1] — curriculum writes into
    traced TrainState DATA (e.g. the terrain z_scale schedule,
    cli/train --terrain-z-curriculum) without any recompile, since pytree
    values are not part of the jit signature."""
    ts = init_train_state(env_cfg, ppo_cfg, key, params)
    if opt_state is not None:
        same = (jax.tree_util.tree_structure(opt_state)
                == jax.tree_util.tree_structure(ts.opt_state))
        if same:
            ts = ts._replace(opt_state=opt_state)
        else:
            print("resume: checkpoint optimizer state has a different "
                  "structure (older optimizer layout); starting Adam fresh")
    update_fn = jax.jit(make_update_fn(env_cfg, ppo_cfg))
    batch_size = env_cfg.num_envs * ppo_cfg.n_steps
    n_updates = max(1, total_timesteps // batch_size)
    try:
        for i in range(n_updates):
            t0 = time.time()
            if state_hook is not None:
                ts = state_hook(ts, i / max(n_updates - 1, 1))
            if ppo_cfg.lr_final is not None:
                lr_i = scheduled_lr(ppo_cfg, i / max(n_updates - 1, 1))
                ts = ts._replace(
                    opt_state=with_learning_rate(ts.opt_state, lr_i))
            ts, metrics = update_fn(ts)
            if verbose or callback or metrics_hook:
                metrics = {k: float(v) for k, v in
                           jax.tree.map(lambda x: jax.device_get(x), metrics).items()}
                metrics["fps"] = batch_size / max(time.time() - t0, 1e-9)
                metrics["timesteps"] = (i + 1) * batch_size
                if ppo_cfg.lr_final is not None:
                    metrics["lr"] = lr_i
            if verbose:
                print(f"update {i + 1}/{n_updates}: " +
                      " ".join(f"{k}={v:.4g}" for k, v in metrics.items()))
            if metrics_hook is not None:
                metrics_hook(metrics)
            if callback is not None and (i % eval_every_n == 0
                                         or i == n_updates - 1):
                callback(ts, metrics)
    except KeyboardInterrupt:
        # PPO2 parity (ppo2.py:443-448): a Ctrl-C returns the live train
        # state so the caller's final save still runs — a long run is
        # never lost to an interrupt.
        print(f"learn: interrupted at update {int(ts.update_idx)} — "
              "returning current state for the final save")
    return ts
